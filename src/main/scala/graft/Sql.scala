package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: register the engine's tables as temp views so any
  * query the registry expresses via the DataFrame API can equally be
  * written as a SQL string (`spark.sql(...)` plans through the same
  * Catalyst pipeline, so pushdown/broadcast behavior is identical).
  * Combine with [[GraftExtensions]] for the custom functions. */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Create/replace one temp view per testdata table. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { name =>
      Tables.table(spark, dir, name) match {
        case df if name == "events" => Tables.events(spark, dir)
          .createOrReplaceTempView(name)
        case df => df.createOrReplaceTempView(name)
      }
    }

  /** Run a SQL string against the registered views. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }
}
