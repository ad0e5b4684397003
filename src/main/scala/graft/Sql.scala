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

  /** Create/replace one temp view per testdata table — once per
    * (session, dir): each registration pays schema inference (footer
    * reads) for all ten tables, ~0.5 s that dominated every
    * SQL-surface query's runtime when repeated per call. Temp views
    * persist for the session, so re-registration only matters after a
    * same-path parquet rewrite — [[Tables.invalidateSpreadCache]]
    * (which that writer must already call) clears this cache too. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val key = (org.apache.spark.sql.GraftSqlBridge.sessionKey(spark), dir)
    // marked AFTER all ten views exist (and serialized): a concurrent
    // or failed registration must never let a query run against a
    // half-registered session
    if (!registeredViews.contains(key)) registeredViews.synchronized {
      if (!registeredViews.contains(key)) {
        tableNames.foreach { name =>
          Tables.table(spark, dir, name) match {
            case df if name == "events" => Tables.events(spark, dir)
              .createOrReplaceTempView(name)
            case df => df.createOrReplaceTempView(name)
          }
        }
        registeredViews.add(key)
      }
    }
  }

  private[graft] def invalidateViewCache(): Unit = registeredViews.clear()

  private val registeredViews =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Run a SQL string against the registered views. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }
}
