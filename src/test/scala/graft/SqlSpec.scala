package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("SQL strings over registered views match the DataFrame API") {
    val viaSql = Sql.query(spark, d,
      """SELECT n_name, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val viaDf = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n")).orderBy("n_name")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("events view exposes the converted timestamp type") {
    Sql.registerViews(spark, d)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
    assert(t.dataType.typeName == "timestamp")
  }
}
