package graft

import graft.layout.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned layout prunes partitions for date-range queries") {
    val tmp = Files.createTempDirectory("graft-layout").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    Layout.writePartitioned(orders, s"$tmp/orders_by_year",
      "o_year", year(col("o_orderdate")))
    val scan = spark.read.parquet(s"$tmp/orders_by_year")
      .filter(col("o_year") === 1995)
      .select("o_orderkey", "o_totalprice")
    val filters = Layout.scanFilters(scan)
    assert(filters.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition pruning, got:\n$filters")
    // and the pruned read returns exactly the 1995 rows
    val expected = orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(scan.count() == expected && expected > 0)
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      Layout.writeBucketed(Tables.orders(spark, d), "orders_b",
        "o_custkey", 4)
      Layout.writeBucketed(
        Tables.customer(spark, d)
          .withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
        "o_custkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
        .groupBy("c_mktsegment").count()
      assert(Layout.isShuffleFree(
        spark.table("orders_b").join(spark.table("customer_b"),
          "o_custkey")),
        spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
          .queryExecution.executedPlan.toString.take(2000))
      // same result as the unbucketed join
      val plain = Tables.orders(spark, d).join(
        Tables.customer(spark, d).withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").groupBy("c_mktsegment").count()
      assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted join equals the plain join") {
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"))
      .toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "rv")
    val salted = Layout.saltedJoin(left, right, "k", "lv", 4)
      .select("k", "lv", "rv").orderBy("k", "lv").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").orderBy("k", "lv").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(salted.toSeq == plain.toSeq)
  }
}
