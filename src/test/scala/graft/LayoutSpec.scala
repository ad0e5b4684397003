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

  test("q113: bloom probe runs pre-join in codegen; no false negatives") {
    val d = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.bloomPrefilterJoin(spark, d)
    val p = q.queryExecution.executedPlan.toString
    // the probe must sit in a Filter BEFORE the semi join (that is the
    // point: rows die pre-shuffle), and be the codegen'd expression
    assert(p.contains("bloom_might_contain"), p.take(2000))
    // composition parity == no false negatives: the prefiltered
    // semi-join must equal the plain semi-join exactly
    val dim = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    val plain = Tables.orders(spark, d)
      .join(dim, Seq("o_custkey"), "left_semi").count()
    val composed = Tables.orders(spark, d)
      .filter(graft.layout.RuntimeFilters.mightContain(col("o_custkey"),
        graft.layout.RuntimeFilters.bloomBytes(
          dim, "o_custkey", 1000L, 0.01)))
      .join(dim, Seq("o_custkey"), "left_semi").count()
    assert(composed == plain && plain > 0)
  }

  test("bloom prefilter alone passes every true key and stays near fpp") {
    val d = "/root/testdata/sf0.001"
    val dim = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    val bloom = graft.layout.RuntimeFilters.bloomBytes(
      dim, "o_custkey", math.max(dim.count(), 1L), 0.01)
    val orders = Tables.orders(spark, d)
    val pre = orders.filter(
      graft.layout.RuntimeFilters.mightContain(col("o_custkey"), bloom))
    val trueMatches = orders.join(dim, Seq("o_custkey"), "left_semi")
    // every true join row survives the prefilter (no false negatives)
    assert(trueMatches.join(pre.select("o_orderkey"), Seq("o_orderkey"),
      "left_anti").count() == 0)
    // and the false-positive tail is bounded: survivors are at most
    // true matches + 5% of the non-matching rows (fpp 0.01 with slack)
    val nonMatching = orders.count() - trueMatches.count()
    assert(pre.count() <= trueMatches.count() + 0.05 * nonMatching + 5)
  }

  test("q114: the partitioned layout prunes to the two filtered years") {
    val d = "/root/testdata/sf0.001"
    val path = graft.operators.LayoutQueries.ensurePartitionedOrders(spark, d)
    val scan = spark.read.parquet(path)
      .filter(col("o_year").between(1996, 1997))
      .select("o_orderkey", "o_totalprice")
    val filters = Layout.scanFilters(scan)
    assert(filters.contains("PartitionFilters: [isnotnull(o_year"),
      filters)
    // planning-time file pruning, not post-scan filtering: the pruned
    // scan's input files are exactly the two year directories
    val files = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .map(_.files.size).sum
      }.get
    val allFiles = spark.read.parquet(path).queryExecution.executedPlan
      .collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      }.get
    assert(files < allFiles, s"pruned=$files all=$allFiles")
  }

  test("q115: bucketed join plans with no join-side shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      val (ot, ct) = graft.operators.LayoutQueries.ensureBucketedPair(spark, d)
      val p = spark.table(ot)
        .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
        .queryExecution.executedPlan.toString
      // the one hash exchange allowed is the final groupBy's — the
      // sort-merge join itself reads co-located buckets
      val exchanges = p.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1, p.take(3000))
      assert(p.contains("SortMergeJoin"), p.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q115 layout stays exchange-free at 64 buckets on sf0.1") {
    // bucket count is THE 100 TB knob (buckets ≈ tableBytes/128MB);
    // the co-location property must hold at production-like counts,
    // not just the 8-bucket test default — broadcast disabled so the
    // bucketed sort-merge IS the plan, as it would be at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.1"
      val (ot, ct) = graft.operators.LayoutQueries
        .ensureBucketedPair(spark, d, buckets = 64)
      val j = spark.table(ot)
        .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
      val p = j.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1, p.take(3000)) // only the final groupBy's
      assert(p.contains("SortMergeJoin"), p.take(3000))
      // both scans carry the 64-bucket metadata
      assert(p.contains("Bucketed: true"), p.take(3000))
      // layout never changes the answer
      val plain = Tables.orders(spark, d).join(
        Tables.customer(spark, d).withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").groupBy("c_mktsegment").count()
      assert(j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("bucketCountFor derives a power-of-two count floored at 8") {
    val n001 = graft.operators.LayoutQueries
      .bucketCountFor(spark, "/root/testdata/sf0.001")
    assert(n001 === 8) // tiny table: the floor
    // a 100 TB orders table at the default 128 MB target: ~819200
    // buckets, rounded to the next power of two
    val n = graft.operators.LayoutQueries.bucketCountFor(
      spark, "/root/testdata/sf0.001", targetBucketBytes = 1024)
    assert(n >= 8 && (n & (n - 1)) === 0, s"not a power of two: $n")
  }

  test("dynamic partition pruning fires on a partition-key join") {
    val d = "/root/testdata/sf0.001"
    val path = graft.operators.LayoutQueries.ensurePartitionedOrders(spark, d)
    // the dim must be file-backed: an in-memory dim constant-folds its
    // filter into the LocalRelation, leaving DPP no selective
    // predicate to subquery on
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    Seq((1996, "hot"), (1997, "hot"), (1998, "cold"),
      (1999, "cold"), (2000, "cold"), (2001, "cold"))
      .toDF("o_year", "temp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val j = spark.read.parquet(path)
      .join(dim.filter(col("temp") === "hot"), Seq("o_year"))
      .groupBy("o_year").count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("range-sorted layout prunes row groups by footer min/max; shuffled layout cannot") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val tmp = Files.createTempDirectory("graft-zonemap").toString
    Layout.writeRangeSorted(li, s"$tmp/sorted", 16, "l_shipdate")
    // same rows, same file count, only the ordering differs
    li.repartition(16)
      .write.mode("overwrite").parquet(s"$tmp/shuffled")
    def micros(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    val (lo, hi) =
      (micros("1997-01-01T00:00:00Z"), micros("1997-03-31T00:00:00Z"))
    val (sortedHit, sortedTotal) = Layout.overlappingRowGroups(
      spark, s"$tmp/sorted", "l_shipdate", lo, hi)
    val (shufHit, shufTotal) = Layout.overlappingRowGroups(
      spark, s"$tmp/shuffled", "l_shipdate", lo, hi)
    // one quarter of a ~7-year span: the sorted footers let the scan
    // skip most groups; the shuffled copy's every file spans the whole
    // range, so min/max prunes NOTHING — the layout is the lever
    assert(sortedTotal >= 8 && sortedHit <= sortedTotal / 4,
      s"sorted: $sortedHit/$sortedTotal groups overlap")
    assert(shufHit == shufTotal,
      s"shuffled: $shufHit/$shufTotal groups overlap")
    // row counts from the footers cover the table exactly
    val rows = Layout.rowGroupRanges(spark, s"$tmp/sorted", "l_shipdate")
      .map(_._3).sum
    assert(rows == li.count())
    // and the q118 predicate reaches the sorted scan as a pushed filter
    val q118 = graft.operators.LayoutQueries.all
      .find(_.name == "q118_sorted_minmax_scan").get
    // ensureSortedLineitem caches under the dataset key — run the real
    // query body, then check its scan
    val df = q118.run(spark, d)
    val filters = Layout.scanFilters(df)
    assert(filters.contains("PushedFilters") &&
      filters.contains("l_shipdate"), filters)
  }

  test("AQE splits a skewed join partition at runtime (the salting alternative)") {
    // q85's saltedJoin is the MAP-SIDE fix for skew (pay an explode,
    // choose the salt count yourself); AQE's OptimizeSkewedJoin is the
    // runtime fix (no query change, the planner splits the hot
    // partition when task metrics reveal it). The 100 TB guidance is
    // salting for KNOWN pathological keys inside a recurring pipeline,
    // AQE for everything discovered at run time — this pins that the
    // AQE path actually fires and that the split never changes the
    // answer.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // test-scale thresholds: the hot key's ~1 MB partition must look
    // skewed next to the cold keys' few-KB ones
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    import org.apache.spark.sql.functions.{concat_ws, md5, pmod}
    // md5 payload defeats shuffle compression, so the hot key's
    // partition bytes actually reflect its row count
    val hot = s2.range(100000L)
      .select(lit("hot").as("k"), md5(col("id").cast("string")).as("v"))
    val cold = s2.range(500L)
      .select(concat_ws("", lit("cold"), pmod(col("id"), lit(10))).as("k"),
        md5(col("id").cast("string")).as("v"))
    val left = hot.unionByName(cold)
    // explicit dim rows, NOT distinct() over left: a final aggregate
    // between the join's Sort and its shuffle stage defeats
    // OptimizeSkewedJoin's Sort-over-ShuffleQueryStage pattern and the
    // skew silently goes unhandled — the realistic dim is a table scan,
    // which (like this local relation) shuffles directly under the Sort
    val dimRows = ("hot" +: (0 until 10).map(i => s"cold$i"))
      .map(k => (k, k.length.toLong))
    val right = s2.createDataFrame(dimRows).toDF("k", "w")
    val joined = left.join(right, "k")
    // collect() drives THIS dataset's QueryExecution (a sink write
    // would plan its own), so the final adaptive plan lands on it
    val n = joined.collect().length
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(1000))
    assert(plan.contains("skew=true"), plan.take(4000))
    // the split is pure execution: row count is exactly the plain join's
    assert(n === 100500)
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
