package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.3-§2.7): projections,
  * filters, joins, aggregations, sort/limit/top-k, set ops — expressed
  * over the TPC-H-ish testdata.
  *
  * Scale notes (100 TB):
  *  - dimension joins (`nation`, `region`) are explicit `broadcast()` —
  *    no shuffle of the fact side;
  *  - fact-fact joins (orders⋈customer) shuffle on the join key and are
  *    AQE-eligible (skew-join, dynamic coalescing);
  *  - aggregations are partial+final hash aggs (map-side combine) by
  *    construction — no `collect`, no driver loops;
  *  - filters/projections are plain column expressions so Catalyst
  *    pushes them into the parquet scan (verified via PushedFilters).
  *
  * Cross-engine determinism: double SUMs go through an exact per-row
  * `cast(decimal)` then decimal SUM then `cast(double)` — summation
  * order no longer matters, so the DuckDB oracle matches bit-for-bit.
  * Per-row scalar arithmetic is emitted raw: identical IEEE-754 ops in
  * both engines produce identical bits.
  */
object Relational {

  /** Exact distributed sum of a fixed-decimal double column: per-row
    * decimal cast -> exact decimal sum -> double. `scale` must be >= the
    * decimal granularity of the per-row value. */
  def decSum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** DuckDB mirror of [[decSum]]. */
  def decSumSql(expr: String, scale: Int): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  val all: Seq[GraftQuery] = Seq(

    // ---- A1-family: grouped aggregation (TPC-H Q1 pricing summary) ----
    GraftQuery("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSumSql("l_quantity", 2)} AS sum_qty,
         |  ${decSumSql("l_extendedprice", 2)} AS sum_base_price,
         |  ${decSumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${decSumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity"), 2).as("sum_qty"),
          decSum(col("l_extendedprice"), 2).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- F5/P-family: range filter + projection (parquet pushdown) ----
    GraftQuery("q02_filter_pushdown_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_quantity >= 47
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")))
        .filter(col("l_quantity") >= 47)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- star-schema multi-join (TPC-H Q5 shape): two fact tables,
    //      four dimensions, a region filter that prunes through the
    //      nation -> customer/supplier chain, and the c_nationkey =
    //      s_nationkey "local supplier" predicate. Catalyst plans the
    //      dim joins as broadcasts and reorders freely because the
    //      query is fully declarative — the plan to audit for join
    //      order at 100 TB (facts shuffle at most once each). ----
    GraftQuery("q91_star_join",
      s"""SELECT n_name,
         |  ${decSumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
            .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(Tables.nation(s, d),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // ---- J2-family: fact⋈fact shuffle join + broadcast dim join ----
    GraftQuery("q03_join_agg_revenue",
      s"""SELECT n_name,
         |  ${decSumSql("o_totalprice", 6)} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(decSum(col("o_totalprice"), 6).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },

    // ---- T1: global top-k (TakeOrderedAndProject) ----
    GraftQuery("q04_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- T1 per-group: windowed top-k ----
    GraftQuery("q05_window_topk_per_group",
      """SELECT o_orderpriority, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rk")
    },

    // ---- A2: distinct aggregation ----
    GraftQuery("q06_distinct_count",
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_cust
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- J1-family: left-semi join (EXISTS) ----
    GraftQuery("q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- left-anti join (NOT EXISTS) ----
    GraftQuery("q08_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- U1: union + distinct ----
    GraftQuery("q09_union_distinct",
      """SELECT nk FROM (
        |  SELECT DISTINCT nk FROM (
        |    SELECT c_nationkey AS nk FROM customer
        |    UNION ALL
        |    SELECT s_nationkey AS nk FROM supplier) u) v
        |ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    },

    // ---- set intersection (INTERSECT, completing the U-family) ----
    GraftQuery("q78_intersect",
      """SELECT nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
        |  INTERSECT
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  WHERE c_mktsegment = 'BUILDING') t
        |ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nk")).distinct()
        .intersect(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey").as("nk")).distinct())
        .orderBy("nk")
    },

    // ---- ordered string aggregation (LISTAGG/string_agg): the
    //      deterministic form — collect, SORT, then join, so the result
    //      never depends on row arrival order across partitions ----
    GraftQuery("q79_string_agg",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("nations"))
        .orderBy("n_regionkey")
    },

    // ---- UNPIVOT/melt: wide -> long, the inverse of q69's pivot ----
    GraftQuery("q77_unpivot",
      """WITH w AS (SELECT o_orderpriority,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_cnt,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_cnt,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_cnt
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, n FROM (
        |  SELECT o_orderpriority, 'f_cnt' AS status, f_cnt AS n FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'o_cnt', o_cnt FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'p_cnt', p_cnt FROM w) u
        |ORDER BY o_orderpriority, status""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"), col("F").as("f_cnt"),
          col("O").as("o_cnt"), col("P").as("p_cnt"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("f_cnt"), col("o_cnt"), col("p_cnt")),
          "status", "n")
        .orderBy("o_orderpriority", "status")
    },

    // ---- U2: set difference (EXCEPT) ----
    GraftQuery("q10_except",
      """SELECT nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey AS nk FROM supplier) t
        |ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nk")).distinct()
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
          .distinct())
        .orderBy("nk")
    },

    // ---- X7: JSON extraction (Snowflake PARSE_JSON / VARIANT analog) ----
    GraftQuery("q11_json_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint"))
          .cast("bigint").as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // ---- X8/W-family: event-time bucketing (batch analog of windows) ----
    GraftQuery("q12_time_bucket_agg",
      s"""SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
         |  COUNT(*) AS n,
         |  ${decSumSql("value", 2)} AS sum_value
         |FROM events
         |GROUP BY 1
         |ORDER BY hour""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("n"), decSum(col("value"), 2).as("sum_value"))
        .orderBy("hour")
    },

    // ---- X1: regex extraction over documents ----
    GraftQuery("q13_regex_extract",
      """SELECT doc_id,
        |  regexp_extract(text, 'b[a-z]+') AS first_b_word,
        |  CAST(len(regexp_extract_all(text, '(scan|query|spark)')) AS BIGINT) AS n_kw
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("text"), "b[a-z]+", 0).as("first_b_word"),
          size(regexp_extract_all(col("text"), lit("(scan|query|spark)"),
            lit(0))).cast("bigint").as("n_kw"))
        .orderBy("doc_id")
    },

    // ---- F1: prefix filter + agg ----
    GraftQuery("q14_prefix_filter_agg",
      s"""SELECT p_brand, COUNT(*) AS n,
         |  ${decSumSql("p_retailprice", 2)} AS sum_price
         |FROM part
         |WHERE p_name LIKE 'small%'
         |GROUP BY p_brand
         |ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").startsWith("small"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), decSum(col("p_retailprice"), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    },

    // ---- F7: conditional routing (CASE WHEN) ----
    GraftQuery("q15_conditional_route",
      s"""SELECT CASE WHEN event_type = 'error' THEN 'bad'
         |  WHEN event_type IN ('click','view') THEN 'engage'
         |  ELSE 'other' END AS bucket,
         |  COUNT(*) AS n,
         |  ${decSumSql("value", 2)} AS sum_value
         |FROM events
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(when(col("event_type") === "error", "bad")
          .when(col("event_type").isin("click", "view"), "engage")
          .otherwise("other").as("bucket"))
        .agg(count(lit(1)).as("n"), decSum(col("value"), 2).as("sum_value"))
        .orderBy("bucket")
    },

    // ---- exact percentiles (sorted-interpolated, matches DuckDB
    //      quantile_cont's linear interpolation) ----
    GraftQuery("q68_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        // ONE exact-percentile buffer per COLUMN (array form), not one
        // per requested quantile: percentile(c, 0.5) and
        // percentile(c, 0.9) as separate aggregates each build their
        // own per-group value-counts map over the same 600k values —
        // the array form interpolates both quantiles from a single
        // sorted digest, bit-identically (same counts map, same
        // per-quantile interpolation)
        .agg(
          expr("percentile(l_quantity, array(0.5D, 0.9D))").as("pq"),
          expr("percentile(l_extendedprice, 0.5)").as("pp"))
        .select(col("l_returnflag"),
          round(element_at(col("pq"), 1), 6).as("median_qty"),
          round(element_at(col("pq"), 2), 6).as("p90_qty"),
          round(col("pp"), 6).as("median_price"))
        .orderBy("l_returnflag")
    },

    // ---- approx-percentile sketch (the scalable sibling of q68's
    //      exact percentiles): GK-sketch buffers merge associatively,
    //      so at 100 TB the per-partition sketches combine without
    //      holding any group's values. The sketch VALUES are engine-
    //      private (and QuantileSummaries compression is partition-
    //      order sensitive, so they can't even be pinned), but the
    //      ERROR BOUND is hash-matchable: the query emits per-group
    //      within-bound booleans — the approx value sandwiched between
    //      the exact percentiles at p ± 0.001, 10x the GK guarantee of
    //      rank error <= n/accuracy = 1e-4 — alongside the exact
    //      percentiles and counts that DuckDB recomputes genuinely.
    //      A sketch regression past the bound reddens the row in the
    //      per-round artifact; OperatorSpec keeps the tighter
    //      one-quantity-step assertion. ----
    GraftQuery("q94_approx_percentiles",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS exact_median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS exact_p90_price,
        |  TRUE AS median_within, TRUE AS p90_within
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          // ONE exact-percentile buffer per column (array form), not
          // one per requested quantile — the sandwich bounds ride the
          // same sorted digest for free
          expr("percentile(l_quantity, array(0.499D, 0.5D, 0.501D))")
            .as("pq"),
          expr("percentile(l_extendedprice, array(0.899D, 0.9D, 0.901D))")
            .as("pp"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("am"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
            .as("ap"))
        .select(col("l_returnflag"), col("n"),
          round(element_at(col("pq"), 2), 6).as("exact_median_qty"),
          round(element_at(col("pp"), 2), 6).as("exact_p90_price"),
          (col("am") >= element_at(col("pq"), 1) &&
            col("am") <= element_at(col("pq"), 3)).as("median_within"),
          (col("ap") >= element_at(col("pp"), 1) &&
            col("ap") <= element_at(col("pp"), 3)).as("p90_within"))
        .orderBy("l_returnflag")
    },

    // ---- count-min sketch heavy-hitter estimation: d=4 hash rows x
    //      w=512 counters, built relationally (explode -> one counter
    //      agg) with the engine's deterministic integer mixes — so
    //      UNLIKE q63/q94's engine-private sketches this one is exact
    //      cross-engine and the oracle hash-matches the estimates.
    //      est >= true always (collisions only ADD); the top-k keys'
    //      estimates are read with one tiny broadcast probe join. At
    //      100 TB the counter table is d*w rows — constant size — and
    //      merges by addition across any partitioning. ----
    GraftQuery("q95_count_min_sketch", {
      val P = graft.functions.TextFunctions.MinhashP
      val W = 512
      val ps = (0 until 4).map(graft.functions.TextFunctions.minhashParams)
      val bucketSql = (j: Int) =>
        s"((user_id * ${ps(j)._1} + ${ps(j)._2}) % $P) % $W"
      val unioned = (0 until 4).map(j =>
        s"SELECT user_id, $j AS j, ${bucketSql(j)} AS bucket FROM events")
        .mkString(" UNION ALL ")
      val probes = (0 until 4).map(j =>
        s"SELECT user_id, true_n, $j AS j, ${bucketSql(j)} AS bucket FROM top")
        .mkString(" UNION ALL ")
      s"""WITH cnt AS (SELECT j, bucket, COUNT(*) AS n
         |  FROM ($unioned) GROUP BY j, bucket),
         |tru AS (SELECT user_id, COUNT(*) AS true_n
         |        FROM events GROUP BY user_id),
         |top AS (SELECT user_id, true_n FROM tru
         |        ORDER BY true_n DESC, user_id LIMIT 10),
         |est AS (SELECT p.user_id, p.true_n, MIN(c.n) AS est_n
         |        FROM ($probes) p
         |        JOIN cnt c ON c.j = p.j AND c.bucket = p.bucket
         |        GROUP BY p.user_id, p.true_n)
         |SELECT user_id, CAST(true_n AS BIGINT) AS true_n,
         |  CAST(est_n AS BIGINT) AS est_n
         |FROM est ORDER BY user_id""".stripMargin
    }) { (s, d) =>
      val P = graft.functions.TextFunctions.MinhashP
      val W = 512
      val ps = (0 until 4).map(graft.functions.TextFunctions.minhashParams)
      def bucket(j: Int): Column =
        pmod(col("user_id") * ps(j)._1 + ps(j)._2, lit(P)) % W
      val jb = explode(array((0 until 4).map(j =>
        struct(lit(j).as("j"), bucket(j).as("bucket"))): _*)).as("jb")
      val ev = Tables.events(s, d).select(col("user_id"))
      val cnt = ev.select(col("user_id"), jb)
        .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
        .groupBy(col("j"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("user_id"))
        .limit(10)
      top.select(col("user_id"), col("true_n"), jb)
        .select(col("user_id"), col("true_n"),
          col("jb.j").as("j"), col("jb.bucket").as("bucket"))
        .join(cnt, Seq("j", "bucket"))
        .groupBy(col("user_id"), col("true_n"))
        .agg(min(col("n")).as("est_n"))
        .select(col("user_id"), col("true_n").cast("long").as("true_n"),
          col("est_n").cast("long").as("est_n"))
        .orderBy("user_id")
    },

    // ---- grouping-sets gap-fill: ROLLUP ----
    GraftQuery("q16_rollup",
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  COUNT(*) AS n,
         |  ${decSumSql("l_quantity", 2)} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        // pre-project the decimal cast BELOW the rollup's Expand: the
        // Expand emits one copy of each row per grouping set (3 here),
        // and an agg-side cast would re-run per copy — staged as a
        // scan-side column it runs once per ROW and the Expand copies
        // the already-cast value (same cast, same sum, same bits)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("decimal(30,2)").as("qd"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("qd")).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // ---- analytic windows: gaps-and-islands sessionization (lag +
    //      conditional cumsum), the batch form of session windows ----
    GraftQuery("q66_sessionization",
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id)
        |      <= 1800000000 THEN 0 ELSE 1 END AS new_sess
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |        SUM(new_sess) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |      FROM g)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |  COUNT(*) AS n_events,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
        |FROM s GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_no""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts"))
            - lag(unix_micros(col("ts")), 1).over(byUser)
            <= 1800000000L, 0L).otherwise(1L))
        .withColumn("sess_no", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("sess_start"))
        .orderBy("user_id", "sess_no")
    },

    // ---- LEAD-based gap detection: inter-event silences per user
    //      above a threshold (the QA view behind session boundaries) ----
    GraftQuery("q81_gap_detection",
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    LEAD(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next_us
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(next_us - t_us AS BIGINT) AS gap_us
        |FROM g
        |WHERE next_us - t_us > 3600000000
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      // ordering by the micros column is identical to ordering by ts
      // (unix_micros is monotone), with event_id breaking ties
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t_us"))
        .withColumn("next_us", lead(col("t_us"), 1).over(byUser))
        .filter(col("next_us") - col("t_us") > 3600000000L)
        .select(col("user_id"), col("event_id"),
          (col("next_us") - col("t_us")).as("gap_us"))
        .orderBy("user_id", "event_id")
    },

    // ---- frame-spec window: trailing moving average + running total ----
    GraftQuery("q67_moving_window",
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    round(AVG(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS running_total
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, mavg3, running_total
        |FROM t ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(avg(col("o_totalprice"))
            .over(byCust.rowsBetween(-2, Window.currentRow)), 4)
            .as("mavg3"),
          sum(col("o_totalprice").cast("decimal(30,2)"))
            .over(byCust.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- A4/D3: weighted-clamped confidence scoring ----
    GraftQuery("q17_weighted_clamp",
      """SELECT c_custkey,
        |  LEAST(1.0, GREATEST(0.0, 0.7 * (c_acctbal / 10000.0) + 0.3)) AS confidence
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          least(lit(1.0), greatest(lit(0.0),
            lit(0.7) * (col("c_acctbal") / 10000.0) + 0.3)).as("confidence"))
        .orderBy("c_custkey")
    },
  )
}
