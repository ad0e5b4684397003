package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced join shapes beyond the reference's nested-loop lookups
  * (SURVEY.md §2.5 gap row): as-of and range joins, composed from
  * Spark built-ins so Catalyst keeps full planning freedom.
  *
  * Scale notes (100 TB):
  *  - the as-of join shuffles both sides ONCE on the equi key, then
  *    resolves "latest right <= left ts" with a per-left-row window —
  *    no time-expanded fan-out materializes beyond the matched
  *    candidates, and AQE handles key skew;
  *  - the range join against a SMALL bucket/dimension table is an
  *    explicit broadcast nested-loop with a band predicate — the fact
  *    side streams once; never range-join two fact tables directly
  *    (bucketize the range first).
  */
object Joins {

  /** As-of join: for every left row, the single latest right row with
    * `rightTs <= leftTs`, matched on an equi key. Left rows with no
    * prior right row get a null match (left outer semantics).
    *
    * Implemented as the scalable union + running-`last` carry — NOT a
    * band join: a band join materializes every (left, prior-right) pair
    * before picking the latest, which explodes on high-frequency keys.
    * Here both sides shuffle ONCE on the key, sort by time within the
    * partition, and each left row reads the carried latest right row —
    * strictly linear in input size at any scale.
    *
    * Output: the left columns plus one struct column `matchCol` holding
    * the matched right row (null when no prior right row exists). At
    * equal timestamps a right row matches a left row (<= semantics). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      matchCol: String = "asof_match"): DataFrame = {
    val rightStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    // SQL ASOF/equi-join semantics: a NULL key never matches, so
    // null-key right rows must not become match candidates for
    // null-key left rows sharing the window partition.
    val taggedRight = right.filter(col(key).isNotNull).select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), rightStruct.as("__payload"))
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(taggedRight.schema("__payload").dataType)
        .as("__payload"),
      leftStruct.as("__row"))
    val merged = taggedRight.withColumn("__row",
      lit(null).cast(taggedLeft.schema("__row").dataType))
      .unionByName(taggedLeft)
    // right rows sort before left rows at the same ts -> <= semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn(matchCol, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col(matchCol))
  }

  /** Salted equi-join for skewed keys: the left side is split into
    * `salts` deterministic sub-keys (hash of `saltBy`, a left column —
    * typically the row's unique id), the right side is replicated once
    * per salt, and the join key becomes (key, salt). Every left row
    * still meets every matching right row exactly once, so the result
    * IS the plain equi-join — only the physical distribution changes:
    * a hot key's rows now land on `salts` reducers instead of one.
    *
    * Use when BOTH sides must shuffle (right too big to broadcast) and
    * the key histogram is heavy-tailed — the classic 100 TB failure
    * mode where one straggler task holds the hot key. AQE's skew-join
    * split handles sort-merge inputs it can SEE; salting also covers
    * join-amplification and aggregate-feeding shapes AQE sizes wrong.
    * Replication cost: `salts` copies of the right side — keep salts
    * small (8-32) and the right side narrow. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!left.columns.contains("__salt") &&
      !right.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename the input's")
    val l = left.withColumn("__salt",
      pmod(hash(col(saltBy)), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-routed anti-join: `incoming LEFT ANTI JOIN corpus ON key`,
    * rewritten so that — in the steady-state dedup regime where most
    * incoming rows are NEW — no side of the anti-join ever shuffles.
    *
    * The plain anti-join is the scale problem of every incremental
    * dedup pipeline (q92's shape, the streaming admission sinks): each
    * batch shuffles the ENTIRE corpus fingerprint table plus the batch
    * just to discover that, typically, almost nothing matched. A Bloom
    * filter over the corpus keys (built once, incrementally
    * maintainable — Spark's `BloomFilter.mergeInPlace` ORs in each
    * admitted batch) routes rows instead:
    *
    *  - probe-NEGATIVE rows are definitely not in the corpus (a Bloom
    *    filter has no false negatives) → they bypass the join entirely,
    *    zero shuffle, zero corpus I/O;
    *  - probe-POSITIVE rows (true dups + the fpp tail) resolve exactly
    *    via a double inversion that keeps every join map-side:
    *    `confirmed = corpus ⋉ broadcast(suspectKeys)` (broadcast SEMI —
    *    the corpus STREAMS through its scan, it never shuffles), then
    *    `suspect ▷ broadcast(confirmed)` (broadcast ANTI — legal
    *    because the build side is the confirmed-key set, bounded by
    *    |suspect keys|, not the corpus).
    *
    * Result is EXACTLY the plain anti-join's: corpus keys always probe
    * positive and die in the exact anti; false positives merely take
    * the slow path and survive it; null-key rows probe null → routed
    * to the fast path → kept, matching anti-join semantics (null never
    * equals). Spec-pinned (BloomRoutedJoinSpec) including a
    * deliberately undersized filter to force false positives.
    *
    * The broadcasts assume the SUSPECT set is small — true by
    * construction when `incoming` is a micro-batch or when dups are
    * rare; for an adversarial batch that is mostly dups, the routed
    * plan degrades to broadcasting ~the batch's keys (still bounded by
    * the batch, never by the corpus). The corpus-side scan in the semi
    * join composes with layout: a bucketed/zone-mapped fingerprint
    * table prunes it further.
    *
    * `bloom` comes from [[graft.layout.RuntimeFilters.bloomBytes]] over
    * the corpus keys; size it for the corpus' EXPECTED TOTAL (fpp
    * degrades gracefully past capacity — more rows take the exact
    * path — and a scheduled rebuild restores it, same cadence contract
    * as the ANN index's). */
  def bloomRoutedAntiJoin(incoming: DataFrame, corpus: DataFrame,
      key: String, bloom: Array[Byte]): DataFrame = {
    require(!incoming.columns.contains("__maybe"),
      "bloomRoutedAntiJoin reserves the __maybe column name")
    val probe = graft.layout.RuntimeFilters.mightContain(col(key), bloom)
    val flagged = incoming.withColumn("__maybe",
      coalesce(probe, lit(false)))
    val fresh = flagged.filter(!col("__maybe")).drop("__maybe")
    val suspect = flagged.filter(col("__maybe")).drop("__maybe")
    val confirmed = corpus.select(col(key))
      .join(broadcast(suspect.select(col(key))), Seq(key), "left_semi")
      .distinct()
    suspect.join(broadcast(confirmed), Seq(key), "left_anti")
      .unionByName(fresh)
  }

  val all: Seq[GraftQuery] = Seq(

    // ---- as-of join: latest prior click per error event, by user ----
    // DuckDB mirrors with its native ASOF JOIN; Spark composes it from
    // an equi+band join and a per-row latest-wins window.
    GraftQuery("q18_asof_join",
      """SELECT e.event_id,
        |  c.event_id AS click_event_id,
        |  CASE WHEN c.event_id IS NULL THEN NULL
        |       ELSE round(CAST(e.value - c.value AS DOUBLE), 6)
        |  END AS value_delta
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      asOfJoin(errors, clicks, "user_id", "ts", "ts")
        .select(col("event_id"),
          col("asof_match.event_id").as("click_event_id"),
          round(col("value") - col("asof_match.value"), 6)
            .as("value_delta"))
        .orderBy("event_id")
    },

    // ---- range join: band predicate against a small literal dim ----
    GraftQuery("q19_range_join",
      """WITH bands AS (
        |  SELECT * FROM (VALUES ('tiny', 0, 10), ('small', 10, 25),
        |                        ('large', 25, 100)) AS t(class, lo, hi))
        |SELECT b.class, COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM part p JOIN bands b ON p.p_size >= b.lo AND p.p_size < b.hi
        |GROUP BY b.class
        |ORDER BY b.class""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq(("tiny", 0, 10), ("small", 10, 25), ("large", 25, 100))
        .toDF("class", "lo", "hi")
      Tables.part(s, d)
        .join(broadcast(bands),
          col("p_size") >= col("lo") && col("p_size") < col("hi"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n"),
          Relational.decSum(col("p_retailprice"), 2).as("sum_price"))
        .orderBy("class")
    },

    // ---- CUBE: all grouping-set combinations (§2.6 gap) ----
    GraftQuery("q62_cube",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    },

    // ---- GROUPING SETS: arbitrary grouping combinations (the general
    //      form rollup/cube specialize; Spark 4's Dataset.groupingSets) ----
    GraftQuery("q80_grouping_sets",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
            Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    },

    // ---- MapType: parse JSON props to a map, explode entries ----
    GraftQuery("q71_map_entries",
      """WITH x AS (SELECT e.event_id, k.key,
        |    json_extract_string(e.props, '$.' || k.key) AS value
        |  FROM events e, unnest(json_keys(e.props)) AS k(key))
        |SELECT key, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS BIGINT)) AS BIGINT) AS sum_val
        |FROM x GROUP BY key
        |ORDER BY key""".stripMargin) { (s, d) =>
      // explode_OUTER + isNotNull per the engine-wide generate rule:
      // a plain explode made InferFiltersFromGenerate add
      // size(kv)>0 AND isnotnull(kv) below the Generate, and pushdown
      // substituted the FULL from_json into both — the JSON parse ran
      // THREE times per event row. Outer generates skip the rule; an
      // empty/null map contributes one null-key row (JSON object keys
      // are never null, so the key filter drops exactly those).
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("kv"))
        .select(col("event_id"),
          explode_outer(col("kv")).as(Seq("key", "value")))
        .filter(col("key").isNotNull)
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("bigint")).cast("bigint").as("sum_val"))
        .orderBy("key")
    },

    // ---- date arithmetic: datediff / add_months / trunc ----
    GraftQuery("q72_date_arith",
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        |  COUNT(*) AS n,
        |  CAST(MIN(datediff('day', CAST(o_orderdate AS DATE),
        |    DATE '1999-01-01')) AS INTEGER) AS min_days_to_ref,
        |  strftime(MIN(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH),
        |    '%Y-%m-%d') AS min_plus3m
        |FROM orders
        |GROUP BY month
        |ORDER BY month""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n"),
          min(datediff(lit("1999-01-01").cast("date"),
            col("o_orderdate").cast("date"))).cast("int")
            .as("min_days_to_ref"),
          date_format(min(add_months(col("o_orderdate").cast("date"), 3)),
            "yyyy-MM-dd").as("min_plus3m"))
        .orderBy("month")
    },

    // ---- scalar subquery through the SQL surface (graft.Sql):
    //      above-average filter planned by Catalyst's subquery rewrite ----
    GraftQuery("q73_scalar_subquery",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      graft.Sql.query(s, d,
        """SELECT o_orderpriority, COUNT(*) AS n
          |FROM orders
          |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // ---- PIVOT: wide per-category aggregation ----
    GraftQuery("q69_pivot",
      """SELECT o_orderpriority,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_cnt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_cnt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_cnt
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"), col("F").as("f_cnt"),
          col("O").as("o_cnt"), col("P").as("p_cnt"))
        .orderBy("o_orderpriority")
    },

    // ---- salted skew join: events' event_type histogram is heavy
    //      (a handful of types over every row — the archetypal hot
    //      key). saltedJoin splits each type's rows across 16 sub-keys
    //      before the join, so no single reducer owns a whole type; the
    //      result is provably the plain join, which is exactly what the
    //      oracle runs. The dim side here is broadcast-sized — the
    //      query pins the semantics so the operator is safe to reach
    //      for when the dim ISN'T. ----
    GraftQuery("q85_salted_skew_join",
      """WITH dim AS (SELECT event_type, CAST(length(event_type) AS BIGINT) AS w
        |             FROM (SELECT DISTINCT event_type FROM events))
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(30,2)) * d.w) AS DOUBLE) AS weighted_sum
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val dim = events.select(col("event_type")).distinct()
        .withColumn("w", length(col("event_type")).cast("long"))
      saltedJoin(events, dim, "event_type", "event_id", 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(
            org.apache.spark.sql.types.DecimalType(30, 2)) * col("w"))
            .cast("double").as("weighted_sum"))
        .orderBy("event_type")
    },

    // ---- HLL sketch: approx_count_distinct (§2.6 gap). The sketch
    //      VALUE is engine-private, but the ERROR BOUND is hash-
    //      matchable (the q94 pattern): the query emits per-group
    //      |approx - exact| <= 6% booleans (3 sigma at rsd 0.02,
    //      integer arithmetic so no float drift) alongside the exact
    //      distinct count and row count that DuckDB recomputes
    //      genuinely. An HLL regression past 3 sigma reddens the row;
    //      OperatorSpec keeps the tighter quantitative bound. ----
    GraftQuery("q63_approx_distinct",
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
        |  CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_3sd
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // TWO-LEVEL distinct: dedup on (priority, custkey) with map-side
      // partial agg first, then count the groups — the single mixed
      // distinct+non-distinct agg planned through Expand (every row
      // duplicated per agg class) and measured 2.7x slower at sf0.1
      // (1.54 s -> 0.57 s). The HLL moves to level 2 unchanged:
      // HyperLogLog registers are max-of-hash, so feeding each distinct
      // custkey once yields the IDENTICAL estimate (duplicate-
      // insensitive by construction; parity-checked), and exact_cust /
      // n fold exactly. At scale this also halves the shuffled rows
      // (no Expand duplication; partials compress per partition).
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_custkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("exact_cust"),
          sum(col("c")).as("n"),
          approx_count_distinct(col("o_custkey"), 0.02).as("ac"))
        .select(col("o_orderpriority"), col("exact_cust"), col("n"),
          (abs(col("ac") - col("exact_cust")) * 100 <=
            col("exact_cust") * 6).as("within_3sd"))
        .orderBy("o_orderpriority")
    },
  )
}
