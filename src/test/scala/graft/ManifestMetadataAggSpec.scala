package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[graft.plans.ManifestMetadataAggs]]: whole-table COUNT/MIN/MAX
  * over a `graft-manifest` relation answers from the manifest's
  * recorded per-dir row counts + stats — the executed plan is a
  * LocalTableScan, zero data files — and every disqualifying shape
  * (filter, count(col), stat-less column, pre-upgrade entry, GROUP
  * BY, DISTINCT) falls back to the ordinary scan with the identical
  * answer. */
class ManifestMetadataAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Executed-plan text AFTER running the frame: aggregate plans are
    * AQE-wrapped (AdaptiveSparkPlanExec exposes no children to
    * collect*), so the string of the FINALIZED plan is the reliable
    * way to see whether a file scan exists anywhere in it. */
  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def hasFileScan(df: DataFrame): Boolean =
    planOf(df).contains("FileScan")

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val p = planOf(df)
    !p.contains("FileScan") && p.contains("LocalTableScan")
  }

  /** 3 commits with stats on (id, name); ids 0..29, name "n00".."n29",
    * with a null id and a null name row thrown in (min/max must skip
    * them exactly like a scan would). */
  private def freshTable(): String = {
    val t = s"${Files.createTempDirectory("graft-metaagg")}/t"
    (0 until 3).foreach { i =>
      val rows = (i * 10 until (i + 1) * 10)
        .map(x => (Some(x.toLong), Some(f"n$x%02d"))) ++
        (if (i == 1) Seq((None: Option[Long], Some("zz-null-id")),
          (Some(5L), None: Option[String]))
         else Nil)
      ManifestTable.append(spark, rows.toDF("id", "name"), t,
        statsCols = Seq("id", "name"))
    }
    t
  }

  private def view(t: String, name: String): Unit =
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView(name)

  test("whole-table COUNT/MIN/MAX plans as LocalTableScan, zero data files") {
    val t = freshTable()
    view(t, "m_meta")
    val df = spark.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(id) AS lo,
        |MAX(id) AS hi, MIN(name) AS nlo, MAX(name) AS nhi
        |FROM m_meta""".stripMargin)
    assert(isMetadataOnly(df),
      s"expected metadata-only plan:\n${df.queryExecution.executedPlan}")
    val r = df.collect().head
    // 32 rows (30 + the two partly-null ones); nulls skipped by
    // min/max exactly like a scan: max(name) is the null-id row's
    // "zz-null-id", min stays "n00"
    assert(r.getLong(0) == 32L && r.getLong(1) == 0L &&
      r.getLong(2) == 29L && r.getString(3) == "n00" &&
      r.getString(4) == "zz-null-id")
    // the fallback scan agrees bit-for-bit
    val scan = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).cast("long"), min("id"), max("id"),
        min("name"), max("name")).collect().head
    assert(r.toSeq == scan.toSeq)
  }

  test("stays exact through delete, merge, and clusterZ rewrites") {
    val t = freshTable()
    def metaCount(): (Boolean, Long) = {
      val df = spark.read.format("graft-manifest").load(t)
        .agg(count(lit(1)).as("n"))
      (isMetadataOnly(df), df.collect().head.getLong(0))
    }
    assert(metaCount() == ((true, 32L)))
    ManifestTable.deleteRange(spark, t, "id", 25L, 29L)
    assert(metaCount() == ((true, 27L)))
    // both id=5 rows (the original and the null-name one) are
    // replaced by ONE batch row; id=100 is net-new: 27 - 2 + 2
    ManifestTable.merge(spark,
      Seq((5L, "replaced"), (100L, "new")).toDF("id", "name"), t, "id")
    assert(metaCount() == ((true, 27L)))
    ManifestTable.clusterZ(spark, t, "id", "id", 2)
    val (meta, n) = metaCount()
    assert(meta && n == 27L)
    // min/max recorded by the rewrites too: still metadata-only
    val mm = spark.read.format("graft-manifest").load(t)
      .agg(min("id"), max("id"))
    assert(isMetadataOnly(mm) &&
      mm.collect().head.toSeq == Seq(0L, 100L))
    // compact folds rows + null counts from its sources — the
    // compacted table keeps answering from metadata
    ManifestTable.compact(spark, t)
    assert(metaCount() == ((true, 27L)))
    val mm2 = spark.read.format("graft-manifest").load(t)
      .agg(min("id"), max("id"), count(col("name")).as("nn"))
    assert(isMetadataOnly(mm2))
    // the programmatic read is a plain parquet scan (no manifest
    // relation, so the rule can't fire) — the honest cross-check
    assert(mm2.collect().head.toSeq ==
      ManifestTable.read(spark, t)
        .agg(min("id"), max("id"), count(col("name"))).collect().head.toSeq)
  }

  test("a WHERE clause disqualifies: falls back to the scan, same answer") {
    val t = freshTable()
    view(t, "m_meta_f")
    val df = spark.sql(
      "SELECT COUNT(*) AS n FROM m_meta_f WHERE id >= 10")
    assert(hasFileScan(df), "filtered count must scan")
    assert(df.collect().head.getLong(0) == 20L) // ids 10..29
  }

  test("count(col) answers from recorded null counts, metadata-only") {
    val t = freshTable()
    view(t, "m_meta_c")
    val df = spark.sql(
      "SELECT COUNT(id) AS n_id, COUNT(name) AS n_name FROM m_meta_c")
    assert(isMetadataOnly(df),
      s"count(col) with recorded null counts must not scan:\n" +
        df.queryExecution.executedPlan)
    // 32 rows total, one null id, one null name — Σ(rows − nulls)
    assert(df.collect().head.toSeq == Seq(31L, 31L))
    // GROUP BY and DISTINCT still disqualify
    assert(hasFileScan(spark.sql(
      "SELECT name, COUNT(*) FROM m_meta_c GROUP BY name")))
    assert(hasFileScan(spark.sql(
      "SELECT COUNT(DISTINCT id) FROM m_meta_c")))
  }

  test("count(col) without recorded null counts falls back to the scan") {
    val t = freshTable()
    // simulate a manifest written before null counts existed: same
    // entries, nullCnt stripped, committed as the next version
    val prev = ManifestTable.latestVersion(spark, t).get
    ManifestTable.commit(spark, t, prev + 1,
      ManifestTable.entriesOf(spark, t, prev)
        .map(_.copy(nullCnt = Map.empty)),
      spark.read.format("graft-manifest").load(t).schema, -1L)
    val df = spark.read.format("graft-manifest").load(t)
      .agg(count(col("id")).as("n"))
    assert(hasFileScan(df), "unknown per-dir null counts must scan")
    assert(df.collect().head.getLong(0) == 31L)
    // COUNT(*) needs no null counts: still metadata-only
    val star = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(star) &&
      star.collect().head.getLong(0) == 32L)
  }

  test("a provably-all-null dir contributes nothing to MIN/MAX (no scan)") {
    val t = freshTable()
    // a whole commit where id is entirely null: statsOf records no id
    // bound (nothing to bound), but nullCnt(id) == rows proves the
    // dir holds no MIN/MAX-visible values — the rule must skip it,
    // not disqualify
    ManifestTable.append(spark,
      Seq((None: Option[Long], Some("aa-allnull-1")),
        (None: Option[Long], Some("aa-allnull-2")))
        .toDF("id", "name"), t, statsCols = Seq("id", "name"))
    val df = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"), count(col("id")).as("n_id"),
        min("id").as("lo"), max("id").as("hi"),
        min("name").as("nlo"))
    assert(isMetadataOnly(df),
      s"all-null dir must be skipped, not disqualify:\n" +
        df.queryExecution.executedPlan)
    val r = df.collect().head
    assert(r.toSeq == Seq(34L, 31L, 0L, 29L, "aa-allnull-1"))
    // the fallback scan agrees bit-for-bit
    val scan = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)), count(col("id")), min("id"), max("id"),
        min("name")).collect().head
    assert(r.toSeq == scan.toSeq)
  }

  test("a stat-less column disqualifies MIN/MAX but not COUNT") {
    val t = s"${Files.createTempDirectory("graft-metaagg2")}/t"
    ManifestTable.append(spark,
      Seq((1L, 7L), (2L, 9L)).toDF("id", "other"), t,
      statsCols = Seq("id")) // no stats on `other`
    val both = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"), max(col("other")).as("mx"))
    assert(hasFileScan(both), "max over a stat-less column must scan")
    assert(both.collect().head.toSeq == Seq(2L, 9L))
    val justCount = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(justCount) &&
      justCount.collect().head.getLong(0) == 2L)
  }

  test("a pre-upgrade entry (no recorded row count) disqualifies COUNT") {
    val t = s"${Files.createTempDirectory("graft-metaagg3")}/t"
    ManifestTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      t, statsCols = Seq("id"))
    // simulate a manifest written before row counts existed: same
    // entries, rows stripped, committed as v2
    val v1Entries = ManifestTable.entriesOf(spark, t, 1L)
    assert(v1Entries.forall(_.rows.contains(2L)))
    ManifestTable.commit(spark, t, 2L,
      v1Entries.map(_.copy(rows = None)),
      spark.read.format("graft-manifest").load(t).schema, -1L)
    val df = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"))
    assert(hasFileScan(df), "unknown per-dir counts must scan")
    assert(df.collect().head.getLong(0) == 2L)
    // appends carry the old entries unchanged — still disqualified —
    // but the next REWRITE of the dirs modernizes them
    ManifestTable.append(spark, Seq((3L, "c")).toDF("id", "s"), t)
    assert(hasFileScan(spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"))))
    ManifestTable.cluster(spark, t, "id", 2)
    val df2 = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(df2) && df2.collect().head.getLong(0) == 3L)
  }

  test("emptied table: COUNT 0 and NULL min/max, still metadata-only") {
    val t = s"${Files.createTempDirectory("graft-metaagg4")}/t"
    ManifestTable.append(spark, Seq((1L, "a")).toDF("id", "s"), t,
      statsCols = Seq("id"))
    ManifestTable.deleteRange(spark, t, "id", Long.MinValue, Long.MaxValue)
    val df = spark.read.format("graft-manifest").load(t)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("s").as("hi"))
    assert(isMetadataOnly(df))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("SUM(integral) answers from recorded per-dir sums, metadata-only") {
    val t = freshTable()
    view(t, "m_meta_sum")
    val df = spark.sql(
      "SELECT SUM(id) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM m_meta_sum")
    assert(isMetadataOnly(df),
      s"expected metadata-only SUM:\n${df.queryExecution.executedPlan}")
    // ids 0..29 sum 435 plus the extra id=5 row = 440; the null id
    // is skipped exactly like SQL SUM
    assert(df.collect().head.getLong(0) == 440L)
    // bit-exact with the programmatic scan
    assert(df.collect().head.getLong(0) ==
      ManifestTable.read(spark, t).agg(sum("id"))
        .collect().head.getLong(0))
    // stays exact through a copy-on-write delete (restat re-records)
    ManifestTable.deleteRange(spark, t, "id", 25L, 29L)
    val df2 = spark.read.format("graft-manifest").load(t)
      .agg(sum("id").as("s"))
    assert(isMetadataOnly(df2) && df2.collect().head.getLong(0) == 305L)
    // ...and through an in-place UPDATE of the summed column
    ManifestTable.updateRange(spark, t, "id", 0L, 4L,
      Seq("id" -> (col("id") + 100L)))
    val df3 = spark.read.format("graft-manifest").load(t)
      .agg(sum("id").as("s"))
    assert(isMetadataOnly(df3) &&
      df3.collect().head.getLong(0) == 305L + 5 * 100L)
    // ...and through compact (sums fold by exact addition)
    ManifestTable.compact(spark, t)
    val df4 = spark.read.format("graft-manifest").load(t)
      .agg(sum("id").as("s"))
    assert(isMetadataOnly(df4) && df4.collect().head.getLong(0) == 805L)
    // an all-null dir contributes nothing and disqualifies nothing
    ManifestTable.append(spark,
      Seq((None: Option[Long], Some("x"))).toDF("id", "name"), t,
      statsCols = Seq("id", "name"))
    val df5 = spark.read.format("graft-manifest").load(t)
      .agg(sum("id").as("s"))
    assert(isMetadataOnly(df5) && df5.collect().head.getLong(0) == 805L)
    // a dir with rows but NO recorded sum (stat-less append)
    // disqualifies: falls back to the scan with the same answer
    ManifestTable.append(spark, Seq((Some(1000L), Some("y")))
      .toDF("id", "name"), t)
    val df6 = spark.read.format("graft-manifest").load(t)
      .agg(sum("id").as("s"))
    assert(hasFileScan(df6), "a sum-less live dir must scan")
    assert(df6.collect().head.getLong(0) == 1805L)
    // SUM over an emptied table is SQL NULL, still metadata-only
    val t2 = s"${Files.createTempDirectory("graft-metaagg-sum0")}/t"
    ManifestTable.append(spark, Seq((1L, "a")).toDF("id", "s"), t2,
      statsCols = Seq("id"))
    ManifestTable.deleteRange(spark, t2, "id", Long.MinValue,
      Long.MaxValue)
    val df7 = spark.read.format("graft-manifest").load(t2)
      .agg(sum("id").as("s"))
    assert(isMetadataOnly(df7) && df7.collect().head.isNullAt(0))
  }

  test("grouped SUM answers per group from the same per-dir sums") {
    val t = groupedTable(withNullGroup = true)
    view(t, "m_meta_gsum")
    val df = spark.sql(
      """SELECT g, SUM(v) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |FROM m_meta_gsum GROUP BY g ORDER BY g""".stripMargin)
    assert(isMetadataOnly(df),
      s"expected metadata-only grouped SUM:\n${df.queryExecution.executedPlan}")
    val got = df.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSeq
    // de: 0+1+2+3=6, en: 10..13=46, fr: 20..23=86, null group: 181
    assert(got == Seq((None, 181L, 2L), (Some("de"), 6L, 4L),
      (Some("en"), 46L, 4L), (Some("fr"), 86L, 4L)) ||
      got == Seq((Some("de"), 6L, 4L), (Some("en"), 46L, 4L),
        (Some("fr"), 86L, 4L), (None, 181L, 2L)),
      s"got $got")
  }

  /** One commit per group value in `g` — every dir single-group by
    * construction (plus an all-null commit when `withNullGroup`). */
  private def groupedTable(withNullGroup: Boolean): String = {
    val t = s"${Files.createTempDirectory("graft-metaagg-g")}/t"
    Seq("de", "en", "fr").zipWithIndex.foreach { case (g, i) =>
      ManifestTable.append(spark,
        (0 until 4).map(x => (Some(g), (i * 10 + x).toLong))
          .toDF("g", "v"), t, statsCols = Seq("g", "v"))
    }
    if (withNullGroup)
      ManifestTable.append(spark,
        Seq((None: Option[String], 90L), (None: Option[String], 91L))
          .toDF("g", "v"), t, statsCols = Seq("g", "v"))
    t
  }

  test("GROUP BY over single-group dirs plans metadata-only") {
    val t = groupedTable(withNullGroup = true)
    view(t, "m_grp")
    val df = spark.sql(
      """SELECT g, CAST(COUNT(*) AS BIGINT) AS n, COUNT(g) AS ng,
        |MIN(v) AS lo, MAX(v) AS hi, MAX(g) AS gx
        |FROM m_grp GROUP BY g ORDER BY g""".stripMargin)
    assert(isMetadataOnly(df),
      s"single-group dirs must rewrite:\n${df.queryExecution.executedPlan}")
    // NULL group first under NULLS FIRST ordering; per-group count of
    // g is 0 there (count skips nulls), min/max of v fold that dir's
    // bounds; gx projects the group key through an aggregate
    assert(df.collect().map(_.toSeq).toSeq == Seq(
      Seq(null, 2L, 0L, 90L, 91L, null),
      Seq("de", 4L, 4L, 0L, 3L, "de"),
      Seq("en", 4L, 4L, 10L, 13L, "en"),
      Seq("fr", 4L, 4L, 20L, 23L, "fr")))
    // bit-exact with the real scan
    val scan = spark.read.format("graft-manifest").load(t)
      .groupBy("g").agg(count(lit(1)).cast("long").as("n"),
        count(col("g")).as("ng"), min("v").as("lo"), max("v").as("hi"),
        max("g").as("gx"))
      .orderBy(col("g")).collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == scan)
  }

  test("one mixed dir disqualifies the grouped rewrite, same answer") {
    val t = groupedTable(withNullGroup = false)
    // a commit spanning TWO groups: min < max in g
    ManifestTable.append(spark,
      Seq((Some("en"), 50L), (Some("fr"), 51L)).toDF("g", "v"), t,
      statsCols = Seq("g", "v"))
    val df = spark.read.format("graft-manifest").load(t)
      .groupBy("g").agg(count(lit(1)).as("n")).orderBy("g")
    assert(hasFileScan(df), "a mixed dir must fall back to the scan")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", 4L), ("en", 5L), ("fr", 5L)))
    // and a partly-null dir (some nulls beside one value) likewise:
    // min == max can't prove single-group when nulls hide next to it
    val t2 = groupedTable(withNullGroup = false)
    ManifestTable.append(spark,
      Seq((Some("en"), 60L), (None: Option[String], 61L))
        .toDF("g", "v"), t2, statsCols = Seq("g", "v"))
    val df2 = spark.read.format("graft-manifest").load(t2)
      .groupBy("g").agg(count(lit(1)).as("n")).orderBy("g")
    assert(hasFileScan(df2))
    assert(df2.collect().map(_.toSeq).toSeq ==
      Seq(Seq(null, 1L), Seq("de", 4L), Seq("en", 5L), Seq("fr", 4L)))
  }

  test("q140 equals the plain-table GROUP BY oracle, metadata-only") {
    val d = "/root/testdata/sf0.001"
    val q = operators.LayoutQueries.all
      .find(_.name == "q140_manifest_grouped_metadata_agg").get
    val got = q.run(spark, d)
    assert(isMetadataOnly(got),
      s"q140 must plan metadata-only:\n${got.queryExecution.executedPlan}")
    val plain = Tables.documents(spark, d)
      .groupBy("lang").agg(count(lit(1)).cast("long").as("n"),
        min("doc_id").as("id_lo"), max("doc_id").as("id_hi"),
        sum("doc_id").cast("long").as("id_sum"))
      .orderBy("lang")
    assert(got.collect().map(_.toSeq).toSeq ==
      plain.collect().map(_.toSeq).toSeq)
  }

  test("q139 equals the plain-table oracle") {
    val d = "/root/testdata/sf0.001"
    val q = operators.LayoutQueries.all
      .find(_.name == "q139_manifest_metadata_agg").get
    val got = q.run(spark, d)
    assert(isMetadataOnly(got),
      s"q139 must plan metadata-only:\n${got.queryExecution.executedPlan}")
    val plain = Tables.documents(spark, d)
      .agg(count(lit(1)).cast("long").as("n"),
        count(col("lang")).cast("long").as("n_lang"),
        min("doc_id").as("id_lo"), max("doc_id").as("id_hi"),
        sum("doc_id").cast("long").as("id_sum"),
        min("lang").as("lang_lo"), max("lang").as("lang_hi"))
    assert(got.collect().head.toSeq == plain.collect().head.toSeq)
  }
}
