package graft

import graft.sinks.ManifestTable
import graft.sources.ManifestFileIndex
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The `graft-manifest` SQL surface: plain SQL / DataFrame filters
  * drive the same manifest-stats dir pruning `readPruned` does
  * programmatically, through Spark's own FileSourceStrategy pushdown
  * — and everything downstream is the stock parquet scan.
  */
class ManifestSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the plan"))

  test("SQL WHERE prunes manifest dirs; plan and answer both pin it") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureManifestDocs(spark, d)
    val df = spark.read.format("graft-manifest").load(path)
      .filter(col("doc_id").between(10, 60))
      .select("doc_id", "lang", "n_chars")
    val rows = df.collect()
    val scan = scanOf(df)
    // the predicate reached the parquet reader (row-group skipping)...
    assert(scan.metadata("PushedFilters").contains("doc_id"))
    // ...and the FILE LIST was pruned from the manifest: the executed
    // scan read exactly the files readPruned selects (1 of 4 dirs)
    val expected =
      ManifestTable.readPruned(spark, path, "doc_id", 10L, 60L)
        .inputFiles.length
    val allFiles = ManifestTable.read(spark, path).inputFiles.length
    assert(scan.metrics("numFiles").value == expected &&
      expected < allFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected the pruned $expected of $allFiles")
    // parity with the plain table
    val plain = Tables.documents(spark, d)
      .filter(col("doc_id").between(10, 60))
      .select("doc_id", "lang", "n_chars").collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      plain.map(_.toString).sorted.toSeq && rows.nonEmpty)
  }

  test("registered SQL view: q130 equals q128's programmatic pruned read") {
    val d = "/root/testdata/sf0.001"
    val q130 = operators.LayoutQueries.all
      .find(_.name == "q130_manifest_sql_pushdown").get.run(spark, d)
    val q128 = operators.LayoutQueries.all
      .find(_.name == "q128_manifest_pruned_scan").get.run(spark, d)
    assert(q130.collect().map(_.toString).toSeq ==
      q128.collect().map(_.toString).toSeq)
  }

  test("q132: a categorical WHERE prunes to one lang commit via string stats") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureManifestDocsByLang(spark, d)
    val df = spark.read.format("graft-manifest").load(path)
      .filter(col("lang") === "es")
      .select("doc_id", "lang", "source")
    df.collect()
    val scan = scanOf(df)
    val oneDir = ManifestTable
      .readPrunedStr(spark, path, "lang", "es", "es").inputFiles.length
    val allFiles = ManifestTable.read(spark, path).inputFiles.length
    assert(scan.metrics("numFiles").value == oneDir && oneDir < allFiles,
      s"scan read ${scan.metrics("numFiles").value} files, expected " +
        s"the one lang commit's $oneDir of $allFiles")
    // and the registered query matches the plain table
    val q132 = operators.LayoutQueries.all
      .find(_.name == "q132_manifest_categorical_pruning").get
      .run(spark, d).collect().map(_.toString).toSeq
    val plain = Tables.documents(spark, d).filter(col("lang") === "es")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(lit(1))
        .cast("long").as("n"),
        org.apache.spark.sql.functions.sum(col("n_chars"))
          .cast("long").as("chars"))
      .orderBy("source").collect().map(_.toString).toSeq
    assert(q132 == plain && q132.nonEmpty)
  }

  test("q134: the clustered rewrite turns a vacuous range probe into a 1-dir scan") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureClusteredManifest(spark, d)
    // pre-cluster snapshot (v4, mod-4 commits): the same probe reads
    // every dir — its stats all span the full range
    val pre = ManifestTable.readPruned(
      spark, s"$path", "doc_id", 20L, 80L) // latest = clustered
    val preDirs = ManifestTable.entriesOf(spark, path, 4L)
    assert(preDirs.forall(_.mightOverlap("doc_id", 20L, 80L)),
      "arrival-ordered commits must be unprunable for this range")
    // post-cluster: the SQL surface plans a strict subset of dirs
    val df = spark.read.format("graft-manifest").load(path)
      .filter(col("doc_id").between(20, 80)).select("doc_id", "lang")
    df.collect()
    val scan = scanOf(df)
    val allFiles = ManifestTable.read(spark, path).inputFiles.length
    assert(scan.metrics("numFiles").value < allFiles,
      s"clustered scan read ${scan.metrics("numFiles").value} of " +
        s"$allFiles files — expected pruning")
    assert(scan.metrics("numFiles").value == pre.inputFiles.length)
    // and the registered query matches the plain table
    val q134 = operators.LayoutQueries.all
      .find(_.name == "q134_manifest_clustered_rewrite").get
      .run(spark, d).collect().map(_.toString).toSeq
    val plain = Tables.documents(spark, d)
      .filter(col("doc_id").between(20, 80))
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(lit(1))
        .cast("long").as("n"),
        org.apache.spark.sql.functions.sum(col("n_chars"))
          .cast("long").as("chars"))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(q134 == plain && q134.nonEmpty)
  }

  test("q135: IN point lookup prunes via manifest blooms where ranges cannot") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureBloomManifest(spark, d)
    // range stats are vacuous on the interleaved layout
    assert(ManifestTable.entriesOf(spark, path, 4L)
      .forall(_.mightOverlap("doc_id", 42L, 42L)))
    val df = spark.read.format("graft-manifest").load(path)
      .filter(col("doc_id").isin(42L, 137L, 301L))
      .select("doc_id", "lang")
    val rows = df.collect()
    val scan = scanOf(df)
    val allFiles = ManifestTable.read(spark, path).inputFiles.length
    val expected = ManifestTable
      .readPrunedIn(spark, path, "doc_id", Seq(42L, 137L, 301L))
      .inputFiles.length
    assert(scan.metrics("numFiles").value == expected &&
      expected < allFiles,
      s"bloom point lookup read ${scan.metrics("numFiles").value} of " +
        s"$allFiles files, expected $expected")
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(42L, 137L, 301L))
  }

  test("q136: a string-key point lookup prunes via string blooms where bounds cannot") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureStrBloomManifest(spark, d)
    // string BOUNDS are vacuous on the interleaved layout: every dir's
    // [min, max] admits the probe keys
    assert(ManifestTable.entriesOf(spark, path, 4L)
      .forall(_.mightOverlapStr("doc_key", "doc-42", "doc-42")))
    val df = spark.read.format("graft-manifest").load(path)
      .filter(col("doc_key").isin("doc-42", "doc-137", "doc-301"))
      .select("doc_id", "doc_key", "lang")
    val rows = df.collect()
    val scan = scanOf(df)
    val allFiles = ManifestTable.read(spark, path).inputFiles.length
    val expected = ManifestTable.readPrunedInStr(spark, path, "doc_key",
      Seq("doc-42", "doc-137", "doc-301")).inputFiles.length
    assert(scan.metrics("numFiles").value == expected &&
      expected < allFiles,
      s"string bloom lookup read ${scan.metrics("numFiles").value} of " +
        s"$allFiles files, expected $expected")
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(42L, 137L, 301L))
    // the registered query matches the plain table
    val q136 = operators.LayoutQueries.all
      .find(_.name == "q136_manifest_string_bloom_lookup").get
      .run(spark, d).collect().map(_.toString).toSeq
    val plain = Tables.documents(spark, d)
      .filter(col("doc_id").isin(42L, 137L, 301L))
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(q136 == plain && q136.nonEmpty)
  }

  test("q138: Z-cluster rewrite makes BOTH axes prunable from manifest stats") {
    val d = "/root/testdata/sf0.001"
    val path = operators.LayoutQueries.ensureZClusteredManifest(spark, d)
    val all = ManifestTable.read(spark, path).inputFiles.length
    // axis 1 (doc_id): a selective range plans a strict subset of dirs
    val byId = spark.read.format("graft-manifest").load(path)
      .filter(col("doc_id").between(10, 60)).select("doc_id", "lang")
    byId.collect()
    assert(scanOf(byId).metrics("numFiles").value < all,
      s"doc_id axis unpruned: ${scanOf(byId).metrics("numFiles").value}" +
        s" of $all files")
    // axis 2 (n_chars): the axis a single-column cluster cannot serve
    val byChars = spark.read.format("graft-manifest").load(path)
      .filter(col("n_chars").between(200, 250)).select("doc_id", "lang")
    byChars.collect()
    assert(scanOf(byChars).metrics("numFiles").value < all,
      s"n_chars axis unpruned: " +
        s"${scanOf(byChars).metrics("numFiles").value} of $all files")
    // the registered query matches the plain table
    val q138 = operators.LayoutQueries.all
      .find(_.name == "q138_manifest_zorder_cluster").get
      .run(spark, d).collect().map(_.toString).toSeq
    val plain = Tables.documents(spark, d)
      .filter(col("n_chars").between(200, 250))
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(lit(1))
        .cast("long").as("n"),
        org.apache.spark.sql.functions.sum(col("doc_id"))
          .cast("long").as("id_sum"))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(q138 == plain && q138.nonEmpty)
  }

  test("planning is metadata-only: relation + pruned scan issue zero data-dir listings") {
    val t = s"${Files.createTempDirectory("graft-mfmeta")}/t"
    // a modern table: every entry records its file list at commit
    ManifestTable.append(spark, Seq((1L, "a"), (5L, "b")).toDF("id", "s"),
      t, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq((10L, "c")).toDF("id", "s"), t,
      statsCols = Seq("id"))
    ManifestTable.append(spark, Seq((20L, "d")).toDF("id", "s"), t,
      statsCols = Seq("id"))
    val v = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.entriesOf(spark, t, v).forall(_.files.isDefined),
      "every committed entry must carry its file list")
    val before = ManifestTable.dataListings.get
    // SQL surface: relation construction, dir-pruned listFiles, and
    // the actual scan — all from the manifest's recorded file lists
    val df = spark.read.format("graft-manifest").load(t)
      .filter(col("id").between(8, 12)).select("id", "s")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(10L))
    val scan = scanOf(df)
    assert(scan.metrics("numFiles").value <
      ManifestTable.read(spark, t).inputFiles.length)
    // programmatic emptiness checks answer from metadata too
    ManifestTable.readPruned(spark, t, "id", 8L, 12L).collect()
    assert(ManifestTable.dataListings.get == before,
      s"planning listed the data tree " +
        s"${ManifestTable.dataListings.get - before} time(s) — " +
        "a modern table must plan from the manifest alone")
    // the recorded lists agree byte-for-byte with the filesystem
    val recorded = ManifestTable.entriesOf(spark, t, v)
      .flatMap(e => e.files.get.map { case (n, len) =>
        (s"$t/data/${e.dir}/$n", len) }).toMap
    recorded.foreach { case (p, len) =>
      val f = new java.io.File(p)
      assert(f.isFile && f.length() == len, s"recorded $p mismatches disk")
    }
    // pre-upgrade entries (no file list) still read via the fallback
    // listing — one per legacy dir, correct rows
    val t2 = s"${Files.createTempDirectory("graft-mfmeta2")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t2)
    // strip the recorded list to simulate a legacy manifest
    val legacy = ManifestTable.entriesOf(spark, t2, 1L)
      .map(_.copy(files = None))
    ManifestTable.commit(spark, t2, 2L, legacy,
      new org.apache.spark.sql.types.StructType().add("id", "long"), -1L)
    assert(spark.read.format("graft-manifest").load(t2)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("versionAsOf time travel; unfiltered scan reads the whole snapshot") {
    val t = s"${Files.createTempDirectory("graft-mfsql")}/t"
    ManifestTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      t, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq((3L, "c")).toDF("id", "s"), t,
      statsCols = Seq("id"))
    val v1 = spark.read.format("graft-manifest")
      .option("versionAsOf", "1").load(t)
    assert(v1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val latest = spark.read.format("graft-manifest").load(t)
    assert(latest.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // a vacuumed / never-committed version fails loudly
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest").option("versionAsOf", "9").load(t)
    }
    assert(ex.getMessage.contains("not a committed snapshot"))
    // an emptied table is a readable empty relation (schema sidecar)
    ManifestTable.deleteRange(spark, t, "id", 0L, 99L)
    val empty = spark.read.format("graft-manifest").load(t)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "s"))
  }

  test("snapshot pinning: a resolved relation ignores later commits") {
    val t = s"${Files.createTempDirectory("graft-mfsql2")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    val pinned = spark.read.format("graft-manifest").load(t)
    ManifestTable.append(spark, Seq(2L).toDF("id"), t)
    assert(pinned.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("boundsOf extracts only ranges that are safe to widen") {
    val id = AttributeReference("id", LongType)()
    val ts = AttributeReference("ts", LongType)()
    def b(es: Expression*) = ManifestFileIndex.boundsOf(es)
    // >=, <= pin both ends; > / < widen to their inclusive forms
    assert(b(GreaterThanOrEqual(id, Literal(10L)),
      LessThanOrEqual(id, Literal(60L))) == Map("id" -> ((10L, 60L))))
    assert(b(GreaterThan(id, Literal(10L))) ==
      Map("id" -> ((10L, Long.MaxValue))))
    // reversed literal-first comparisons
    assert(b(GreaterThan(Literal(60L), id)) ==
      Map("id" -> ((Long.MinValue, 60L))))
    // equality, IN, casts inserted by type widening
    assert(b(EqualTo(id, Literal(7L))) == Map("id" -> ((7L, 7L))))
    assert(b(In(Cast(id, LongType), Seq(Literal(3L), Literal(9L)))) ==
      Map("id" -> ((3L, 9L))))
    // nested AND walks; multiple columns accumulate independently
    assert(b(And(GreaterThanOrEqual(id, Literal(1L)),
      LessThan(ts, Literal(5L)))) ==
      Map("id" -> ((1L, Long.MaxValue)), "ts" -> ((Long.MinValue, 5L))))
    // conjuncts on one column intersect
    assert(b(GreaterThanOrEqual(id, Literal(1L)),
      GreaterThanOrEqual(id, Literal(4L))) ==
      Map("id" -> ((4L, Long.MaxValue))))
    // OR is not a conjunction of ranges — contributes nothing
    assert(b(Or(EqualTo(id, Literal(1L)), EqualTo(id, Literal(2L))))
      .isEmpty)
    // fractional literals are skipped (no unsound floor/ceil guess)
    assert(b(GreaterThanOrEqual(id, Literal(1.5d))).isEmpty)
    // temporal literals are skipped even though their runtime value is
    // a Long — epoch MICROS would be compared against stats recorded
    // in a different unit (unsound pruning, not just a missed prune)
    assert(b(GreaterThanOrEqual(id, Literal(1704067200000000L,
      org.apache.spark.sql.types.TimestampType))).isEmpty)
    // a NARROWING cast is value-changing (wraparound) — never stripped
    assert(b(EqualTo(Cast(id, org.apache.spark.sql.types.IntegerType),
      Literal(5))).isEmpty)
  }

  test("IS NULL / IS NOT NULL prune dirs from recorded null counts") {
    val t = s"${Files.createTempDirectory("graft-nullprune")}/t"
    // three commits with distinct null profiles in `v`:
    //   A null-free, B mixed, C all-null (C gets NO string bounds —
    //   an all-null column records nothing — so only the null count
    //   can prune it)
    ManifestTable.append(spark,
      Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "v"), t,
      statsCols = Seq("id", "v"))
    ManifestTable.append(spark,
      Seq((3L, None: Option[String]), (4L, Some("d"))).toDF("id", "v"),
      t, statsCols = Seq("id", "v"))
    ManifestTable.append(spark,
      Seq((5L, None: Option[String]), (6L, None: Option[String]))
        .toDF("id", "v"), t, statsCols = Seq("id", "v"))
    val entries = ManifestTable
      .entriesOf(spark, t, ManifestTable.latestVersion(spark, t).get)
      .sortBy(_.dir)
    assert(entries.map(_.nullCnt.get("v")) ==
      Seq(Some(0L), Some(1L), Some(2L)))
    def filesOf(dirIdx: Int*): Long =
      dirIdx.map(i => entries(i).files.get.size.toLong).sum
    def table = spark.read.format("graft-manifest").load(t)

    val isNull = table.filter(col("v").isNull).select("id")
    assert(isNull.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 5L, 6L))
    assert(scanOf(isNull).metrics("numFiles").value == filesOf(1, 2),
      "IS NULL must prune the null-free dir")

    val notNull = table.filter(col("v").isNotNull).select("id")
    assert(notNull.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L))
    assert(scanOf(notNull).metrics("numFiles").value == filesOf(0, 1),
      "IS NOT NULL must prune the all-null dir")

    // a VALUE filter prunes the all-null dir too — Catalyst conjoins
    // IsNotNull(v) onto it, and the all-null dir has no string bounds
    // for the range check to use: without the null count it is kept
    val eq = table.filter(col("v") === "a").select("id")
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(scanOf(eq).metrics("numFiles").value == filesOf(0),
      "v = 'a' must keep only the first dir (bounds prune B, " +
        "null count prunes all-null C)")
  }
}
