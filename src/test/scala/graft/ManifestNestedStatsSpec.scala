package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** NESTED-path stats: `statsCols` accepts dotted leaf paths
  * (`meta.n`, `meta.lang`) — per-dir min/max/null-count/sums record
  * for the nested leaf, and pushed nested-field conjuncts prune dirs
  * through the same FileIndex probe as top-level filters
  * (GetStructField chains resolve to the dotted stat key). The raw
  * CVE-shaped table (deeply nested JSON) can prune without a
  * flattening pass.
  */
class ManifestNestedStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.getOrElse(fail("no FileSourceScanExec"))
  }

  test("nested leaf stats record and prune: ranges, strings, nullness") {
    val t = s"${Files.createTempDirectory("graft-nested1")}/t"
    def batch(lo: Long, n: Int, lang: String) =
      (lo until lo + n).map(i => (i, (lang, i * 10)))
        .toDF("doc_id", "meta")
        .select(col("doc_id"), col("meta._1").as("lang"),
          col("meta._2").as("n"))
        .select(col("doc_id"),
          struct(col("lang"), col("n")).as("meta"))
    val stats = Seq("doc_id", "meta.n", "meta.lang")
    ManifestTable.append(spark, batch(0L, 50, "de"), t,
      statsCols = stats)
    ManifestTable.append(spark, batch(50L, 50, "en"), t,
      statsCols = stats)
    // a dir whose meta struct is entirely NULL (nullness pruning)
    ManifestTable.append(spark,
      Seq((1000L, None: Option[(String, Long)])).toDF("doc_id", "m")
        .select(col("doc_id"), lit(null).cast(
          "struct<lang:string,n:bigint>").as("meta")),
      t, statsCols = stats)
    // recorded: nested leaf min/max under the DOTTED key
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    val first = entries.minBy(_.dir)
    assert(first.statMin.get("meta.n").contains(0L) &&
      first.statMax.get("meta.n").contains(490L),
      s"nested leaf bounds must record: ${first.statMin}")
    assert(first.strMin.get("meta.lang").contains("de"))
    val all = ManifestTable.read(spark, t)
    assert(all.count() == 101)
    val total = all.inputFiles.length
    // integral nested range filter prunes the disjoint dirs
    val r1 = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n") >= 600L)
    assert(r1.count() == 40)
    assert(numFiles(r1.filter(col("meta.n") >= 600L)) < total,
      "nested range filter must prune stats-disjoint dirs")
    // string nested point filter prunes by string bounds
    val r2 = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.lang") === "de")
    assert(r2.count() == 50)
    assert(numFiles(spark.read.format("graft-manifest").load(t)
      .filter(col("meta.lang") === "de")) < total)
    // IS NULL prunes the provably-null-free dirs: only the all-null
    // dir reads
    val r3 = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n").isNull)
    assert(r3.count() == 1)
    assert(numFiles(spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n").isNull)) < total)
    // SQL pushes the same nested conjuncts
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("nested_t")
    assert(spark.sql(
      "SELECT count(*) FROM nested_t WHERE meta.n BETWEEN 0 AND 90")
      .head.getLong(0) == 10)
  }

  test("general-predicate DML prunes on NESTED conjuncts") {
    val t = s"${Files.createTempDirectory("graft-nested3")}/t"
    def batch(lo: Long, n: Int, lang: String) =
      (lo until lo + n).map(i => (i, lang, i * 10))
        .toDF("id", "lang", "v")
        .select(col("id"),
          struct(col("lang"), col("v")).as("meta"))
    ManifestTable.append(spark, batch(0L, 50, "de"), t,
      statsCols = Seq("id", "meta.lang", "meta.v"))
    ManifestTable.append(spark, batch(50L, 50, "en"), t,
      statsCols = Seq("id", "meta.lang", "meta.v"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("nested_dml")
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    // nested mixed conjuncts route the general path; the en dir is
    // stats-disjoint on meta.lang and must keep physical identity
    spark.sql("DELETE FROM nested_dml " +
      "WHERE meta.lang = 'de' AND meta.v > 200")
    assert(ManifestTable.read(spark, t).count() == 71,
      "29 de rows with v in (200, 490] should delete")
    val after = ManifestTable.read(spark, t).inputFiles.toSet
    assert(after.intersect(before).nonEmpty,
      "the nested-stats-disjoint dir must not rewrite")
    // nested UPDATE WHERE works the same way (SET stays top-level)
    ManifestTable.append(spark,
      (100L until 110L).map(i => (i, ("fr", i))).toDF("id", "m")
        .select(col("id"), col("m._1").as("lang"), col("m._2").as("v"))
        .select(col("id"), struct(col("lang"), col("v")).as("meta"))
        .withColumn("flag", lit(0L)),
      t, statsCols = Seq("id"), evolveSchema = true)
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("nested_dml")
    spark.sql("UPDATE nested_dml SET flag = 1 " +
      "WHERE meta.lang = 'fr' AND meta.v >= 105")
    assert(ManifestTable.read(spark, t)
      .filter(col("flag") === 1L).count() == 5)
  }

  test("UPDATE SET on nested fields: in-place leaf patch, NULL parents stay NULL") {
    val t = s"${Files.createTempDirectory("graft-nested4")}/t"
    ManifestTable.append(spark,
      Seq((1L, ("de", 10L)), (2L, ("en", 20L)), (3L, ("fr", 30L)))
        .toDF("id", "m")
        .select(col("id"), col("m._1").as("lang"), col("m._2").as("v"))
        .select(col("id"), struct(col("lang"), col("v")).as("meta")),
      t, statsCols = Seq("id"))
    // a NULL-parent row: SET meta.v must never materialize a struct
    ManifestTable.append(spark,
      Seq(Tuple1(4L)).toDF("id")
        .select(col("id"), lit(null)
          .cast("struct<lang:string,v:bigint>").as("meta")),
      t, statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("nset_t")
    spark.sql("UPDATE nset_t SET meta.v = meta.v + 1 WHERE id <= 2")
    def state(): Seq[(Long, Option[(String, Long)])] =
      ManifestTable.read(spark, t).orderBy("id").collect()
        .map(r => (r.getLong(0), Option(r.getStruct(1))
          .map(s => (s.getString(0), s.getLong(1))))).toSeq
    assert(state() == Seq(
      (1L, Some(("de", 11L))), (2L, Some(("en", 21L))),
      (3L, Some(("fr", 30L))), (4L, None)), s"got ${state()}")
    // two leaves under one struct chain onto one rebuild
    spark.sql(
      "UPDATE nset_t SET meta.v = 0, meta.lang = 'xx' WHERE id = 3")
    assert(state()(2) == ((3L, Some(("xx", 0L)))), s"got ${state()}")
    // the NULL parent stays NULL even when its row matches
    spark.sql("UPDATE nset_t SET meta.v = 99 WHERE id = 4")
    assert(state()(3) == ((4L, None)),
      "a NULL parent struct must never be materialized by a leaf SET")
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // an unresolvable nested path is loud
    val ex = intercept[Exception] {
      spark.sql("UPDATE nset_t SET meta.nope = 1")
    }
    assert(msgs(ex).exists(m => m.contains("does not resolve") ||
      m.toUpperCase.contains("FIELD")), s"got ${msgs(ex)}")
  }

  test("nested stats survive a staged rewrite's grouped restat") {
    val t = s"${Files.createTempDirectory("graft-nested2")}/t"
    val df = (0L until 100L).map(i => (i, i * 2))
      .toDF("id", "v")
      .select(col("id"), struct(col("v")).as("meta"))
    ManifestTable.append(spark, df, t,
      statsCols = Seq("id", "meta.v"))
    // the rewrite (a range delete) restats the nested key too
    ManifestTable.deleteRange(spark, t, "id", 0L, 9L)
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    val e = entries.find(_.rows.exists(_ > 0)).get
    assert(e.statMin.get("meta.v").contains(20L) &&
      e.statMax.get("meta.v").contains(198L),
      s"rewritten dir must re-record nested bounds: ${e.statMin} " +
        s"${e.statMax}")
    assert(ManifestTable.read(spark, t)
      .filter(col("meta.v") < 20L).count() == 0)
  }

  test("nested bloomCols: dotted Blooms record and a nested point " +
      "lookup prunes on them alone (vacuous range stats)") {
    val t = s"${Files.createTempDirectory("graft-nestedbloom")}/t"
    // interleaved layout: each dir holds the i % 4 == r slice, so
    // every dir's key RANGE spans the whole domain — only the per-dir
    // Bloom (small key SET) can prove absence. No statsCols on the
    // probed leaves: the Bloom is the sole discriminator.
    def slice(r: Int) = (0L until 200L).filter(_ % 4 == r)
      .map(i => (i, (f"k$i%03d", i)))
      .toDF("doc_id", "kv")
      .select(col("doc_id"), struct(
        col("kv._1").as("key"), col("kv._2").as("n")).as("meta"))
    (0 until 4).foreach(r => ManifestTable.append(spark, slice(r), t,
      bloomCols = Seq("meta.key", "meta.n")))
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    assert(entries.forall(e => e.strBloom.contains("meta.key") &&
      e.bloom.contains("meta.n")),
      s"dotted bloomCols must record: ${entries.map(_.strBloom.keys)}")
    val total = ManifestTable.read(spark, t).inputFiles.length
    // string nested point lookup: k005 lives in exactly one slice
    val key = "k%03d".format(5)
    val q1 = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.key") === key)
    assert(q1.count() == 1)
    assert(numFiles(spark.read.format("graft-manifest").load(t)
      .filter(col("meta.key") === key)) < total,
      "a nested string point lookup must consult the dotted Bloom")
    // integral nested point lookup through the same probe
    val q2 = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n") === 6L)
    assert(q2.count() == 1)
    assert(numFiles(spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n") === 6L)) < total,
      "a nested integral point lookup must consult the dotted Bloom")
  }
}
