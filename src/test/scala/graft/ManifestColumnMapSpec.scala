package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Column rename/drop via stable FIELD IDS (Iceberg's contract on
  * Spark's native parquet field-id matching): both are one metadata
  * commit, zero data movement — a renamed column keeps reading its
  * old files by id, a dropped-then-re-added name never resurrects
  * the dead column's bytes, per-entry stats follow the rename so old
  * dirs keep pruning, time travel shows each era's own names, and
  * the change feed maps old rows onto the new name.
  */
class ManifestColumnMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rename: old and new files read by id; stats follow; history pins") {
    val t = s"${Files.createTempDirectory("graft-cm1")}/t"
    ManifestTable.append(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"))
    ManifestTable.append(spark,
      Seq((3L, 30L), (4L, 40L)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"))
    val vPre = ManifestTable.latestVersion(spark, t).get
    val v = ManifestTable.renameColumn(spark, t, "n", "chars")
    assert(v == vPre + 1)
    // old files resolve the renamed column BY ID — full values, no
    // nulls
    val rows = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    assert(ManifestTable.read(spark, t).columns.toSeq ==
      Seq("id", "chars"))
    // writes after the rename land under the new name and read back
    // united with the old files
    ManifestTable.append(spark, Seq((5L, 50L)).toDF("id", "chars"), t,
      statsCols = Seq("id", "chars"))
    assert(ManifestTable.read(spark, t)
      .filter(col("chars") > 25).count() == 3)
    // per-entry stats were REKEYED: old dirs keep pruning on the new
    // name (and no stale key remains under the old one)
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    assert(entries.filter(_.rows.exists(_ > 0))
      .forall(e => e.statMin.contains("chars") && !e.statMin.contains("n")),
      s"stats must follow the rename: ${entries.map(_.statMin)}")
    // time travel BEFORE the rename shows that era's name and values
    val old = ManifestTable.readVersion(spark, t, vPre)
    assert(old.columns.toSeq == Seq("id", "n"))
    assert(old.collect().map(_.getLong(1)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L))
    // the rename is visible provenance
    assert(ManifestTable.history(spark, t).collect()
      .map(_.getString(2)).contains("renameColumn"))
  }

  test("the renamed column keeps PRUNING old dirs: a plan pin") {
    val t = s"${Files.createTempDirectory("graft-cm6")}/t"
    // two range-disjoint dirs committed BEFORE the rename
    ManifestTable.append(spark,
      (0L until 50L).map(i => (i, i * 10)).toDF("id", "n"), t,
      statsCols = Seq("n"))
    ManifestTable.append(spark,
      (50L until 100L).map(i => (i, i * 10)).toDF("id", "n"), t,
      statsCols = Seq("n"))
    ManifestTable.renameColumn(spark, t, "n", "m")
    // filtering on the NEW name must prune the disjoint OLD dir via
    // the REKEYED stats — the executed scan reads 1 of 2 dirs' files
    val df = spark.read.format("graft-manifest").load(t)
      .filter(col("m") >= 600)
    assert(df.count() == 40)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    val allFiles = ManifestTable.read(spark, t).inputFiles.length
    assert(scan.metrics("numFiles").value < allFiles,
      s"rekeyed stats must prune the disjoint pre-rename dir: read " +
        s"${scan.metrics("numFiles").value} of $allFiles files")
    // and the pushed filter reaches the parquet reader under the new
    // name (old files lack it by name — the reader skips pushdown
    // there and resolves the column by id; values stay exact)
    assert(scan.metadata("PushedFilters").contains("m"))
  }

  test("drop retires the name: reads exclude it, reuse is refused loudly") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-cm2")}/t"
    ManifestTable.append(spark,
      Seq((1L, "x", 100L), (2L, "y", 200L)).toDF("id", "s", "score"),
      t, statsCols = Seq("score"))
    ManifestTable.dropColumn(spark, t, "score")
    assert(ManifestTable.read(spark, t).columns.toSeq == Seq("id", "s"))
    assert(ManifestTable.read(spark, t).count() == 2)
    // re-adding the SAME name is REFUSED: the old files still carry
    // 'score' under the dead field id, and parquet row-group filter
    // pushdown matches by NAME — a same-named new column would have
    // its pushed filters evaluated against the dead column's
    // statistics (empirically, IS NULL on it skips every old row
    // group). Retiring the name permanently is the honest contract
    // on vanilla Spark's reader.
    val ex = intercept[Exception] {
      ManifestTable.append(spark,
        Seq((3L, "z", 7L)).toDF("id", "s", "score"), t,
        evolveSchema = true)
    }
    assert(msgs(ex).exists(_.contains("RETIRED")), s"got ${msgs(ex)}")
    // a rename target can't be a retired name either
    val ex2 = intercept[Exception] {
      ManifestTable.renameColumn(spark, t, "s", "score")
    }
    assert(msgs(ex2).exists(_.contains("retired")), s"got ${msgs(ex2)}")
    // a DIFFERENT name evolves fine and reads null on old rows
    ManifestTable.append(spark,
      Seq((3L, "z", 7L)).toDF("id", "s", "score2"), t,
      evolveSchema = true)
    assert(ManifestTable.read(spark, t)
      .filter(col("score2").isNull).count() == 2)
  }

  test("rewrites and DML keep working on a mapped table") {
    val t = s"${Files.createTempDirectory("graft-cm3")}/t"
    ManifestTable.append(spark,
      (0L until 100L).map(i => (i, s"r$i", i * 10)).toDF("id", "s", "n"),
      t, statsCols = Seq("id"))
    ManifestTable.renameColumn(spark, t, "n", "m")
    // in-place UPDATE through the staged rewrite on the renamed col
    ManifestTable.updateRange(spark, t, "id", 10L, 19L,
      Seq("m" -> (col("m") + 1)))
    assert(ManifestTable.read(spark, t)
      .filter(col("id") === 15).head().getLong(2) == 151L)
    // merge-on-read delete + materialization
    ManifestTable.deleteKeys(spark, Seq("r7").toDF("s"), t, "s")
    assert(ManifestTable.read(spark, t).count() == 99)
    ManifestTable.rewriteDeletes(spark, t)
    assert(ManifestTable.read(spark, t).count() == 99)
    // compaction of a mapped table preserves values under the rename
    ManifestTable.compact(spark, t)
    assert(ManifestTable.read(spark, t)
      .agg(sum(col("m"))).head().getLong(0) ==
      (0L until 100L).filter(_ != 7L).map(_ * 10).sum + 10L)
  }

  test("the change feed maps pre-rename rows onto the new name") {
    val t = s"${Files.createTempDirectory("graft-cm4")}/t"
    ManifestTable.append(spark, Seq((1L, 10L)).toDF("id", "n"), t,
      statsCols = Seq("id"))                        // v1
    ManifestTable.renameColumn(spark, t, "n", "m")  // v2 (no rows)
    ManifestTable.append(spark, Seq((2L, 20L)).toDF("id", "m"), t) // v3
    val ch = ManifestTable.readChanges(spark, t, 0L, 3L).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("m"),
        r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version")))
      .sorted.toSeq
    assert(ch == Seq((1L, 10L, "insert", 1L), (2L, 20L, "insert", 3L)),
      s"got $ch")
  }

  test("refusals: partition source, constraint ref, dv key, last column") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-cm5")}/t"
    ManifestTable.append(spark,
      Seq(("a", 1L, "k1")).toDF("grp", "n", "s"), t,
      statsCols = Seq("s"), bloomCols = Seq("s"),
      partitionSpec = Seq(graft.sinks.PartitionTransform.PIdentity("grp")))
    assert(msgs(intercept[Exception](
      ManifestTable.renameColumn(spark, t, "grp", "g")))
      .exists(_.contains("partition-source")))
    ManifestTable.addConstraint(spark, t, "n_pos", "n > 0")
    assert(msgs(intercept[Exception](
      ManifestTable.dropColumn(spark, t, "n")))
      .exists(_.contains("n_pos")))
    ManifestTable.deleteKeys(spark, Seq("nope").toDF("s"), t, "s")
    if (ManifestTable.entriesOf(spark, t,
        ManifestTable.latestVersion(spark, t).get)
        .exists(_.dv.nonEmpty))
      assert(msgs(intercept[Exception](
        ManifestTable.renameColumn(spark, t, "s", "s2")))
        .exists(_.contains("deletion vectors")))
    val t2 = s"${Files.createTempDirectory("graft-cm5b")}/t"
    ManifestTable.append(spark, Seq(Tuple1(1L)).toDF("only"), t2)
    assert(msgs(intercept[Exception](
      ManifestTable.dropColumn(spark, t2, "only")))
      .exists(_.contains("only column")))
  }

  test("NESTED leaf rename/drop: old files resolve by nested id; stats rekey") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-cmn")}/t"
    def batch(lo: Long, n: Int, lang: String) =
      (lo until lo + n).map(i => (i, lang, i * 10))
        .toDF("doc_id", "lang", "n")
        .select(col("doc_id"),
          struct(col("lang"), col("n")).as("meta"))
    // two range-disjoint dirs with NESTED leaf stats, pre-rename
    ManifestTable.append(spark, batch(0L, 50, "de"), t,
      statsCols = Seq("doc_id", "meta.lang", "meta.n"))
    ManifestTable.append(spark, batch(50L, 50, "en"), t,
      statsCols = Seq("doc_id", "meta.lang", "meta.n"))
    // rename the LEAF inside its struct — one metadata commit
    val vFiles = ManifestTable.read(spark, t).inputFiles.toSet
    ManifestTable.renameColumn(spark, t, "meta.n", "m")
    assert(ManifestTable.read(spark, t).inputFiles.toSet == vFiles,
      "a nested rename must move zero data")
    // old files resolve the renamed leaf BY NESTED FIELD ID
    val got = ManifestTable.read(spark, t)
      .select(col("doc_id"), col("meta.m"))
      .orderBy("doc_id").limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 0L), (1L, 10L), (2L, 20L)),
      s"nested id resolution failed: $got")
    // stats REKEYED under the new dotted path: the disjoint dir
    // prunes on the new name
    val df = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.m") >= 600L)
    assert(df.count() == 40)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(scan.metrics("numFiles").value <
      ManifestTable.read(spark, t).inputFiles.length,
      "rekeyed nested stats must prune the disjoint pre-rename dir")
    // a post-rename append writes the NEW shape; both eras read
    ManifestTable.append(spark,
      (100L until 110L).map(i => (i, "fr", i * 10))
        .toDF("doc_id", "lang", "m")
        .select(col("doc_id"),
          struct(col("lang"), col("m")).as("meta")), t,
      statsCols = Seq("doc_id", "meta.lang", "meta.m"))
    assert(ManifestTable.read(spark, t).count() == 110)
    assert(ManifestTable.read(spark, t)
      .agg(sum(col("meta.m"))).head.getLong(0) ==
      (0L until 110L).map(_ * 10L).sum)
    // DROP a nested leaf: reads exclude it, old bytes never surface
    ManifestTable.dropColumn(spark, t, "meta.lang")
    val shape = ManifestTable.read(spark, t).schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(shape.toSeq == Seq("m"), s"got ${shape.toSeq}")
    // retirement guards the whole subtree: after dropping the struct,
    // re-adding a top-level 'meta' would resurrect nested names by
    // row-group pushdown — refused
    ManifestTable.dropColumn(spark, t, "meta")
    val exReuse = intercept[Exception] {
      ManifestTable.append(spark,
        Seq((200L, 1L)).toDF("doc_id", "meta"), t,
        evolveSchema = true)
    }
    assert(msgs(exReuse).exists(_.contains("RETIRED")),
      s"got ${msgs(exReuse)}")
    // dropping the last field of a struct is loud (drop the struct)
    val t2 = s"${Files.createTempDirectory("graft-cmn2")}/t"
    ManifestTable.append(spark,
      Seq((1L, Tuple1("x"))).toDF("id", "meta"), t2)
    assert(msgs(intercept[Exception](
      ManifestTable.dropColumn(spark, t2, "meta._1")))
      .exists(_.contains("only column")))
  }

  test("NESTED ADD COLUMN: one metadata commit, old rows null-fill, new shape writes") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-cma")}/t"
    ManifestTable.append(spark,
      Seq((1L, ("de", 10L)), (2L, ("en", 20L))).toDF("id", "m")
        .select(col("id"), col("m._1").as("lang"), col("m._2").as("n"))
        .select(col("id"), struct(col("lang"), col("n")).as("meta")),
      t, statsCols = Seq("id"))
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    ManifestTable.addNestedColumn(spark, t, "meta", "score",
      org.apache.spark.sql.types.DoubleType)
    assert(ManifestTable.read(spark, t).inputFiles.toSet == filesBefore,
      "a nested add must move zero data")
    // old rows read the new leaf as NULL
    assert(ManifestTable.read(spark, t)
      .filter(col("meta.score").isNull).count() == 2)
    // new writes carry the new shape; both eras read together
    ManifestTable.append(spark,
      Seq((3L, ("fr", 30L, 0.5))).toDF("id", "m")
        .select(col("id"), col("m._1").as("lang"),
          col("m._2").as("n"), col("m._3").as("score"))
        .select(col("id"), struct(col("lang"), col("n"),
          col("score")).as("meta")),
      t, statsCols = Seq("id"))
    val got = ManifestTable.read(spark, t).orderBy("id")
      .select(col("id"), col("meta.score")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some(0.5))),
      s"got $got")
    // the added leaf got a field id: it RENAMES later, post-add
    // files resolving by nested id
    ManifestTable.renameColumn(spark, t, "meta.score", "quality")
    assert(ManifestTable.read(spark, t)
      .filter(col("meta.quality") === 0.5).count() == 1)
    // SQL routing: ALTER TABLE ... ADD COLUMN meta.x through the
    // catalog name
    val wh = Files.createTempDirectory("graft-cma-wh").toString
    spark.conf.set("spark.sql.catalog.ga",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ga.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ga.db")
    spark.sql("CREATE TABLE ga.db.n (id BIGINT, " +
      "meta STRUCT<lang: STRING>) USING `graft-manifest`")
    spark.sql("INSERT INTO ga.db.n VALUES (1, named_struct('lang','de'))")
    spark.sql("ALTER TABLE ga.db.n ADD COLUMN meta.x BIGINT")
    assert(spark.sql("SELECT meta.x FROM ga.db.n").collect()
      .forall(_.isNullAt(0)))
    // loud shapes: non-struct parent, duplicate, missing parent
    assert(msgs(intercept[Exception](ManifestTable.addNestedColumn(
      spark, t, "id", "x", org.apache.spark.sql.types.LongType)))
      .exists(_.contains("not a struct")))
    assert(msgs(intercept[Exception](ManifestTable.addNestedColumn(
      spark, t, "meta", "lang", org.apache.spark.sql.types.LongType)))
      .exists(_.contains("already exists")))
    assert(msgs(intercept[Exception](ManifestTable.addNestedColumn(
      spark, t, "nope", "x", org.apache.spark.sql.types.LongType)))
      .exists(_.contains("not a struct")))
  }
}
