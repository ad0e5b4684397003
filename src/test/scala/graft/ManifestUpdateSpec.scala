package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The copy-on-write UPDATE family (`ManifestTable.updateRange` /
  * `updateKeys` / `updateAll` / `mergeUpdate`): matching rows are
  * patched IN PLACE — same dirs, same row order and count — only
  * stat-overlapping dirs rewrite (every other dir keeps physical
  * identity), old snapshots stay readable, recorded stats re-derive
  * for the SET columns, pending deletion vectors never resurrect, and
  * every boundary violation is loud.
  */
class ManifestUpdateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("updateRange patches in place: dir identity, order, snapshot isolation, restat") {
    val t = s"${Files.createTempDirectory("graft-updr")}/t"
    // two dirs in disjoint id ranges; the second also carries a
    // non-trivial row order we expect to SURVIVE the rewrite
    ManifestTable.append(spark,
      Seq((1L, 10L), (5L, 10L)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"))
    ManifestTable.append(spark,
      Seq((15L, 10L), (11L, 10L), (13L, 10L)).toDF("id", "n").coalesce(1),
      t, statsCols = Seq("id", "n"))
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    val (v, nDirs) = ManifestTable.updateRange(spark, t, "id", 11L, 14L,
      Seq("n" -> (col("n") + col("id"))))
    assert(v == 3L && nDirs == 1, "only the overlapping dir rewrites")
    assert(rows(ManifestTable.read(spark, t)) ==
      Seq((1L, 10L), (5L, 10L), (11L, 21L), (13L, 23L), (15L, 10L)))
    // the first dir is PHYSICALLY the same files
    val after = ManifestTable.read(spark, t).inputFiles.toSet
    assert(after.intersect(before).size >= 1)
    // in-place: the rewritten dir preserves its row ORDER (15, 11, 13)
    val dir2 = ManifestTable.entriesOf(spark, t, v)
      .filter(e => e.statMax.get("id").contains(15L))
    assert(dir2.nonEmpty)
    val order = spark.read.parquet(s"$t/data/${dir2.head.dir}")
      .select("id").as[Long].collect().toSeq
    assert(order == Seq(15L, 11L, 13L), s"row order must survive: $order")
    // snapshot isolation: the pre-update version still reads old values
    assert(rows(ManifestTable.readVersion(spark, t, 2L))
      .forall(_._2 == 10L))
    // restat: the SET column's recorded bounds describe POST-update
    // values (21..23 live in dir2 now, not 10..10)
    assert(dir2.head.statMin.get("n").contains(10L) &&
      dir2.head.statMax.get("n").contains(23L),
      s"stale bounds would prune wrongly: ${dir2.head}")
    // null keys never match
    val t2 = s"${Files.createTempDirectory("graft-updrn")}/t"
    ManifestTable.append(spark,
      Seq((Some(1L), 10L), (None, 10L)).toDF("id", "n"), t2)
    ManifestTable.updateRange(spark, t2, "id", Long.MinValue,
      Long.MaxValue, Seq("n" -> lit(99L)))
    assert(ManifestTable.read(spark, t2).collect()
      .map(r => (Option(r.get(0)), r.getLong(1))).toSet ==
      Set((Some(1L), 99L), (None, 10L)))
  }

  test("updateKeys prunes by string bounds + Bloom; boundary checks are loud") {
    val t = s"${Files.createTempDirectory("graft-updk")}/t"
    // two lexicographically-disjoint dirs so the bounds CAN prune
    ManifestTable.append(spark,
      Seq(("a-1", 10L), ("b-2", 10L)).toDF("k", "n"), t,
      statsCols = Seq("k"), bloomCols = Seq("k"))
    ManifestTable.append(spark,
      Seq(("x-1", 10L), ("y-2", 10L)).toDF("k", "n"), t,
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    val (v, nDirs) = ManifestTable.updateKeys(spark, t, "k",
      Seq("x-1", null), Seq("n" -> lit(77L)))
    assert(nDirs == 1, "the a/b dir must prune on string bounds")
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      Seq(("a-1", 10L), ("b-2", 10L), ("x-1", 77L), ("y-2", 10L)))
    assert(ManifestTable.read(spark, t).inputFiles.toSet
      .intersect(before).nonEmpty)
    // all-null / empty key sets are no-ops (no new version)
    assert(ManifestTable.updateKeys(spark, t, "k", Seq(null),
      Seq("n" -> lit(0L)))._1 == v)
    // loud boundaries: unknown key column, unknown SET column, wrong
    // key type, SET type mismatch, duplicate SET
    def msg(f: => Any): String =
      intercept[Exception](f).getMessage
    assert(msg(ManifestTable.updateKeys(spark, t, "nope", Seq("x"),
      Seq("n" -> lit(0L)))).contains("no column 'nope'"))
    assert(msg(ManifestTable.updateKeys(spark, t, "n", Seq("x"),
      Seq("n" -> lit(0L)))).contains("string keys"))
    assert(msg(ManifestTable.updateKeys(spark, t, "k", Seq("x"),
      Seq("zz" -> lit(0L)))).contains("SET column 'zz'"))
    assert(msg(ManifestTable.updateKeys(spark, t, "k", Seq("x"),
      Seq("n" -> lit("s")))).contains("cast explicitly"))
    assert(msg(ManifestTable.updateKeys(spark, t, "k", Seq("x"),
      Seq("n" -> lit(1L), "n" -> lit(2L)))).contains("duplicate SET"))
    assert(msg(ManifestTable.updateRange(spark, t, "zz", 0L, 1L,
      Seq("n" -> lit(0L)))).contains("no column 'zz'"))
    assert(msg(ManifestTable.updateRange(spark, t, "k", 0L, 1L,
      Seq("n" -> lit(0L)))).contains("not an integral type"))
  }

  test("updateAll rewrites every dir once; widening SETs cast; constraints enforced") {
    val t = s"${Files.createTempDirectory("graft-upda")}/t"
    ManifestTable.append(spark, Seq((1L, 1L), (2L, 2L)).toDF("id", "n"),
      t, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq((3L, 3L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    // an INT-typed SET expression widens losslessly into the LONG col
    val (v, nDirs) = ManifestTable.updateAll(spark, t,
      Seq("n" -> (col("n").cast("int") + lit(1))))
    assert(nDirs == 2)
    assert(rows(ManifestTable.read(spark, t)) ==
      Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    // CHECK constraints reach the UPDATE path: a violating patch is
    // refused with the constraint named and NO version committed
    ManifestTable.addConstraint(spark, t, "n_small", "n < 100")
    val vc = ManifestTable.latestVersion(spark, t).get
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.updateAll(spark, t, Seq("n" -> (col("n") + 1000L)))
    }
    assert(ex.getMessage.contains("n_small"))
    assert(ManifestTable.latestVersion(spark, t).contains(vc))
    assert(rows(ManifestTable.read(spark, t)).map(_._2) ==
      Seq(2L, 3L, 4L))
  }

  test("update over pending deletion vectors never resurrects deleted rows") {
    val t = s"${Files.createTempDirectory("graft-upddv")}/t"
    ManifestTable.append(spark,
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "n"), t,
      statsCols = Seq("k"))
    ManifestTable.deleteKeys(spark, Seq("b").toDF("k"), t, "k")
    assert(new java.io.File(s"$t/deletes").exists,
      "precondition: a pending tombstone")
    ManifestTable.updateAll(spark, t, Seq("n" -> (col("n") * 10L)))
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      Seq(("a", 10L), ("c", 30L)),
      "the dv'd row must stay deleted and un-patched")
  }

  test("mergeUpdate: patch + insert lands partition-pure; source-key hygiene is loud") {
    val t = s"${Files.createTempDirectory("graft-mupd")}/t"
    ManifestTable.append(spark,
      Seq((1L, "en", 10L), (2L, "de", 10L)).toDF("id", "lang", "n"), t,
      statsCols = Seq("id"),
      partitionSpec = Seq(graft.sinks.PartitionTransform.PIdentity("lang")))
    val src = Seq((2L, "de", 222L), (9L, "fr", 9L)).toDF("id", "lang", "n")
    val (v, nDirs) = ManifestTable.mergeUpdate(spark, src, t, "id",
      Seq("n" -> col("_src_n")), insertNotMatched = true)
    assert(nDirs == 1, "only the dir holding id=2 rewrites")
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq((1L, "en", 10L), (2L, "de", 222L), (9L, "fr", 9L)))
    // the inserted batch landed PARTITION-PURE: every live entry still
    // records its lang partition value, so dropPartitions keeps working
    val entries = ManifestTable.entriesOf(spark, t, v)
    assert(entries.forall(_.partition.contains("lang")),
      s"merge insert eroded partition purity: $entries")
    ManifestTable.dropPartitions(spark, t, Map("lang" -> "fr"))
    assert(ManifestTable.read(spark, t).count() == 2)
    // loud hygiene: null and duplicate source keys, missing columns
    // under insertNotMatched, SET on the key
    def msg(f: => Any): String = intercept[Exception](f).getMessage
    assert(msg(ManifestTable.mergeUpdate(spark,
      Seq((Option.empty[Long], "x", 1L)).toDF("id", "lang", "n"), t,
      "id", Seq("n" -> col("_src_n")), insertNotMatched = false))
      .contains("null"))
    assert(msg(ManifestTable.mergeUpdate(spark,
      Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("id", "lang", "n"), t,
      "id", Seq("n" -> col("_src_n")), insertNotMatched = false))
      .contains("duplicate key"))
    assert(msg(ManifestTable.mergeUpdate(spark,
      Seq((1L, 5L)).toDF("id", "n"), t, "id",
      Seq("n" -> col("_src_n")), insertNotMatched = true))
      .contains("source columns"))
    assert(msg(ManifestTable.mergeUpdate(spark, src, t, "id",
      Seq("id" -> (col("_src_id") + 1L)), insertNotMatched = false))
      .contains("must not assign the merge key"))
    // a SET on the partition source is refused (cannot re-derive)
    assert(msg(ManifestTable.mergeUpdate(spark, src, t, "id",
      Seq("lang" -> lit("xx")), insertNotMatched = false))
      .contains("partition-source"))
  }

  test("updateRange with retries rebases over racing disjoint appends") {
    val t = s"${Files.createTempDirectory("graft-updrace")}/t"
    ManifestTable.append(spark,
      (0L to 9L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val upd = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = ManifestTable.updateRange(spark, t,
          "id", 3L, 5L, Seq("n" -> lit(1L)), retries = 4)._1
      })
      val appends = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = ManifestTable.append(spark,
            Seq((100L + i, 0L)).toDF("id", "n"), t,
            statsCols = Seq("id"), retries = 4)
        })
      }
      (upd +: appends)
        .foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      val got = rows(ManifestTable.read(spark, t))
      val want = ((0L to 9L).map(i => (i, if (i >= 3 && i <= 5) 1L
        else 0L)) ++ Seq((101L, 0L), (102L, 0L))).sorted
      assert(got == want)
    } finally pool.shutdown()
  }
}
