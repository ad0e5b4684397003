package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The manifest table's contract: atomic versioned commits, snapshot
  * isolation under later appends/compaction, crash-state invisibility,
  * and vacuum as the one explicit retention knob.
  */
class ManifestTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("append commits versioned snapshots; time travel reads each exactly") {
    val t = s"${Files.createTempDirectory("graft-manifest")}/t"
    assert(ManifestTable.latestVersion(spark, t).isEmpty)
    assert(ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t) == 1L)
    assert(ManifestTable.append(spark, Seq(3L).toDF("id"), t) == 2L)
    assert(ManifestTable.append(spark, Seq(4L, 5L).toDF("id"), t) == 3L)
    assert(ManifestTable.versions(spark, t) == Seq(1L, 2L, 3L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(ManifestTable.readVersion(spark, t, 1)) == Seq(1L, 2L))
    assert(ids(ManifestTable.readVersion(spark, t, 2)) == Seq(1L, 2L, 3L))
  }

  test("snapshot isolation: a resolved read is unaffected by later commits") {
    val t = s"${Files.createTempDirectory("graft-manifest2")}/t"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    val snapshot = ManifestTable.read(spark, t) // resolves v1's dirs NOW
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)
    ManifestTable.compact(spark, t)
    // the held frame still reads exactly v1 — data dirs are immutable
    // and compaction only ADDS a new dir + manifest
    assert(ids(snapshot) == Seq(1L, 2L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
  }

  test("crashed append is invisible: orphan data + manifest tmp never surface") {
    val t = s"${Files.createTempDirectory("graft-manifest3")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    // simulate a crash AFTER the data write, BEFORE the manifest
    // rename: an orphan c00000002 dir and a .tmp- manifest dir
    Seq(99L).toDF("id").write.parquet(s"$t/data/c00000002")
    Seq("c00000001", "c00000002").toDF("dir").repartition(1)
      .write.parquet(s"$t/manifest/.tmp-v00000002")
    // readers see only the committed snapshot
    assert(ManifestTable.latestVersion(spark, t).contains(1L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
    // the next append at that version REPLACES the orphan and commits
    assert(ManifestTable.append(spark, Seq(2L).toDF("id"), t) == 2L)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    assert(!new java.io.File(s"$t/manifest/.tmp-v00000002").exists())
  }

  test("compact is a metadata swap; vacuum is the explicit retention knob") {
    val t = s"${Files.createTempDirectory("graft-manifest4")}/t"
    (1 to 4).foreach(i => ManifestTable.append(spark, Seq(i.toLong).toDF("id"), t))
    val v = ManifestTable.compact(spark, t)
    assert(v == 5L)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
    // pre-compaction snapshots still read (their dirs survive)
    assert(ids(ManifestTable.readVersion(spark, t, 2)) == Seq(1L, 2L))
    // vacuum to the newest snapshot: the 4 original data dirs and the
    // 4 old manifests go; the compacted dir stays
    val (droppedManifests, droppedDirs) = ManifestTable.vacuum(spark, t, 1)
    assert(droppedManifests == 4 && droppedDirs == 4)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
    intercept[Exception] { ManifestTable.readVersion(spark, t, 2).collect() }
    // vacuum also reaps crashed-append orphans
    Seq(99L).toDF("id").write.parquet(s"$t/data/c00000099")
    assert(ManifestTable.vacuum(spark, t, 1) == ((0, 1)))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
  }

  test("manifest stats prune whole dirs; compaction folds stats and keeps the watermark") {
    val t = s"${Files.createTempDirectory("graft-manifest6")}/t"
    // three appends with disjoint id ranges, stats recorded
    ManifestTable.append(spark, Seq(1L, 5L).toDF("id"), t,
      tag = 0L, statsCol = Some("id"))
    ManifestTable.append(spark, Seq(10L, 15L).toDF("id"), t,
      tag = 1L, statsCol = Some("id"))
    ManifestTable.append(spark, Seq(20L, 25L).toDF("id"), t,
      tag = 2L, statsCol = Some("id"))
    assert(ManifestTable.latestTag(spark, t) == 2L)
    // a [10, 15] probe reads ONE dir — decided from the manifest,
    // before any data file is opened
    val pruned = ManifestTable.readPruned(spark, t, "id", 10L, 15L)
    assert(pruned.inputFiles.length ==
      spark.read.parquet(s"$t/data/c00000002").inputFiles.length)
    assert(ids(pruned.filter(col("id").between(10, 15))) == Seq(10L, 15L))
    // fully-disjoint probe: zero dirs, empty frame, schema intact
    val none = ManifestTable.readPruned(spark, t, "id", 100L, 200L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id"))
    // a probe on a column WITHOUT stats keeps everything (conservative)
    assert(ManifestTable.readPruned(spark, t, "other", 0L, 0L).count() == 6)
    // compaction folds stats (min of mins, max of maxes) and keeps
    // the exactly-once watermark
    ManifestTable.compact(spark, t)
    assert(ManifestTable.latestTag(spark, t) == 2L)
    val all = ManifestTable.readPruned(spark, t, "id", 1L, 1L)
    assert(ids(all.filter(col("id") === 1L)) == Seq(1L))
    assert(ManifestTable.readPruned(spark, t, "id", 100L, 200L).count() == 0)
  }

  test("deleteRange rewrites only overlapping dirs; untouched dirs keep their identity") {
    val t = s"${Files.createTempDirectory("graft-manifest7")}/t"
    ManifestTable.append(spark, Seq(1L, 5L).toDF("id"), t,
      tag = 0L, statsCol = Some("id"))
    ManifestTable.append(spark, Seq(10L, 15L).toDF("id"), t,
      tag = 1L, statsCol = Some("id"))
    ManifestTable.append(spark, Seq(20L, 25L).toDF("id"), t,
      tag = 2L, statsCol = Some("id"))
    // delete [12, 22]: middle dir rewritten (15 goes), last dir
    // rewritten (20 goes), first dir untouched
    val (v, rewritten) = ManifestTable.deleteRange(spark, t, "id", 12L, 22L)
    assert(v == 4L && rewritten == 2)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 5L, 10L, 25L))
    // dir identity: the untouched first dir's files are REUSED, not
    // copied (same physical files in both snapshots)
    val before = ManifestTable.readVersion(spark, t, 3).inputFiles.toSet
    val after = ManifestTable.read(spark, t).inputFiles.toSet
    assert((after -- before).forall(_.contains("c00000004_")),
      "only rewritten dirs may contribute new files")
    assert(after.exists(f => before.contains(f) && f.contains("c00000001")),
      "the non-overlapping dir must keep its original files")
    // deletion is a new version: the old snapshot still sees the rows
    assert(ids(ManifestTable.readVersion(spark, t, 3)) ==
      Seq(1L, 5L, 10L, 15L, 20L, 25L))
    // watermark survives; a delete covering a WHOLE dir drops its entry
    assert(ManifestTable.latestTag(spark, t) == 2L)
    val (v2, _) = ManifestTable.deleteRange(spark, t, "id", 0L, 9L)
    assert(ids(ManifestTable.read(spark, t)) == Seq(10L, 25L))
    assert(ManifestTable.readVersion(spark, t, v2).inputFiles
      .forall(!_.contains("c00000001/")),
      "the emptied dir must vanish from the manifest")
    // and pruning stays tight after the rewrite's re-statting
    assert(ManifestTable.readPruned(spark, t, "id", 0L, 9L).count() == 0)
  }

  test("readSince consumes each commit exactly once; maintenance resets identity") {
    val t = s"${Files.createTempDirectory("graft-manifest8")}/t"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)
    ManifestTable.append(spark, Seq(4L).toDF("id"), t)
    // an incremental consumer checkpointed at v1 gets v2+v3's rows,
    // at v2 gets v3's, at v3 gets nothing (schema intact)
    assert(ids(ManifestTable.readSince(spark, t, 1)) == Seq(3L, 4L))
    assert(ids(ManifestTable.readSince(spark, t, 2)) == Seq(4L))
    val empty = ManifestTable.readSince(spark, t, 3)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id"))
    // compaction rewrites dir identity: a stale checkpoint sees the
    // whole compacted table as "new" — the documented drain-before-
    // maintenance contract, visible rather than silently wrong
    ManifestTable.compact(spark, t)
    assert(ids(ManifestTable.readSince(spark, t, 2)) == Seq(1L, 2L, 3L, 4L))
    assert(ManifestTable.readSince(spark, t, 4).count() == 0)
    // bootstrap: sinceVersion <= 0 reads the whole table (a first-run
    // consumer checkpoints from here)
    assert(ids(ManifestTable.readSince(spark, t, 0)) ==
      Seq(1L, 2L, 3L, 4L))
    // a checkpoint vacuum dropped fails loudly, naming the contract —
    // not a raw file-not-found
    ManifestTable.vacuum(spark, t, 1)
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.readSince(spark, t, 2)
    }
    assert(ex.getMessage.contains("re-bootstrap"))
  }

  test("q128 plans against one of the four commit dirs; answer matches the plain scan") {
    val d = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.all
      .find(_.name == "q128_manifest_pruned_scan").get
    val df = q.run(spark, d)
    val dirs = df.inputFiles.map(_.split('/').dropRight(1).last).distinct
    assert(dirs.length == 1, s"expected one pruned dir, got ${dirs.toSeq}")
    val plain = Tables.documents(spark, d)
      .filter(col("doc_id").between(10, 60))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == plain && plain.nonEmpty)
  }

  test("randomized op sequences match an in-memory model (state-machine check)") {
    // the manifest is the repo's most state-machine-like component —
    // model-check it: apply a random append/compact/deleteRange/vacuum
    // sequence to the real table AND a trivial in-memory model, then
    // compare content, history, and watermark after every step
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { case0 =>
      val t = s"${Files.createTempDirectory(s"graft-mmodel$case0")}/t"
      var rows = Vector.empty[Long] // model: current content
      var history = Map.empty[Long, Vector[Long]] // retained snapshots
      var nextId = 0L
      var lastTag = -1L
      (0 until 12).foreach { step =>
        rnd.nextInt(10) match {
          case k if k <= 5 || rows.isEmpty => // append 1-3 rows
            val batch = Seq.fill(rnd.nextInt(3) + 1)( { nextId += 1; nextId } )
            val v = ManifestTable.append(spark, batch.toDF("id"), t,
              tag = step.toLong, statsCol = Some("id"))
            rows = rows ++ batch; history += v -> rows; lastTag = step.toLong
          case 6 | 7 => // deleteRange over a random interval
            val lo = rnd.nextLong(nextId + 2)
            val hi = lo + rnd.nextLong(nextId + 2)
            val (v, _) = ManifestTable.deleteRange(spark, t, "id", lo, hi)
            rows = rows.filterNot(id => id >= lo && id <= hi)
            history += v -> rows
            // an emptied table genuinely resets the watermark; any
            // survivor must carry it forward (the replay-safety pin)
            if (rows.isEmpty) lastTag = -1L
          case 8 => // compact: content-neutral new version
            val v = ManifestTable.compact(spark, t)
            history += v -> rows
          case _ => // vacuum to the last 2 versions
            ManifestTable.vacuum(spark, t, 2)
            val keep = history.keys.toSeq.sorted.takeRight(2).toSet
            history = history.filter { case (v, _) => keep.contains(v) }
        }
        if (rows.nonEmpty)
          assert(ids(ManifestTable.read(spark, t)) == rows.sorted,
            s"case $case0 step $step: content diverged")
        assert(ManifestTable.latestTag(spark, t) == lastTag,
          s"case $case0 step $step: watermark diverged")
      }
      // every retained snapshot is time-travelable to its exact content
      history.filter(_._2.nonEmpty).foreach { case (v, want) =>
        assert(ids(ManifestTable.readVersion(spark, t, v)) == want.sorted,
          s"case $case0 version $v")
      }
      assert(ManifestTable.versions(spark, t).toSet == history.keySet)
    }
  }

  test("manifest scan planning never lists the data root") {
    // the point of the manifest at scale: the reader consults ONE
    // small file list; a foreign (never-referenced) directory under
    // data/ is simply invisible — a plain recursive read would have
    // picked it up
    val t = s"${Files.createTempDirectory("graft-manifest5")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    Seq(42L).toDF("id").write.parquet(s"$t/data/not-a-commit")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
  }
}
