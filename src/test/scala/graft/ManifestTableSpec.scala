package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The manifest table's contract: atomic versioned commits, snapshot
  * isolation under later appends/compaction, crash-state invisibility,
  * bounded damage under a violated single-writer contract, provenance-
  * aware incremental reads, and vacuum as the one explicit retention
  * knob.
  */
class ManifestTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  /** Data-dir names of version `v`'s entries. */
  private def dirNames(t: String, v: Long): Seq[String] =
    ManifestTable.entriesOf(spark, t, v).map(_.dir)

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
    // rename: an orphan attempt dir and a .tmp- manifest dir
    Seq(99L).toDF("id").write.parquet(s"$t/data/c00000002_deadbeef")
    Seq("x").toDF("dir").repartition(1)
      .write.parquet(s"$t/manifest/.tmp-v00000002")
    // readers see only the committed snapshot
    assert(ManifestTable.latestVersion(spark, t).contains(1L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
    // the next append commits under its OWN attempt dir — it never
    // touches the orphan (that isolation is what bounds concurrent-
    // writer damage). The SAME-version tmp debris is deliberately left
    // alone at commit time (it could be a RACING attempt's staging —
    // deleting it would let two writers interleave files in each
    // other's tmp and publish a torn manifest)...
    assert(ManifestTable.append(spark, Seq(2L).toDF("id"), t) == 2L)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    assert(new java.io.File(s"$t/manifest/.tmp-v00000002").exists())
    assert(new java.io.File(s"$t/data/c00000002_deadbeef").exists())
    // ...and is reaped by the NEXT commit, whose version is strictly
    // above the debris's (that version committed, so no live attempt
    // can still be staging it)
    assert(ManifestTable.append(spark, Seq(3L).toDF("id"), t) == 3L)
    assert(!new java.io.File(s"$t/manifest/.tmp-v00000002").exists())
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    // vacuum reaps the orphan; committed dirs stay
    val (_, reaped) = ManifestTable.vacuum(spark, t, 10)
    assert(reaped == 1)
    assert(!new java.io.File(s"$t/data/c00000002_deadbeef").exists())
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
  }

  test("a racing second writer fails loudly; the winner's snapshot is untouched") {
    val t = s"${Files.createTempDirectory("graft-manifestrace")}/t"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    // writers A and B both observe latest = v1 and target v2. A wins
    // with a normal append; B — still believing v2 is free — has
    // already written its own (unique) attempt dir and now tries to
    // publish the manifest. Unique attempt dirs mean B never wrote
    // into A's directory; rename-if-absent means B's commit fails
    // LOUDLY instead of clobbering A's.
    ManifestTable.append(spark, Seq(3L).toDF("id"), t) // A commits v2
    val winnerFiles = ManifestTable.read(spark, t).inputFiles.toSet
    Seq(99L).toDF("id").write.parquet(s"$t/data/c00000002_loser001")
    val ex = intercept[RuntimeException] {
      ManifestTable.commit(spark, t, 2L,
        dirNames(t, 1L).map(d =>
          ManifestTable.Entry(d, -1L, Map.empty, Map.empty, Nil)) :+
          ManifestTable.Entry("c00000002_loser001", -1L,
            Map.empty, Map.empty, Nil),
        new org.apache.spark.sql.types.StructType().add("id", "long"),
        -1L)
    }
    assert(ex.getMessage.contains("single-writer"))
    // the winner's snapshot is byte-identical (same files, same rows)
    assert(ManifestTable.read(spark, t).inputFiles.toSet == winnerFiles)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    // the loser's dir is an orphan vacuum reaps
    val (_, reaped) = ManifestTable.vacuum(spark, t, 10)
    assert(reaped == 1)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
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
    Seq(99L).toDF("id").write.parquet(s"$t/data/c00000099_0badf00d")
    assert(ManifestTable.vacuum(spark, t, 1) == ((0, 1)))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
  }

  test("manifest stats prune whole dirs; compaction folds stats and keeps the watermark") {
    val t = s"${Files.createTempDirectory("graft-manifest6")}/t"
    // three appends with disjoint id ranges, stats recorded
    ManifestTable.append(spark, Seq(1L, 5L).toDF("id"), t,
      tag = 0L, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(10L, 15L).toDF("id"), t,
      tag = 1L, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(20L, 25L).toDF("id"), t,
      tag = 2L, statsCols = Seq("id"))
    assert(ManifestTable.latestTag(spark, t) == 2L)
    // a [10, 15] probe reads ONE dir — decided from the manifest,
    // before any data file is opened
    val pruned = ManifestTable.readPruned(spark, t, "id", 10L, 15L)
    val secondDir = dirNames(t, 2L).filterNot(dirNames(t, 1L).contains).head
    assert(pruned.inputFiles.length ==
      spark.read.parquet(s"$t/data/$secondDir").inputFiles.length)
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

  test("multi-column stats: each recorded column prunes independently") {
    val t = s"${Files.createTempDirectory("graft-manifestmc")}/t"
    // two stats columns with DIFFERENT orderings: id ascending across
    // commits, ts descending — so each column prunes a different dir
    ManifestTable.append(spark,
      Seq((1L, 900L), (5L, 950L)).toDF("id", "ts"), t,
      statsCols = Seq("id", "ts"))
    ManifestTable.append(spark,
      Seq((10L, 500L), (15L, 550L)).toDF("id", "ts"), t,
      statsCols = Seq("id", "ts"))
    ManifestTable.append(spark,
      Seq((20L, 100L), (25L, 150L)).toDF("id", "ts"), t,
      statsCols = Seq("id", "ts"))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    // an id probe prunes to the middle commit
    assert(nDirs(ManifestTable.readPruned(spark, t, "id", 10L, 15L)) == 1)
    // a ts probe on the SAME table prunes to the last commit
    val byTs = ManifestTable.readPruned(spark, t, "ts", 0L, 200L)
    assert(nDirs(byTs) == 1)
    assert(ids(byTs) == Seq(20L, 25L))
    // conjunctive predicates intersect: id says dir 2, ts says dir 3
    // -> no dir can match both
    assert(ManifestTable.readPruned(spark, t,
      Seq(("id", 10L, 15L), ("ts", 0L, 200L))).count() == 0)
    // deleteRange re-stats BOTH recorded columns on the rewritten dir
    ManifestTable.deleteRange(spark, t, "id", 15L, 15L)
    val afterTs = ManifestTable.readPruned(spark, t, "ts", 400L, 600L)
    assert(nDirs(afterTs) == 1 && ids(afterTs) == Seq(10L))
  }

  test("string stats prune categorically; non-ASCII bounds never prune") {
    val t = s"${Files.createTempDirectory("graft-manifeststr")}/t"
    ManifestTable.append(spark,
      Seq((1L, "de"), (2L, "de")).toDF("id", "lang"), t,
      statsCols = Seq("lang", "id"))
    ManifestTable.append(spark,
      Seq((3L, "en"), (4L, "es")).toDF("id", "lang"), t,
      statsCols = Seq("lang", "id"))
    ManifestTable.append(spark,
      Seq((5L, "zh")).toDF("id", "lang"), t,
      statsCols = Seq("lang", "id"))
    ManifestTable.append(spark,
      Seq((6L, "中文")).toDF("id", "lang"), t,
      statsCols = Seq("lang", "id"))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    // an equality probe keeps its one matching dir PLUS the dir whose
    // bounds are non-ASCII (not comparable -> never prunable); the
    // row filter still applies on top
    val de = ManifestTable.readPrunedStr(spark, t, "lang", "de", "de")
    assert(nDirs(de) == 2)
    assert(ids(de.filter(col("lang") === "de")) == Seq(1L, 2L))
    // a range probe spans the overlapping dirs (+ the unprunable one)
    assert(nDirs(ManifestTable.readPrunedStr(spark, t, "lang",
      "en", "es")) == 2)
    // a fully-disjoint probe keeps ONLY the unprunable dir — the
    // three ASCII-bounded dirs all pruned, the non-ASCII one cannot be
    val none = ManifestTable.readPrunedStr(spark, t, "lang", "aa", "ab")
    assert(nDirs(none) == 1 && ids(none) == Seq(6L))
    // long and string stats coexist on one table: id pruning works too
    assert(nDirs(ManifestTable.readPruned(spark, t, "id", 3L, 4L)) == 1)
    // compaction folds ASCII string bounds; the non-ASCII entry blocks
    // the fold (conservative: everything kept afterwards)
    ManifestTable.compact(spark, t)
    assert(ManifestTable.readPrunedStr(spark, t, "lang", "de", "de")
      .count() == 6)
  }

  test("deleteRange rewrites only overlapping dirs; untouched dirs keep their identity") {
    val t = s"${Files.createTempDirectory("graft-manifest7")}/t"
    ManifestTable.append(spark, Seq(1L, 5L).toDF("id"), t,
      tag = 0L, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(10L, 15L).toDF("id"), t,
      tag = 1L, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(20L, 25L).toDF("id"), t,
      tag = 2L, statsCols = Seq("id"))
    val firstDir = dirNames(t, 1L).head
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
    assert(after.exists(f => before.contains(f) && f.contains(firstDir)),
      "the non-overlapping dir must keep its original files")
    // deletion is a new version: the old snapshot still sees the rows
    assert(ids(ManifestTable.readVersion(spark, t, 3)) ==
      Seq(1L, 5L, 10L, 15L, 20L, 25L))
    // the watermark is table-level metadata: it survives any delete
    assert(ManifestTable.latestTag(spark, t) == 2L)
    val (v2, _) = ManifestTable.deleteRange(spark, t, "id", 0L, 9L)
    assert(ids(ManifestTable.read(spark, t)) == Seq(10L, 25L))
    assert(ManifestTable.readVersion(spark, t, v2).inputFiles
      .forall(!_.contains(firstDir)),
      "the emptied dir must vanish from the manifest")
    // ... including a delete that empties a dir carrying the max tag
    assert(ManifestTable.latestTag(spark, t) == 2L)
    // and pruning stays tight after the rewrite's re-statting
    assert(ManifestTable.readPruned(spark, t, "id", 0L, 9L).count() == 0)
  }

  test("an emptied table reads as an empty frame, keeps its schema and watermark") {
    val t = s"${Files.createTempDirectory("graft-manifestempty")}/t"
    ManifestTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      t, tag = 7L, statsCols = Seq("id"))
    ManifestTable.deleteRange(spark, t, "id", 0L, 100L)
    // every read path returns zero rows with the PERSISTED schema —
    // no schema-inference crash on a legitimately empty snapshot
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 0 && r.columns.toSeq == Seq("id", "s"))
    assert(ManifestTable.readPruned(spark, t, "id", 0L, 9L).count() == 0)
    assert(ManifestTable.readSince(spark, t, 1L).count() == 0)
    // the watermark survives emptying: batch 7's replay stays skipped
    // (the delete was deliberate; re-ingesting would undo it)
    assert(ManifestTable.latestTag(spark, t) == 7L)
    // compact on a table with no readable data is a no-op
    val prev = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.compact(spark, t) == prev)
    // and appending into the emptied table works normally
    ManifestTable.append(spark, Seq((3L, "c")).toDF("id", "s"), t)
    assert(ManifestTable.read(spark, t).count() == 1)
  }

  test("readSince consumes each commit exactly once; provenance sees through maintenance") {
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
    // compaction records provenance: a DRAINED consumer (checkpoint
    // v3) sees the pure rewrite as nothing-new instead of a spurious
    // whole-table re-read...
    ManifestTable.compact(spark, t)
    assert(ManifestTable.readSince(spark, t, 3).count() == 0)
    // ...and a fresh append after the compact is delivered alone
    ManifestTable.append(spark, Seq(5L).toDF("id"), t)
    assert(ids(ManifestTable.readSince(spark, t, 3)) == Seq(5L))
    assert(ids(ManifestTable.readSince(spark, t, 4)) == Seq(5L))
    // a consumer whose checkpoint (v2) predates rows the compact
    // folded in (v3's) CANNOT be served by metadata — the fold mixed
    // consumed and unconsumed lineage; that fails loudly, naming the
    // drain-before-maintenance contract
    val mixed = intercept[RuntimeException] {
      ManifestTable.readSince(spark, t, 2)
    }
    assert(mixed.getMessage.contains("drain"))
    // bootstrap: sinceVersion <= 0 reads the whole table (a first-run
    // consumer checkpoints from here)
    assert(ids(ManifestTable.readSince(spark, t, 0)) ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // a checkpoint vacuum dropped fails loudly, naming the contract —
    // not a raw file-not-found
    ManifestTable.vacuum(spark, t, 1)
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.readSince(spark, t, 2)
    }
    assert(ex.getMessage.contains("re-bootstrap"))
  }

  test("readSince sees through deleteRange of already-consumed dirs") {
    val t = s"${Files.createTempDirectory("graft-manifest9")}/t"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t,
      statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(10L, 11L).toDF("id"), t,
      statsCols = Seq("id"))
    // consumer drains to v2, then a retention delete rewrites dir 1
    ManifestTable.deleteRange(spark, t, "id", 2L, 2L)
    // the rewrite's provenance is a consumed dir -> nothing new
    assert(ManifestTable.readSince(spark, t, 2).count() == 0)
    // an append after the delete is delivered exactly once
    ManifestTable.append(spark, Seq(20L).toDF("id"), t)
    assert(ids(ManifestTable.readSince(spark, t, 2)) == Seq(20L))
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
      var lastVersion = 0L
      (0 until 12).foreach { step =>
        rnd.nextInt(10) match {
          case k if k <= 5 || rows.isEmpty => // append 1-3 rows
            val batch = Seq.fill(rnd.nextInt(3) + 1)( { nextId += 1; nextId } )
            val v = ManifestTable.append(spark, batch.toDF("id"), t,
              tag = step.toLong, statsCols = Seq("id"))
            rows = rows ++ batch; history += v -> rows
            lastTag = step.toLong; lastVersion = v
          case 6 | 7 => // deleteRange over a random interval
            val lo = rnd.nextLong(nextId + 2)
            val hi = lo + rnd.nextLong(nextId + 2)
            val (v, _) = ManifestTable.deleteRange(spark, t, "id", lo, hi)
            rows = rows.filterNot(id => id >= lo && id <= hi)
            history += v -> rows; lastVersion = v
            // the watermark is table-level and MONOTONE: emptying the
            // table must not forget which batches were applied (a
            // replayed batch after a deliberate delete stays skipped)
          case 8 => // compact: content-neutral new version
            val v = ManifestTable.compact(spark, t)
            history += v -> rows; lastVersion = v
          case _ => // vacuum to the last 2 versions
            ManifestTable.vacuum(spark, t, 2)
            val keep = history.keys.toSeq.sorted.takeRight(2).toSet
            history = history.filter { case (v, _) => keep.contains(v) }
        }
        assert(ids(ManifestTable.read(spark, t)) == rows.sorted,
          s"case $case0 step $step: content diverged")
        assert(ManifestTable.latestTag(spark, t) == lastTag,
          s"case $case0 step $step: watermark diverged")
      }
      // every retained snapshot is time-travelable to its exact
      // content — INCLUDING empty ones (persisted-schema read)
      history.foreach { case (v, want) =>
        assert(ids(ManifestTable.readVersion(spark, t, v)) == want.sorted,
          s"case $case0 version $v")
      }
      assert(ManifestTable.versions(spark, t).toSet == history.keySet)
    }
  }

  test("schema is enforced at append; evolution is explicit and additive") {
    val t = s"${Files.createTempDirectory("graft-manifestschema")}/t"
    ManifestTable.append(spark, Seq((1L, "a")).toDF("id", "s"), t)
    // a type change is never evolution
    val ex1 = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, Seq((2L, 9L)).toDF("id", "s"), t)
    }
    assert(ex1.getMessage.contains("type changes are not evolution"))
    // a surprise column is rejected by default (a typo'd batch must
    // not silently fork the table)...
    val ex2 = intercept[RuntimeException] {
      ManifestTable.append(spark,
        Seq((2L, "b", 0.5)).toDF("id", "s", "q"), t)
    }
    assert(ex2.getMessage.contains("evolveSchema"))
    // ...and admitted under explicit additive evolution
    ManifestTable.append(spark,
      Seq((2L, "b", 0.5)).toDF("id", "s", "q"), t, evolveSchema = true)
    // pre-evolution rows surface the new column as null
    val now = ManifestTable.read(spark, t)
    assert(now.columns.toSeq == Seq("id", "s", "q"))
    assert(now.filter(col("id") === 1L).select("q").head().isNullAt(0))
    // time travel keeps the schema AS OF the snapshot
    assert(ManifestTable.readVersion(spark, t, 1).columns.toSeq ==
      Seq("id", "s"))
    // a batch may OMIT columns (micro-batch tolerance): reads back null
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)
    val r3 = ManifestTable.read(spark, t).filter(col("id") === 3L).head()
    assert(r3.isNullAt(1) && r3.isNullAt(2))
    // compaction normalizes pre-evolution dirs under the table schema
    ManifestTable.compact(spark, t)
    assert(ManifestTable.read(spark, t).columns.toSeq ==
      Seq("id", "s", "q"))
    assert(ManifestTable.read(spark, t).count() == 3)
  }

  test("widening batches cast at the write boundary; narrowing stays loud") {
    val t = s"${Files.createTempDirectory("graft-manifestwiden")}/t"
    ManifestTable.append(spark,
      Seq((1L, 0.5d)).toDF("id", "w"), t, statsCols = Seq("id"))
    // an INT id / FLOAT w batch widens into the long/double table —
    // cast before write, so the files carry the table's types and
    // the persisted-schema read needs no reader-side conversion
    ManifestTable.append(spark,
      Seq((2, 0.25f)).toDF("id", "w"), t, statsCols = Seq("id"))
    val got = ManifestTable.read(spark, t)
    assert(got.schema("id").dataType.catalogString == "bigint" &&
      got.schema("w").dataType.catalogString == "double")
    assert(ids(got) == Seq(1L, 2L))
    // the widened batch's stats recorded under the table type
    val e2 = ManifestTable.entriesOf(spark, t, 2L)
      .find(_.statMin.get("id").contains(2L))
    assert(e2.isDefined)
    // merge widens its batch the same way
    ManifestTable.merge(spark,
      Seq((2, 0.75f), (3, 1.5f)).toDF("id", "w"), t, "id")
    assert(ManifestTable.read(spark, t)
      .filter(col("id") === 2L).select("w").head().getDouble(0) == 0.75)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    // narrowing (long into an int table) is NOT widening: loud
    val tn = s"${Files.createTempDirectory("graft-manifestnarrow")}/t"
    ManifestTable.append(spark, Seq(1).toDF("id"), tn) // int table
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, Seq(2L).toDF("id"), tn)
    }
    assert(ex.getMessage.contains("type changes are not evolution"))
  }

  test("the data source writes: append, overwrite, and mode semantics") {
    val t = s"${Files.createTempDirectory("graft-manifestwrite")}/t"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write
      .format("graft-manifest").option("statsCols", "id")
      .option("tag", "0").mode("append").save(t)
    Seq((3L, 30L)).toDF("id", "v").write
      .format("graft-manifest").option("statsCols", "id")
      .option("tag", "1").mode("append").save(t)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    assert(ManifestTable.latestTag(spark, t) == 1L)
    // the recorded stats drive the read-side pruning as usual
    assert(ManifestTable.readPruned(spark, t, "id", 3L, 9L)
      .inputFiles.length < ManifestTable.read(spark, t)
      .inputFiles.length)
    // ignore: a committed table wins
    Seq((9L, 90L)).toDF("id", "v").write.format("graft-manifest")
      .mode("ignore").save(t)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    // errorIfExists is loud
    val ex = intercept[RuntimeException] {
      Seq((9L, 90L)).toDF("id", "v").write.format("graft-manifest")
        .mode("errorifexists").save(t)
    }
    assert(ex.getMessage.contains("already exists"))
    // overwrite replaces content atomically; old snapshots survive
    // until vacuum and the watermark stays monotone
    Seq((7L, 70L)).toDF("id", "v").write.format("graft-manifest")
      .mode("overwrite").save(t)
    assert(ids(ManifestTable.read(spark, t)) == Seq(7L))
    assert(ids(ManifestTable.readVersion(spark, t, 2)) ==
      Seq(1L, 2L, 3L))
    assert(ManifestTable.latestTag(spark, t) == 1L)
    // round-trip through the read half of the same format
    assert(spark.read.format("graft-manifest").load(t)
      .select("v").as[Long].collect().toSeq == Seq(70L))
  }

  test("merge replaces by key copy-on-write; untouched dirs keep identity") {
    val t = s"${Files.createTempDirectory("graft-manifestmerge")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, statsCols = Seq("id"))
    ManifestTable.append(spark,
      Seq((10L, "c"), (11L, "d")).toDF("id", "s"), t, statsCols = Seq("id"))
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    // update key 2, insert key 20: only the first dir's range overlaps
    val (v, rewritten) = ManifestTable.merge(spark,
      Seq((2L, "B!"), (20L, "e")).toDF("id", "s"), t, "id")
    assert(v == 3L && rewritten == 1)
    val now = ManifestTable.read(spark, t)
    assert(now.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .toSeq == Seq((1L, "a"), (2L, "B!"), (10L, "c"), (11L, "d"),
        (20L, "e")))
    // the non-overlapping dir kept its physical files
    assert(now.inputFiles.toSet.intersect(before).nonEmpty)
    // old snapshots still see the pre-merge rows (merge is a version)
    assert(ManifestTable.readVersion(spark, t, 2)
      .filter(col("id") === 2L).select("s").head().getString(0) == "b")
    // provenance: a consumer drained to v2 sees the merge's net effect
    // (the rewrite of consumed data is invisible; the batch dir is new)
    assert(ManifestTable.readSince(spark, t, 2)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 20L))
    // duplicate update keys have no defined winner: loud
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark,
        Seq((5L, "x"), (5L, "y")).toDF("id", "s"), t, "id")
    }
    assert(ex.getMessage.contains("duplicate key"))
    // partial-column updates would null the rest: loud
    val ex2 = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, Seq(7L).toDF("id"), t, "id")
    }
    assert(ex2.getMessage.contains("replaced whole"))
  }

  test("string-keyed merge: bounds prune, untouched dirs keep identity") {
    val t = s"${Files.createTempDirectory("graft-manifestmergestr")}/t"
    // two string-RANGE commits (the reference's upsert key is a
    // string cveId) — the second dir's key range is disjoint from
    // the batch's envelope and must survive physically untouched
    ManifestTable.append(spark,
      Seq(("a-1", "x"), ("a-2", "y")).toDF("key", "s"), t,
      statsCols = Seq("key"))
    ManifestTable.append(spark,
      Seq(("m-1", "c"), ("m-2", "d")).toDF("key", "s"), t,
      statsCols = Seq("key"))
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    val (v, rewritten) = ManifestTable.merge(spark,
      Seq(("a-2", "Y!"), ("z-9", "new")).toDF("key", "s"), t, "key")
    assert(v == 3L && rewritten == 1, s"v=$v rewritten=$rewritten")
    val now = ManifestTable.read(spark, t)
    assert(now.collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq == Seq(("a-1", "x"), ("a-2", "Y!"), ("m-1", "c"),
        ("m-2", "d"), ("z-9", "new")))
    // the non-overlapping dir kept its physical files
    assert(now.inputFiles.toSet.intersect(before).nonEmpty)
    // old snapshots still see the pre-merge rows
    assert(ManifestTable.readVersion(spark, t, 2)
      .filter(col("key") === "a-2").select("s").head()
      .getString(0) == "y")
    // a non-integral, non-string key type stays loud
    val td = s"${Files.createTempDirectory("graft-manifestmergedbl")}/t"
    ManifestTable.append(spark,
      Seq((1.5, "a")).toDF("k", "s"), td)
    val ex = intercept[RuntimeException](ManifestTable.merge(spark,
      Seq((1.5, "b")).toDF("k", "s"), td, "k"))
    assert(ex.getMessage.contains("integral and string"))
  }

  test("string-keyed merge on interleaved dirs: Bloom filters narrow the rewrite") {
    val t = s"${Files.createTempDirectory("graft-manifestmergestrbl")}/t"
    // both dirs' string BOUNDS span the same domain (interleaved), so
    // range probes clear nothing — only the per-dir string Bloom can
    // prove dir 1 holds no batch key
    ManifestTable.append(spark,
      Seq(("k-0", "a"), ("k-2", "b"), ("k-9", "c")).toDF("key", "s"),
      t, statsCols = Seq("key"), bloomCols = Seq("key"))
    ManifestTable.append(spark,
      Seq(("k-1", "d"), ("k-3", "e"), ("k-8", "f")).toDF("key", "s"),
      t, statsCols = Seq("key"), bloomCols = Seq("key"))
    val (_, rewritten) = ManifestTable.merge(spark,
      Seq(("k-3", "E!")).toDF("key", "s"), t, "key",
      bloomCols = Seq("key"))
    assert(rewritten == 1,
      s"bloom narrowing rewrote $rewritten dirs, expected 1")
    assert(ManifestTable.read(spark, t)
      .filter(col("key") === "k-3").select("s").head()
      .getString(0) == "E!")
    assert(ManifestTable.read(spark, t).count() == 6L)
  }

  test("merge's rewrite job count is independent of touched dirs; emptied dirs vanish") {
    // the old per-dir loop paid one read+anti-join+write JOB per
    // touched dir, serialized in the driver; the staged single-pass
    // rewrite pays a constant number of jobs (AQE stages + the range
    // sampling + the broadcast make 'one query' several listener-level
    // jobs, so the honest pin is k-INdependence, not a literal 1)
    def mkTable(): String = {
      val t = s"${Files.createTempDirectory("graft-manifestmerge1j")}/t"
      ManifestTable.append(spark,
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, statsCols = Seq("id"))
      ManifestTable.append(spark,
        Seq((10L, "c"), (11L, "d")).toDF("id", "s"), t, statsCols = Seq("id"))
      ManifestTable.append(spark,
        Seq((20L, "e")).toDF("id", "s"), t, statsCols = Seq("id"))
      t
    }
    val rewriteJobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null && "graft-merge-rewrite" ==
            j.properties.getProperty("spark.job.description"))
          rewriteJobs.incrementAndGet()
    }
    def countJobs(body: => Unit): Int = {
      rewriteJobs.set(0)
      body
      // listener events are async: wait for at least one, then a
      // grace period so any extra job events land too
      val deadline = System.currentTimeMillis + 5000
      while (System.currentTimeMillis < deadline && rewriteJobs.get() < 1)
        Thread.sleep(50)
      Thread.sleep(300)
      rewriteJobs.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // merge A touches ONE dir...
      val tA = mkTable()
      val jobsA = countJobs {
        val (_, rw) = ManifestTable.merge(spark,
          Seq((2L, "B!")).toDF("id", "s"), tA, "id")
        assert(rw == 1)
      }
      // ...merge B touches ALL THREE (dir 3 fully replaced)
      val tB = mkTable()
      val jobsB = countJobs {
        val (v, rw) = ManifestTable.merge(spark,
          Seq((2L, "B!"), (11L, "D!"), (20L, "E!")).toDF("id", "s"),
          tB, "id")
        assert(v == 4L && rw == 3)
      }
      assert(jobsA > 0 && jobsB == jobsA,
        s"rewrite jobs must not scale with touched dirs: " +
          s"1 dir -> $jobsA job(s), 3 dirs -> $jobsB")
      val now = ManifestTable.read(spark, tB)
      assert(now.collect().map(r => (r.getLong(0), r.getString(1)))
        .sorted.toSeq == Seq((1L, "a"), (2L, "B!"), (10L, "c"),
          (11L, "D!"), (20L, "E!")))
      // the fully-replaced dir (only row 20, whose key was updated)
      // contributes no rewritten entry
      val entries = ManifestTable.entriesOf(spark, tB,
        ManifestTable.latestVersion(spark, tB).get)
      assert(entries.count(_.sources.nonEmpty) == 2,
        s"the emptied dir must drop out, got " +
          s"${entries.map(e => e.dir -> e.sources)}")
      // per-entry stats survived the single-pass rewrite
      assert(entries.filter(_.sources.nonEmpty)
        .forall(_.statMin.contains("id")))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom stats prune point lookups on interleaved keys; never a false negative") {
    val t = s"${Files.createTempDirectory("graft-manifestbloom")}/t"
    // interleaved commits: every dir's [min, max] spans the domain,
    // so range stats prune nothing — the bloom is the only prune
    (0 until 4).foreach(i => ManifestTable.append(spark,
      (0L until 40L).filter(_ % 4 == i).toDF("id"), t,
      statsCols = Seq("id"), bloomCols = Seq("id")))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    // range stats alone keep all four dirs for a point probe...
    assert(ManifestTable.entriesOf(spark, t, 4L)
      .forall(_.mightOverlap("id", 7L, 7L)))
    // ...the bloom prunes to (almost certainly) one; correctness only
    // needs a strict subset + the right rows
    val p7 = ManifestTable.readPruned(spark, t, "id", 7L, 7L)
    assert(nDirs(p7) < 4)
    assert(ids(p7.filter(col("id") === 7L)) == Seq(7L))
    // NO false negatives: every present key must be found
    (0L until 40L).foreach { k =>
      assert(ids(ManifestTable.readPruned(spark, t, "id", k, k)
        .filter(col("id") === k)) == Seq(k), s"key $k lost")
    }
    // point-SET read (IN): strictly tighter than the values' envelope
    val in = ManifestTable.readPrunedIn(spark, t, "id", Seq(3L, 39L))
    assert(nDirs(in) < 4)
    assert(ids(in.filter(col("id").isin(3L, 39L))) == Seq(3L, 39L))
    // an absent key may read zero dirs — and must return zero rows
    assert(ManifestTable.readPruned(spark, t, "id", 1000L, 1000L)
      .filter(col("id") === 1000L).count() == 0)
    // deleteRange rewrites REBUILD the filter: the deleted key stops
    // matching, every surviving key is still found
    ManifestTable.deleteRange(spark, t, "id", 7L, 7L)
    assert(ManifestTable.readPruned(spark, t, "id", 7L, 7L)
      .filter(col("id") === 7L).count() == 0)
    (0L until 40L).filter(_ != 7L).foreach { k =>
      assert(ids(ManifestTable.readPruned(spark, t, "id", k, k)
        .filter(col("id") === k)) == Seq(k), s"post-delete key $k lost")
    }
  }

  test("staging column names are reserved: merge and cluster refuse them loudly") {
    // a real column named _graft_src would be overwritten by the
    // rewrite tag and stripped by partitionBy — silent nulls in every
    // rewritten dir; same for cluster's _graft_bucket
    val t = s"${Files.createTempDirectory("graft-manifestresv")}/t"
    ManifestTable.append(spark,
      Seq((1L, "x")).toDF("id", "_graft_src"), t, statsCols = Seq("id"))
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark,
        Seq((1L, "y")).toDF("id", "_graft_src"), t, "id")
    }
    assert(ex.getMessage.contains("reserved"))
    val t2 = s"${Files.createTempDirectory("graft-manifestresv2")}/t"
    ManifestTable.append(spark,
      Seq((1L, "x")).toDF("id", "_graft_bucket"), t2)
    val ex2 = intercept[IllegalArgumentException] {
      ManifestTable.cluster(spark, t2, "id", 2)
    }
    assert(ex2.getMessage.contains("reserved"))
  }

  test("string blooms prune string point lookups; never a false negative") {
    val t = s"${Files.createTempDirectory("graft-manifeststrbloom")}/t"
    // interleaved string keys: bounds span the domain, blooms prune
    (0 until 4).foreach(i => ManifestTable.append(spark,
      (0L until 40L).filter(_ % 4 == i)
        .map(k => (s"k-$k", k)).toDF("key", "id"), t,
      statsCols = Seq("key"), bloomCols = Seq("key", "id")))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    val v = ManifestTable.latestVersion(spark, t).get
    val entries = ManifestTable.entriesOf(spark, t, v)
    // the string key records a STRING filter, the integral key an
    // integral one — disjoint maps, never cross-probed
    assert(entries.forall(e => e.strBloom.contains("key") &&
      e.bloom.contains("id") && !e.bloom.contains("key") &&
      !e.strBloom.contains("id")))
    // a point probe prunes below the full dir count, rows correct
    val p = ManifestTable.readPrunedStr(spark, t, "key", "k-7", "k-7")
    assert(nDirs(p) < 4)
    assert(p.filter(col("key") === "k-7").count() == 1)
    // NO false negatives: every present key must be found
    (0L until 40L).foreach { k =>
      assert(ManifestTable.readPrunedStr(spark, t, "key", s"k-$k", s"k-$k")
        .filter(col("key") === s"k-$k").count() == 1,
        s"string key k-$k lost")
    }
    // point-SET form: tighter than the envelope, rows exact
    val in = ManifestTable.readPrunedInStr(spark, t, "key",
      Seq("k-3", "k-39"))
    assert(nDirs(in) < 4)
    assert(in.filter(col("key").isin("k-3", "k-39")).count() == 2)
    // an absent key may read zero dirs — and must return zero rows
    assert(ManifestTable.readPrunedStr(spark, t, "key", "k-999", "k-999")
      .filter(col("key") === "k-999").count() == 0)
    // a RANGE string probe (lo != hi) never consults the bloom — it
    // would be unsound (membership can't answer ranges)
    assert(ManifestTable.readPrunedStr(spark, t, "key", "k-0", "k-9")
      .filter(col("key").between("k-0", "k-9")).count() > 0)
    // deleteRange rebuilds BOTH filter types on rewritten dirs
    ManifestTable.deleteRange(spark, t, "id", 7L, 7L)
    assert(ManifestTable.readPrunedStr(spark, t, "key", "k-7", "k-7")
      .filter(col("key") === "k-7").count() == 0)
    (0L until 40L).filter(_ != 7L).foreach { k =>
      assert(ManifestTable.readPrunedStr(spark, t, "key", s"k-$k", s"k-$k")
        .filter(col("key") === s"k-$k").count() == 1,
        s"post-delete string key k-$k lost")
    }
  }

  test("cluster rewrites into range-disjoint dirs; answers and CDC unchanged") {
    val t = s"${Files.createTempDirectory("graft-manifestclust")}/t"
    // arrival order interleaves the key space: every commit spans the
    // full range, so range pruning starts out vacuous
    (0 until 3).foreach(i => ManifestTable.append(spark,
      Seq(i.toLong, (i + 10).toLong, (i + 20).toLong).toDF("id"), t,
      tag = i.toLong, statsCols = Seq("id")))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    assert(nDirs(ManifestTable.readPruned(spark, t, "id", 20L, 22L)) == 3)
    val v = ManifestTable.cluster(spark, t, "id", 3)
    // content identical; the same probe now reads ONE dir
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(0L, 1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L))
    assert(nDirs(ManifestTable.readPruned(spark, t, "id", 20L, 22L)) == 1)
    // watermark survives; old snapshots still read their dirs
    assert(ManifestTable.latestTag(spark, t) == 2L)
    assert(ids(ManifestTable.readVersion(spark, t, 2)) ==
      Seq(0L, 1L, 10L, 11L, 20L, 21L))
    // a DRAINED consumer sees the rewrite as nothing-new (provenance)
    assert(ManifestTable.readSince(spark, t, 3).count() == 0)
    // ...and a fresh append after it is delivered alone
    ManifestTable.append(spark, Seq(99L).toDF("id"), t)
    assert(ids(ManifestTable.readSince(spark, t, v)) == Seq(99L))
    // non-integral key refused
    val t2 = s"${Files.createTempDirectory("graft-manifestclust2")}/t"
    ManifestTable.append(spark, Seq((1L, "x")).toDF("id", "s"), t2)
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.cluster(spark, t2, "s", 2)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("optimistic appends: uncoordinated writers all land with retries, data written once") {
    val t = s"${Files.createTempDirectory("graft-manifestocc")}/t"
    ManifestTable.append(spark, Seq(0L).toDF("id"), t,
      statsCols = Seq("id"))
    val k = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(k)
    try {
      val tasks = (1 to k).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = ManifestTable.append(spark,
            Seq(i.toLong * 10).toDF("id"), t, statsCols = Seq("id"),
            retries = k + 2)
        })
      }
      val versions = tasks
        .map(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      // every writer landed on its OWN version: together exactly
      // v2..v(k+1), no gaps, no double-grants
      assert(versions.sorted == (2 to k + 1).map(_.toLong),
        s"got versions $versions")
      // content is the union — nothing lost, nothing doubled
      assert(ids(ManifestTable.read(spark, t)) ==
        (0L +: (1 to k).map(_ * 10L)).sorted)
      // the per-dir metadata discipline survived the retries: every
      // entry carries its stats and exact row count (the data dir was
      // written once and its entry reused across commit attempts)
      val entries = ManifestTable.entriesOf(spark, t, (k + 1).toLong)
      assert(entries.size == k + 1 && entries.forall(e =>
        e.statMin.contains("id") && e.rows.contains(1L)))
    } finally pool.shutdown()
  }

  test("rewrite rebase: a conflicting commit is rebased onto iff provably safe") {
    import org.apache.spark.sql.types.StructType
    def fresh(): (String, Seq[ManifestTable.Entry], StructType) = {
      val t = s"${Files.createTempDirectory("graft-rebase")}/t"
      ManifestTable.append(spark, (0L to 9L).toDF("id"), t,
        statsCols = Seq("id"))
      ManifestTable.append(spark, (10L to 19L).toDF("id"), t,
        statsCols = Seq("id"))
      (t, ManifestTable.entriesOf(spark, t, 2L),
        ManifestTable.schemaOf(spark, t, 2L).get)
    }
    def dirA(es: Seq[ManifestTable.Entry]): String =
      es.find(_.statMin("id") == 0L).get.dir
    // the op under test: "deleteRange [0,9] emptied dir A" — consumed
    // = {A}, produced = nothing, gated on added-dirs disjoint from
    // [0,9]. Driven through commitRewrite directly so the conflicting
    // interleaving is deterministic, not racy.
    def gate(lo: Long, hi: Long)(added: Seq[ManifestTable.Entry]) =
      added.forall(e => !e.mightOverlap("id", lo, hi))

    // 1) rebase SUCCEEDS over a concurrently-appended disjoint dir
    val (t1, base1, schema) = fresh()
    ManifestTable.append(spark, (100L to 109L).toDF("id"), t1,
      statsCols = Seq("id")) // interloper lands v3 before our commit
    val v = ManifestTable.commitRewrite(spark, t1, "deleteRange", 2L,
      base1, Set(dirA(base1)), Nil, schema, Nil, Nil, retries = 2,
      gate(0L, 9L))
    assert(v == 4L)
    assert(ids(ManifestTable.read(spark, t1)) ==
      ((10L to 19L) ++ (100L to 109L)).sorted)

    // 2) rebase REFUSED when an added dir may hold affected rows
    val (t2, base2, _) = fresh()
    ManifestTable.append(spark, Seq(5L, 6L).toDF("id"),
      t2, statsCols = Seq("id")) // overlaps the delete range
    val ex2 = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, t2, "deleteRange", 2L,
        base2, Set(dirA(base2)), Nil, schema, Nil, Nil, retries = 2,
        gate(0L, 9L))
    }
    assert(ex2.getMessage.contains("concurrently added"))

    // 3) rebase REFUSED when a consumed dir was itself rewritten
    val (t3, base3, _) = fresh()
    ManifestTable.deleteRange(spark, t3, "id", 0L, 0L) // rewrites A
    val ex3 = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, t3, "deleteRange", 2L,
        base3, Set(dirA(base3)), Nil, schema, Nil, Nil, retries = 2,
        gate(0L, 9L))
    }
    assert(ex3.getMessage.contains("rewrote consumed dir"))

    // 4) rebase REFUSED when the schema evolved concurrently
    val (t4, base4, _) = fresh()
    ManifestTable.append(spark,
      Seq((50L, "x")).toDF("id", "s"), t4, statsCols = Seq("id"),
      evolveSchema = true)
    val ex4 = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, t4, "deleteRange", 2L,
        base4, Set(dirA(base4)), Nil, schema, Nil, Nil, retries = 2,
        gate(0L, 9L))
    }
    assert(ex4.getMessage.contains("schema changed"))

    // 5) retries = 0 propagates the raw conflict untouched
    val (t5, base5, _) = fresh()
    ManifestTable.append(spark, (100L to 101L).toDF("id"), t5,
      statsCols = Seq("id"))
    intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, t5, "deleteRange", 2L,
        base5, Set(dirA(base5)), Nil, schema, Nil, Nil, retries = 0,
        gate(0L, 9L))
    }
  }

  test("CHECK constraints: write-boundary enforcement across every path") {
    val t = s"${Files.createTempDirectory("graft-check")}/t"
    ManifestTable.append(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "score"), t,
      statsCols = Seq("id"))
    // adding over violating content is refused, no version committed
    val exAdd = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, t, "score_hi", "score > 15")
    }
    assert(exAdd.getMessage.contains("score_hi") &&
      ManifestTable.latestVersion(spark, t).contains(1L))
    // a non-boolean expression is refused up front
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, t, "notbool", "score + 1")
    }
    // a satisfiable constraint lands as a data-identical new version
    assert(ManifestTable.addConstraint(spark, t, "score_pos",
      "score > 0") == 2L)
    assert(ManifestTable.constraintsOf(spark, t, 2L) ==
      Seq("score_pos" -> "score > 0"))
    // append: a violating batch is rejected, table untouched
    val exApp = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, Seq((3L, -5L)).toDF("id", "score"), t)
    }
    assert(exApp.getMessage.contains("score_pos") &&
      ManifestTable.latestVersion(spark, t).contains(2L))
    // SQL NULL passes (CHECK semantics: only FALSE violates)
    ManifestTable.append(spark,
      Seq((3L, None: Option[Long]), (4L, Some(40L))).toDF("id", "score"),
      t, statsCols = Seq("id"))
    // merge: violating batch rejected BEFORE staging; passing lands
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark,
        Seq((2L, -1L)).toDF("id", "score"), t, "id")
    }
    ManifestTable.merge(spark, Seq((2L, 25L)).toDF("id", "score"), t, "id")
    // the constraint survives maintenance (carried by the rewrite
    // commit like the pruning discipline)...
    ManifestTable.compact(spark, t)
    val vNow = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.constraintsOf(spark, t, vNow) ==
      Seq("score_pos" -> "score > 0"))
    // ...and survives a content overwrite, which must also satisfy it
    intercept[IllegalArgumentException] {
      ManifestTable.overwrite(spark,
        Seq((9L, -9L)).toDF("id", "score"), t)
    }
    ManifestTable.overwrite(spark, Seq((9L, 90L)).toDF("id", "score"), t)
    assert(ManifestTable.constraintsOf(spark, t,
      ManifestTable.latestVersion(spark, t).get) ==
      Seq("score_pos" -> "score > 0"))
    // drop: typo'd name is loud; real drop re-admits the old batch
    intercept[IllegalArgumentException] {
      ManifestTable.dropConstraint(spark, t, "nope")
    }
    ManifestTable.dropConstraint(spark, t, "score_pos")
    ManifestTable.append(spark, Seq((10L, -5L)).toDF("id", "score"), t)
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.get(1))).sortBy(_._1).toSeq ==
      Seq((9L, 90L), (10L, -5L)))
  }

  test("rewrite rebase refuses a concurrently-changed constraint set") {
    val t = s"${Files.createTempDirectory("graft-checkrb")}/t"
    ManifestTable.append(spark, (0L to 9L).toDF("id"), t,
      statsCols = Seq("id"))
    val base = ManifestTable.entriesOf(spark, t, 1L)
    val schema = ManifestTable.schemaOf(spark, t, 1L).get
    ManifestTable.addConstraint(spark, t, "id_pos", "id >= 0") // v2
    val ex = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, t, "compact", 1L, base,
        base.map(_.dir).toSet, base, schema, Nil, Nil, retries = 2,
        _ => true)
    }
    assert(ex.getMessage.contains("constraints changed"))
  }

  test("merge with retries lands against racing disjoint appends") {
    val t = s"${Files.createTempDirectory("graft-rebaserace")}/t"
    ManifestTable.append(spark,
      (0L to 9L).map(i => (i, s"v$i")).toDF("id", "s"), t,
      statsCols = Seq("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      // one merge racing two appends in key ranges the merge's
      // envelope can prove disjoint — every writer must land, with
      // the merge rebasing as needed (or winning outright: both
      // interleavings are legal; content decides, not timing)
      val mergeTask = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = ManifestTable.merge(spark,
          Seq((3L, "replaced"), (20L, "new")).toDF("id", "s"), t, "id",
          retries = 4)._1
      })
      val appendTasks = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = ManifestTable.append(spark,
            Seq((100L + i, s"a$i")).toDF("id", "s"), t,
            statsCols = Seq("id"), retries = 4)
        })
      }
      (mergeTask +: appendTasks)
        .foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      val got = ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val want = ((0L to 9L).map(i => (i, if (i == 3) "replaced"
        else s"v$i")) ++ Seq((20L, "new"), (101L, "a1"), (102L, "a2")))
        .sortBy(_._1)
      assert(got == want)
    } finally pool.shutdown()
  }

  test("append without retries loses a version conflict loudly and typed") {
    val t = s"${Files.createTempDirectory("graft-manifestocc2")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    // drive the loser directly: same version as an already-committed
    // snapshot, zero retries — the typed conflict callers can key on
    val ex = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commit(spark, t, 1L, Nil,
        new org.apache.spark.sql.types.StructType().add("id", "long"),
        -1L)
    }
    assert(ex.getMessage.contains("single-writer"))
  }

  test("clusterZ tiles two axes; content, watermark, and CDC unchanged") {
    val t = s"${Files.createTempDirectory("graft-manifestzc")}/t"
    // 2-D key space (x in 0..15, y reversed) ingested interleaved so
    // neither axis is prunable pre-rewrite
    val rows = (0L until 16L).map(x => (x, 15L - x))
    (0 until 4).foreach(i => ManifestTable.append(spark,
      rows.filter(_._1 % 4 == i).toDF("x", "y"), t,
      tag = i.toLong, statsCols = Seq("x", "y")))
    def nDirs(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').dropRight(1).last).distinct.length
    assert(nDirs(ManifestTable.readPruned(spark, t, "x", 0L, 3L)) == 4)
    assert(nDirs(ManifestTable.readPruned(spark, t, "y", 0L, 3L)) == 4)
    val v = ManifestTable.clusterZ(spark, t, "x", "y", 4)
    // content identical, both axes now prune to a strict subset
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      rows.sorted)
    assert(nDirs(ManifestTable.readPruned(spark, t, "x", 0L, 3L)) < 4)
    assert(nDirs(ManifestTable.readPruned(spark, t, "y", 0L, 3L)) < 4)
    // watermark survives; drained CDC consumers see nothing new
    assert(ManifestTable.latestTag(spark, t) == 3L)
    assert(ManifestTable.readSince(spark, t, 4L).count() == 0)
    ManifestTable.append(spark, Seq((99L, 99L)).toDF("x", "y"), t)
    assert(ManifestTable.readSince(spark, t, v)
      .select("x").as[Long].collect().toSeq == Seq(99L))
    // non-integral axis refused
    val t2 = s"${Files.createTempDirectory("graft-manifestzc2")}/t"
    ManifestTable.append(spark, Seq((1L, "s")).toDF("x", "s"), t2)
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.clusterZ(spark, t2, "x", "s", 2)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("deleteRange refuses a non-integral key instead of a lossy cast") {
    val t = s"${Files.createTempDirectory("graft-manifestdel")}/t"
    ManifestTable.append(spark, Seq((1L, "abc")).toDF("id", "s"), t)
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.deleteRange(spark, t, "s", 0L, 1L)
    }
    assert(ex.getMessage.contains("integral"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
  }

  test("pre-round-10 manifests migrate on read; the next commit modernizes them") {
    val t = s"${Files.createTempDirectory("graft-manifestmig")}/t"
    // a table written by the old layout: plain dir name, single
    // optional statCol with long min/max, no sidecars, no provenance
    Seq(1L, 2L).toDF("id").write.parquet(s"$t/data/c00000001")
    Seq(("c00000001", 0L, Option("id"), Option(1L), Option(2L)))
      .toDF("dir", "tag", "statCol", "statMin", "statMax")
      .repartition(1).write.parquet(s"$t/manifest/v00000001")
    // reads work through the migration path: content, watermark
    // (entry-tag fallback), migrated stats pruning, pre-sidecar schema
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    assert(ManifestTable.latestTag(spark, t) == 0L)
    assert(ManifestTable.readPruned(spark, t, "id", 5L, 9L).count() == 0)
    assert(ManifestTable.readPruned(spark, t, "id", 2L, 3L).count() == 2)
    // the next append commits in the CURRENT layout on top of it
    ManifestTable.append(spark, Seq(3L).toDF("id"), t,
      statsCols = Seq("id"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    assert(ManifestTable.schemaOf(spark, t, 2L).isDefined)
  }

  test("same-version commit staging is attempt-unique and never pre-deleted") {
    val t = s"${Files.createTempDirectory("graft-manifesttmp")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    // a RACING attempt at v2 has staged its manifest but not renamed
    // yet; our commit at the same version must neither delete nor
    // write into that staging (shared staging is how a torn manifest —
    // one writer's entries with the other's sidecars — gets renamed
    // into place with a PASSING attempt-id check)
    val racing = new java.io.File(s"$t/manifest/.tmp-v00000002_racer001")
    assert(racing.mkdirs())
    val marker = new java.io.File(racing, "_graft_attempt")
    java.nio.file.Files.write(marker.toPath, "racer".getBytes)
    assert(ManifestTable.append(spark, Seq(2L).toDF("id"), t) == 2L)
    // the racer's staging survives commit, byte-identical
    assert(racing.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == "racer")
    // and the winner's publish is intact (its own attempt id, its rows)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    // the racer now loses loudly when it tries to publish v2
    val ex = intercept[RuntimeException] {
      ManifestTable.commit(spark, t, 2L,
        dirNames(t, 1L).map(d =>
          ManifestTable.Entry(d, -1L, Map.empty, Map.empty, Nil)),
        new org.apache.spark.sql.types.StructType().add("id", "long"),
        -1L)
    }
    assert(ex.getMessage.contains("single-writer"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
  }

  test("deleteRange's integral guard holds on a pre-sidecar table") {
    val t = s"${Files.createTempDirectory("graft-manifestdel2")}/t"
    ManifestTable.append(spark, Seq((1L, "abc")).toDF("id", "s"), t)
    // simulate a pre-sidecar (migrated) table: no _graft_schema.json
    val side = new java.io.File(s"$t/manifest/v00000001/_graft_schema.json")
    assert(side.delete())
    // the guard must fall back to the inferred schema, not silently
    // skip — a lossy string->long cast could delete rows far outside
    // the range
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.deleteRange(spark, t, "s", 0L, 1L)
    }
    assert(ex.getMessage.contains("integral"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
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

  test("history records op/time/counts; timestamps address snapshots") {
    val t = s"${Files.createTempDirectory("graft-history")}/t"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t,
      statsCols = Seq("id"))                                   // v1
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)         // v2
    ManifestTable.overwrite(spark, Seq(9L, 10L).toDF("id"), t) // v3
    ManifestTable.compact(spark, t)                            // v4
    val h = ManifestTable.history(spark, t).collect()
      .sortBy(_.getLong(0))
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("append", "append", "overwrite", "compact"))
    // every count resolves from the manifest: rows track content
    assert(h.map(_.getLong(5)).toSeq == Seq(2L, 3L, 2L, 2L))
    // monotonized commit times: strictly increasing even for commits
    // landing in the same millisecond
    val ts = h.map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted && ts.distinct == ts)
    // each snapshot's own commit time addresses exactly it, and a
    // mid-history time sees the table as it WAS (pre-overwrite)
    h.foreach { r =>
      assert(ManifestTable.versionAtTimestamp(spark, t,
        r.getTimestamp(1).getTime) == r.getLong(0))
    }
    assert(ids(ManifestTable.readTimestampAsOf(spark, t, ts(1))) ==
      Seq(1L, 2L, 3L))
    // a time before the first retained commit is loud, not "latest"
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.versionAtTimestamp(spark, t, ts.head - 1)
    }
    assert(ex.getMessage.contains("retained"))
    // SQL surface: timestampAsOf (epoch millis) pins the snapshot;
    // combining both addresses is refused
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", ts(1).toString).load(t)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest").option("versionAsOf", "1")
        .option("timestampAsOf", ts(1).toString).load(t)
    }
    // vacuum prunes history exactly like it prunes time travel: a
    // pre-horizon time no longer resolves (ts.head - 1 is provably
    // before every retained commit's raw time)
    ManifestTable.vacuum(spark, t, keepVersions = 1)
    assert(ManifestTable.history(spark, t).collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
    intercept[IllegalArgumentException] {
      ManifestTable.versionAtTimestamp(spark, t, ts.head - 1)
    }
  }

  test("vacuumOlderThan: time-addressed retention keeps a suffix") {
    val t = s"${Files.createTempDirectory("graft-mvot")}/t"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.append(spark, Seq(2L).toDF("id"), t)
    Thread.sleep(30) // a real gap, so the cutoff lands between commits
    val cutoff = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)
    ManifestTable.append(spark, Seq(4L).toDF("id"), t)
    val r = ManifestTable.vacuumOlderThan(spark, t, cutoff)
    assert(r.manifestsDropped == 2)
    assert(ManifestTable.versions(spark, t) == Seq(3L, 4L))
    // time travel still reaches everything at-or-after the cutoff
    assert(ids(ManifestTable.readVersion(spark, t, 3L)) ==
      Seq(1L, 2L, 3L))
    // a cutoff beyond every commit still keeps the current version
    val r2 = ManifestTable.vacuumOlderThan(spark, t,
      System.currentTimeMillis() + 60000)
    assert(ManifestTable.versions(spark, t) == Seq(4L) &&
      r2.manifestsDropped == 1)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
  }
}
