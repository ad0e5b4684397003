package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read deletion vectors ([[ManifestTable.deleteKeys]]) and
  * version rollback ([[ManifestTable.restore]]): a scattered-key
  * delete must cost one tombstone write + one metadata commit (ZERO
  * data files rewritten), reads must apply tombstones with per-dir
  * scoping (a re-inserted key survives), every maintenance op must
  * materialize rather than resurrect, and the metadata-only
  * aggregate rule must stand down while counts are inexact. */
class ManifestDeleteVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-dv").toString

  /** 100 rows in 4 INTERLEAVED commits (id % 4) — every dir's id
    * range spans the domain, so only the per-dir Bloom filters can
    * prune a point delete. */
  private def interleaved(path: String): Unit = {
    val rows = (0L until 100L).map(i => (i, s"k-$i", i % 10))
    (0 until 4).foreach { r =>
      ManifestTable.append(spark,
        rows.filter(_._1 % 4 == r).toDF("id", "key", "grp"),
        path, statsCols = Seq("id", "key", "grp"),
        bloomCols = Seq("id", "key"))
    }
  }

  private def logical(path: String): Set[Long] =
    ManifestTable.read(spark, path).select("id").as[Long].collect().toSet

  test("deleteKeys: tombstone only, no data file rewritten, bloom-pruned") {
    val path = tmp()
    interleaved(path)
    val before = ManifestTable.entriesOf(spark, path, 4L)
    // ids 5 and 9 are both ≡ 1 (mod 4): exactly one dir can hold them
    val (v, touched) = ManifestTable.deleteKeys(spark,
      Seq(5L, 9L).toDF("id"), path, "id")
    assert(v == 5L && touched == 1,
      s"expected 1 bloom-pruned dir tombstoned, got $touched at v$v")
    val after = ManifestTable.entriesOf(spark, path, v)
    // physical identity: same dirs, same files — the merge-on-read
    // contract (a copy-on-write delete would rename the touched dir)
    assert(after.map(_.dir).sorted == before.map(_.dir).sorted)
    assert(after.map(e => e.dir -> e.files).toMap ==
      before.map(e => e.dir -> e.files).toMap)
    assert(after.count(_.dv.nonEmpty) == 1)
    // the tombstone landed under deletes/
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/deletes")).nonEmpty)
    assert(logical(path) == (0L until 100L).toSet -- Set(5L, 9L))
    assert(ManifestTable.commitInfoOf(spark, path, v)
      .exists(_._1 == "deleteKeys"))
    // DESCRIBE HISTORY surfaces the pending-tombstone count — the
    // signal an operator's rewriteDeletes cadence keys on
    val hist = ManifestTable.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("num_pending_dv")).toMap
    assert(hist(4L) == 0L && hist(5L) == 1L)
    // time travel respects the dv boundary: the PRE-delete snapshot
    // still shows the rows (its entries carry no dv), both surfaces
    assert(ManifestTable.readVersion(spark, path, 4L)
      .filter(col("id").isin(5L, 9L)).count() == 2)
    assert(spark.read.format("graft-manifest")
      .option("versionAsOf", "4").load(path)
      .filter(col("id").isin(5L, 9L)).count() == 2)
  }

  test("per-dir scoping: a key re-inserted after its delete survives") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(7L).toDF("id"), path, "id")
    ManifestTable.append(spark, Seq((7L, "k-7b", 7L)).toDF(
      "id", "key", "grp"), path, statsCols = Seq("id"))
    val sevens = ManifestTable.read(spark, path)
      .filter(col("id") === 7).select("key").as[String].collect()
    assert(sevens.toSeq == Seq("k-7b"),
      s"expected only the re-inserted row, got ${sevens.toSeq}")
  }

  test("keys absent from every dir commit nothing") {
    val path = tmp()
    interleaved(path)
    val v0 = ManifestTable.latestVersion(spark, path).get
    val (v, touched) = ManifestTable.deleteKeys(spark,
      Seq(100000L, 100001L).toDF("id"), path, "id")
    assert(v == v0 && touched == 0)
    assert(ManifestTable.versions(spark, path).last == v0)
  }

  test("SQL read applies tombstones (anti-join plan) and still prunes") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(5L, 9L).toDF("id"), path, "id")
    val df = spark.read.format("graft-manifest").load(path)
    assert(df.select("id").as[Long].collect().toSet ==
      (0L until 100L).toSet -- Set(5L, 9L))
    // the resolution rewrite planned a broadcast LEFT ANTI join
    // (string check: AQE wraps the plan, so collect() cannot descend)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"expected a broadcast anti-join in the plan:\n$plan")
    // pushdown still reaches the sub-relations: a group filter prunes
    // row count correctly through the rewrite
    assert(df.filter(col("id") < 10).count() == 8) // 10 minus {5, 9}
  }

  test("metadata-only COUNT stands down under pending dv, resumes after") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(5L, 9L).toDF("id"), path, "id")
    val dirty = spark.read.format("graft-manifest").load(path)
      .agg(count(lit(1)).as("n"))
    // correct ANSWER (the one non-negotiable), and NOT a metadata scan
    // (plan-string checks: AQE wraps, collect() cannot descend)
    assert(dirty.as[Long].head() == 98L)
    assert(dirty.queryExecution.executedPlan.toString.contains("FileScan"),
      "metadata rule must stand down while counts are physical-only")
    val (_, rewritten) = ManifestTable.rewriteDeletes(spark, path)
    assert(rewritten == 1)
    val clean = spark.read.format("graft-manifest").load(path)
      .agg(count(lit(1)).as("n"))
    assert(clean.as[Long].head() == 98L)
    val cleanPlan = clean.queryExecution.executedPlan.toString
    assert(cleanPlan.contains("LocalTableScan") &&
      !cleanPlan.contains("FileScan"),
      s"after materialization the COUNT must answer from the manifest:\n$cleanPlan")
  }

  test("rewriteDeletes: one staged job, exact restats, drops emptied dirs") {
    val path = tmp()
    interleaved(path)
    // delete EVERY key of residue 2 (whole dir) and two of residue 1
    val all2 = (0L until 100L).filter(_ % 4 == 2)
    ManifestTable.deleteKeys(spark,
      (all2 ++ Seq(5L, 9L)).toDF("id"), path, "id")
    val (v, rewritten) = ManifestTable.rewriteDeletes(spark, path)
    assert(rewritten == 2) // residue-1 and residue-2 dirs were dirty
    val entries = ManifestTable.entriesOf(spark, path, v)
    assert(entries.forall(_.dv.isEmpty))
    // the fully-deleted dir dropped out of the manifest entirely
    assert(entries.size == 3)
    val expect = (0L until 100L).toSet -- all2.toSet -- Set(5L, 9L)
    assert(logical(path) == expect)
    // restats are EXACT again: per-entry recorded rows sum to logical
    assert(entries.flatMap(_.rows).sum == expect.size)
    // provenance: the rewritten dir names its source
    assert(entries.exists(_.sources.nonEmpty))
  }

  test("compact and cluster materialize pending dv (never resurrect)") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(5L, 9L, 13L).toDF("id"),
      path, "id")
    val expect = (0L until 100L).toSet -- Set(5L, 9L, 13L)
    ManifestTable.compact(spark, path)
    assert(logical(path) == expect)
    val compacted = ManifestTable.entriesOf(spark, path,
      ManifestTable.latestVersion(spark, path).get)
    assert(compacted.forall(_.dv.isEmpty))
    // restat (not fold) under dv: recorded rows/null counts are exact
    assert(compacted.flatMap(_.rows).sum == expect.size)
    assert(compacted.forall(_.nullCnt.get("id").contains(0L)))
    // and a clustered rewrite on a fresh dv table does the same
    val p2 = tmp()
    interleaved(p2)
    ManifestTable.deleteKeys(spark, Seq(5L, 9L).toDF("id"), p2, "id")
    ManifestTable.cluster(spark, p2, "id", 2)
    assert(logical(p2) == (0L until 100L).toSet -- Set(5L, 9L))
  }

  test("deleteRange applies pending dv on the dirs it rewrites") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(50L, 54L).toDF("id"), path, "id")
    // range-delete [0, 20): overlaps every interleaved dir, all of
    // which must apply their tombstones before filtering — and the
    // dv'd keys OUTSIDE the range must stay deleted afterwards
    ManifestTable.deleteRange(spark, path, "id", 0L, 19L)
    assert(logical(path) == (20L until 100L).toSet -- Set(50L, 54L))
    val entries = ManifestTable.entriesOf(spark, path,
      ManifestTable.latestVersion(spark, path).get)
    assert(entries.forall(_.dv.isEmpty),
      "a rewrite of every dir must have materialized every tombstone")
  }

  test("merge on a dv-pending table replaces and materializes correctly") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(5L, 9L).toDF("id"), path, "id")
    // upsert key 13 (existing) and 200 (fresh); key 5 must NOT come
    // back via the rewrite of its dir
    val updates = Seq((13L, "k-13u", 3L), (200L, "k-200", 0L))
      .toDF("id", "key", "grp")
    ManifestTable.merge(spark, updates, path, "id")
    val out = ManifestTable.read(spark, path)
      .select("id", "key").as[(Long, String)].collect().toMap
    assert(!out.contains(5L) && !out.contains(9L))
    assert(out(13L) == "k-13u" && out(200L) == "k-200")
    assert(out.size == 100 - 2 + 1)
  }

  test("string keys end-to-end, including SQL DELETE routed merge-on-read") {
    val path = tmp()
    interleaved(path)
    val (v, touched) = ManifestTable.deleteKeys(spark,
      Seq("k-10", "k-14").toDF("key"), path, "key")
    assert(touched == 1) // both ≡ 2 (mod 4): one dir, via string blooms
    assert(ManifestTable.read(spark, path)
      .filter(col("key").isin("k-10", "k-14")).count() == 0)
    // SQL DELETE with a string point predicate routes to deleteKeys:
    // zero data dirs rewritten, commit op says so
    spark.read.format("graft-manifest").load(path)
      .createOrReplaceTempView("dv_sql_target")
    val dirsBefore =
      ManifestTable.entriesOf(spark, path, v).map(_.dir).toSet
    spark.sql("DELETE FROM dv_sql_target WHERE key = 'k-21'")
    val v2 = ManifestTable.latestVersion(spark, path).get
    assert(ManifestTable.commitInfoOf(spark, path, v2)
      .exists(_._1 == "deleteKeys"))
    assert(ManifestTable.entriesOf(spark, path, v2).map(_.dir).toSet ==
      dirsBefore)
    assert(ManifestTable.read(spark, path)
      .filter(col("key") === "k-21").count() == 0)
    // a view that captured the DV-REWRITTEN plan still routes DML
    spark.read.format("graft-manifest").load(path)
      .createOrReplaceTempView("dv_sql_target2")
    spark.sql("DELETE FROM dv_sql_target2 WHERE key IN ('k-33', 'k-37')")
    assert(ManifestTable.read(spark, path)
      .filter(col("key").isin("k-33", "k-37")).count() == 0)
    assert(ManifestTable.commitInfoOf(spark, path,
      ManifestTable.latestVersion(spark, path).get)
      .exists(_._1 == "deleteKeys"))
  }

  test("DML on a FILTERED view of a dv-pending table is rejected, not misrouted") {
    val path = tmp()
    interleaved(path)
    // pending dv → the SQL read path rewrites the relation, and a
    // view can capture that rewrite
    ManifestTable.deleteKeys(spark, Seq("k-10").toDF("key"), path, "key")
    val before = ManifestTable.read(spark, path).count()
    // a view whose plan CONTAINS the rewrite under its own Filter
    // must NOT be recognized as a DML target: before the root-tag
    // guard, the schema-shape check passed (Filter preserves columns)
    // and the DELETE routed to a whole-table command that ignored
    // the view's predicate — deleting k-33 even though the view
    // excludes id >= 10
    spark.read.format("graft-manifest").load(path)
      .filter(col("id") < 5)
      .createOrReplaceTempView("dv_filtered_v")
    intercept[Exception](
      spark.sql("DELETE FROM dv_filtered_v WHERE key = 'k-33'"))
    assert(ManifestTable.read(spark, path).count() == before)
    assert(ManifestTable.read(spark, path)
      .filter(col("key") === "k-33").count() == 1,
      "DELETE on a filtered view was misrouted to the whole table")
    // same for a projection view that re-orders the table's columns
    spark.read.format("graft-manifest").load(path)
      .select("key", "id", "grp")
      .createOrReplaceTempView("dv_proj_v")
    intercept[Exception](
      spark.sql("DELETE FROM dv_proj_v WHERE key = 'k-34'"))
    assert(ManifestTable.read(spark, path)
      .filter(col("key") === "k-34").count() == 1)
  }

  test("readSince: a dv delete adds no rows for incremental consumers") {
    val path = tmp()
    interleaved(path)
    val checkpoint = ManifestTable.latestVersion(spark, path).get
    ManifestTable.deleteKeys(spark, Seq(5L).toDF("id"), path, "id")
    assert(ManifestTable.readSince(spark, path, checkpoint).count() == 0)
  }

  test("vacuum reaps tombstones once no kept snapshot references them") {
    val path = tmp()
    interleaved(path)
    ManifestTable.deleteKeys(spark, Seq(5L).toDF("id"), path, "id")
    ManifestTable.rewriteDeletes(spark, path)
    ManifestTable.vacuum(spark, path, keepVersions = 1)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val delRoot = new org.apache.hadoop.fs.Path(s"$path/deletes")
    assert(!fs.exists(delRoot) || fs.listStatus(delRoot).isEmpty,
      "materialized tombstones must be reaped with their versions")
    assert(logical(path) == (0L until 100L).toSet - 5L)
  }

  test("concurrent deleteKeys on the same dir: rebase refuses (dv identity)") {
    val path = tmp()
    interleaved(path)
    val base = ManifestTable.latestVersion(spark, path).get
    val baseEntries = ManifestTable.entriesOf(spark, path, base)
    // interloper tombstones the residue-1 dir
    ManifestTable.deleteKeys(spark, Seq(5L).toDF("id"), path, "id")
    // a stale rewrite of that same dir must CONFLICT on rebase, not
    // silently drop the interloper's tombstone
    val victim = ManifestTable.entriesOf(spark, path,
        ManifestTable.latestVersion(spark, path).get)
      .find(_.dv.nonEmpty).get
    val stale = baseEntries.find(_.dir == victim.dir).get
    val ex = intercept[ManifestTable.CommitConflictException] {
      ManifestTable.commitRewrite(spark, path, "spec-stale-op", base,
        baseEntries, Set(stale.dir), Seq(stale), // "rewrite" = no-op copy
        ManifestTable.schemaOf(spark, path, base).get,
        Nil, Nil, retries = 1, _ => true)
    }
    assert(ex.getMessage.contains("tombstone"))
  }

  test("restore: rollback to a retained version without data movement") {
    val path = tmp()
    interleaved(path) // v1..v4
    val good = ManifestTable.latestVersion(spark, path).get
    val goodTag = ManifestTable.latestTag(spark, path)
    // the bad deploy: an overwrite that corrupts the table
    ManifestTable.overwrite(spark,
      Seq((-1L, "corrupt", -1L)).toDF("id", "key", "grp"), path,
      tag = 99L)
    assert(logical(path) == Set(-1L))
    val v = ManifestTable.restore(spark, path, good)
    assert(v == good + 2)
    assert(logical(path) == (0L until 100L).toSet)
    assert(ManifestTable.commitInfoOf(spark, path, v)
      .exists(_._1 == "restore"))
    // the restored version REFERENCES the old dirs (no data movement)
    assert(ManifestTable.entriesOf(spark, path, v).map(_.dir).toSet ==
      ManifestTable.entriesOf(spark, path, good).map(_.dir).toSet)
    // the watermark never regresses through a rollback: batch 99 was
    // applied (however regrettably) and stays applied
    assert(ManifestTable.latestTag(spark, path) == 99L && goodTag < 99L)
    // restoring the current version is a no-op; a vacuumed target is loud
    assert(ManifestTable.restore(spark, path, v) == v)
    ManifestTable.vacuum(spark, path, keepVersions = 1)
    assertThrows[IllegalArgumentException] {
      ManifestTable.restore(spark, path, good)
    }
  }

  test("deleteKeys self-limits read-plan width: auto-rewrite past the group cap") {
    val path = tmp()
    // six dirs in disjoint string-key ranges — each delete below
    // touches exactly one dir, so each adds one DISTINCT pending
    // tombstone set (the union-width driver)
    (0 until 6).foreach { i =>
      ManifestTable.append(spark,
        Seq((s"g$i-a", i.toLong), (s"g$i-b", i.toLong)).toDF("k", "n"),
        path, statsCols = Seq("k"))
    }
    def dvGroups(): Int = ManifestTable.entriesOf(spark, path,
      ManifestTable.latestVersion(spark, path).get)
      .map(_.dv).distinct.count(_.nonEmpty)
    (0 until 6).foreach { i =>
      ManifestTable.deleteKeys(spark, Seq(s"g$i-a").toDF("k"), path,
        "k", autoRewriteGroups = 3)
      assert(dvGroups() <= 3,
        s"after delete $i the pending-set count must stay capped, " +
          s"got ${dvGroups()}")
    }
    // every delete took effect through the materializations
    val kept = ManifestTable.read(spark, path).select("k")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept == (0 until 6).map(i => s"g$i-b"),
      s"got $kept")
    // the capped table reads as ONE scan (no per-set union)
    assert(dvGroups() <= 3)
    // opt-out leaves the backlog pending for a caller-owned cadence
    val p2 = tmp()
    (0 until 5).foreach { i =>
      ManifestTable.append(spark,
        Seq((s"g$i-a", i.toLong), (s"g$i-b", i.toLong)).toDF("k", "n"),
        p2, statsCols = Seq("k"))
    }
    (0 until 5).foreach { i =>
      ManifestTable.deleteKeys(spark, Seq(s"g$i-a").toDF("k"), p2,
        "k", autoRewriteGroups = Int.MaxValue)
    }
    val pending = ManifestTable.entriesOf(spark, p2,
      ManifestTable.latestVersion(spark, p2).get)
      .map(_.dv).distinct.count(_.nonEmpty)
    assert(pending == 5, s"opt-out must leave sets pending, got $pending")
  }
}
