package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Tags (immutable snapshot pins that survive vacuum) and
  * write-audit-publish (staged candidates: invisible until published,
  * auditable with real reads, abandonable without a trace, and
  * vacuum-safe while staged).
  */
class ManifestWapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    s"${Files.createTempDirectory(prefix)}/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("a tag pins its snapshot through vacuum; dropTag releases it") {
    val t = tmp("graft-tag")
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t) // v1
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)     // v2
    ManifestTable.createTag(spark, t, "run-a", 1L)
    ManifestTable.append(spark, Seq(4L).toDF("id"), t)     // v3
    // vacuum to 1 kept version: v2 drops, but tagged v1 is PINNED
    ManifestTable.vacuum(spark, t, keepVersions = 1)
    assert(ManifestTable.versions(spark, t) == Seq(1L, 3L))
    assert(ids(ManifestTable.readTag(spark, t, "run-a")) == Seq(1L, 2L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
    // tags are write-once
    intercept[Exception](ManifestTable.createTag(spark, t, "run-a", 3L))
    // dropTag releases the pin: the next vacuum reaps v1
    ManifestTable.dropTag(spark, t, "run-a")
    ManifestTable.vacuum(spark, t, keepVersions = 1)
    assert(ManifestTable.versions(spark, t) == Seq(3L))
    intercept[Exception](ManifestTable.readTag(spark, t, "run-a"))
    // tagging an uncommitted version fails loudly
    intercept[Exception](ManifestTable.createTag(spark, t, "x", 99L))
  }

  test("tagAsOf: SQL time travel by name, mutually exclusive with version") {
    val t = tmp("graft-tag-sql")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.createTag(spark, t, "baseline", 1L)
    ManifestTable.append(spark, Seq(2L).toDF("id"), t)
    val pinned = spark.read.format("graft-manifest")
      .option("tagAsOf", "baseline").load(t)
    assert(ids(pinned) == Seq(1L))
    assert(ids(spark.read.format("graft-manifest").load(t)) ==
      Seq(1L, 2L))
    intercept[Exception](spark.read.format("graft-manifest")
      .option("tagAsOf", "nope").load(t))
    intercept[Exception](spark.read.format("graft-manifest")
      .option("tagAsOf", "baseline").option("versionAsOf", "2")
      .load(t))
  }

  test("staged candidate: invisible, auditable, vacuum-safe, publishable") {
    val t = tmp("graft-wap")
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t,
      statsCols = Seq("id"))
    ManifestTable.stageAppend(spark, Seq(3L, 4L).toDF("id"), t,
      "batch-7", statsCols = Seq("id"))
    // invisible: no new version, the table reads as before
    assert(ManifestTable.versions(spark, t) == Seq(1L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    assert(ManifestTable.stagedNames(spark, t) == Seq("batch-7"))
    // auditable: the candidate's rows read back exactly
    assert(ids(ManifestTable.readStaged(spark, t, "batch-7")) ==
      Seq(3L, 4L))
    // vacuum-safe: the staged dirs are referenced while staged
    ManifestTable.append(spark, Seq(9L).toDF("id"), t)
    ManifestTable.vacuum(spark, t, keepVersions = 1)
    assert(ids(ManifestTable.readStaged(spark, t, "batch-7")) ==
      Seq(3L, 4L))
    // one candidate per name
    intercept[Exception](ManifestTable.stageAppend(spark,
      Seq(5L).toDF("id"), t, "batch-7"))
    // publish: atomic, consumed, stats carried (pruning discipline)
    val v = ManifestTable.publish(spark, t, "batch-7")
    assert(v == ManifestTable.latestVersion(spark, t).get)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L, 9L))
    assert(ManifestTable.stagedNames(spark, t).isEmpty)
    val e = ManifestTable.entriesOf(spark, t, v)
      .filter(_.files.exists(_.nonEmpty))
      .find(_.statMin.get("id").contains(3L))
    assert(e.exists(_.statMax("id") == 4L),
      "published entry must carry the stage-time stats")
    intercept[Exception](ManifestTable.publish(spark, t, "batch-7"))
  }

  test("audit reject: abandonStaged leaves no trace; vacuum reaps the dirs") {
    val t = tmp("graft-wap-rej")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.stageAppend(spark, Seq(-5L).toDF("id"), t, "bad")
    // the audit: reject negative ids
    val bad = ManifestTable.readStaged(spark, t, "bad")
      .filter(col("id") < 0).count()
    assert(bad == 1)
    ManifestTable.abandonStaged(spark, t, "bad")
    assert(ManifestTable.stagedNames(spark, t).isEmpty)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
    // the abandoned dirs are orphans now — vacuum reaps them
    ManifestTable.append(spark, Seq(2L).toDF("id"), t)
    val r = ManifestTable.vacuumDetailed(spark, t, keepVersions = 1)
    assert(r.dirsReaped >= 1,
      s"abandoned staged dirs must be reaped, got $r")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
  }

  test("publish validates against the CURRENT table: constraints and rebase") {
    val t = tmp("graft-wap-val")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.stageAppend(spark, Seq(-3L).toDF("id"), t, "c1")
    // a constraint added AFTER staging still gates the publish
    ManifestTable.addConstraint(spark, t, "pos", "id > 0")
    intercept[Exception](ManifestTable.publish(spark, t, "c1"))
    ManifestTable.abandonStaged(spark, t, "c1")
    // rebase: a concurrent append between stage and publish is fine
    // with retries (appends commute)
    ManifestTable.stageAppend(spark, Seq(10L).toDF("id"), t, "c2")
    ManifestTable.append(spark, Seq(5L).toDF("id"), t)
    ManifestTable.publish(spark, t, "c2", retries = 1)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 5L, 10L))
  }

  test("vacuum minAgeMillis presumes young unreferenced dirs in-flight") {
    val t = tmp("graft-vacgrace")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.append(spark, Seq(2L).toDF("id"), t)
    // simulate another writer's in-flight attempt dir (written, not
    // yet referenced by any commit)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val inflight = new org.apache.hadoop.fs.Path(
      s"$t/data/c00000099_inflight")
    fs.mkdirs(inflight)
    // with a grace window, the young orphan survives the reap...
    val r1 = ManifestTable.vacuumDetailed(spark, t, keepVersions = 1,
      minAgeMillis = 3600000L)
    assert(fs.exists(inflight),
      s"young unreferenced dir reaped despite grace: $r1")
    // ...without one (the single-writer default), it is an orphan
    val r2 = ManifestTable.vacuumDetailed(spark, t, keepVersions = 1)
    assert(!fs.exists(inflight) && r2.dirsReaped >= 1)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
  }

  test("publish is idempotent across the commit/consume crash window") {
    val t = tmp("graft-wap-crash")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.stageAppend(spark, Seq(2L, 3L).toDF("id"), t, "c")
    // simulate the crash: snapshot the staged set, publish (which
    // consumes it), then restore the staged dir as the crashed
    // process would have left it
    val stagedDir = s"$t/staged/c"
    val copy = s"$t/.staged-copy"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val conf = spark.sessionState.newHadoopConf()
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(stagedDir), fs,
      new org.apache.hadoop.fs.Path(copy), false, conf)
    val v = ManifestTable.publish(spark, t, "c")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(copy), fs,
      new org.apache.hadoop.fs.Path(stagedDir), false, conf)
    fs.delete(new org.apache.hadoop.fs.Path(copy), true)
    // the retry consumes the leftover set WITHOUT double-appending
    assert(ManifestTable.publish(spark, t, "c") == v)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    assert(ManifestTable.stagedNames(spark, t).isEmpty)
    assert(ManifestTable.latestVersion(spark, t).contains(v))
  }

  test("publish idempotence survives a rewrite of the published dirs") {
    // the crash window again, but a compact runs BETWEEN crash and
    // retry: the published dirs are rewritten OUT of the latest
    // snapshot, so dir-presence can no longer prove the publish —
    // the attempt id recorded in the commit's history can, and the
    // retry must consume instead of double-appending
    val t = tmp("graft-wap-crash-rw")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.stageAppend(spark, Seq(2L, 3L).toDF("id"), t, "c")
    val stagedDir = s"$t/staged/c"
    val copy = s"$t/.staged-copy"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val conf = spark.sessionState.newHadoopConf()
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(stagedDir), fs,
      new org.apache.hadoop.fs.Path(copy), false, conf)
    val v = ManifestTable.publish(spark, t, "c")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(copy), fs,
      new org.apache.hadoop.fs.Path(stagedDir), false, conf)
    fs.delete(new org.apache.hadoop.fs.Path(copy), true)
    // the rewrite: latest snapshot no longer references any
    // published dir
    ManifestTable.compact(spark, t)
    val w = ManifestTable.publish(spark, t, "c")
    assert(w == v, s"retry re-published (returned $w, expected $v)")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L),
      "published rows duplicated by the retry")
    assert(ManifestTable.stagedNames(spark, t).isEmpty)
  }

  test("vacuum aborts on an unreadable staged candidate") {
    val t = tmp("graft-wap-vac-abort")
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    ManifestTable.stageAppend(spark, Seq(2L).toDF("id"), t, "live")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stagedDataDirs = ManifestTable.stagedNames(spark, t)
    assert(stagedDataDirs == Seq("live"))
    val dataDirsBefore = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$t/data")).map(_.getPath.getName)
      .toSet
    // corrupt the candidate's entry list: every parquet part becomes
    // garbage bytes, so entriesAt throws instead of parsing
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/staged/live"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val out = fs.create(st.getPath, true)
        try out.write("not parquet".getBytes("UTF-8"))
        finally out.close()
      }
    ManifestTable.append(spark, Seq(9L).toDF("id"), t) // an old version to drop
    val ex = intercept[RuntimeException](
      ManifestTable.vacuum(spark, t, keepVersions = 1))
    assert(ex.getMessage.contains("staged"),
      s"unexpected error: ${ex.getMessage}")
    // nothing was reaped — the candidate's data dirs survive intact
    val dataDirsAfter = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$t/data")).map(_.getPath.getName)
      .toSet
    assert(dataDirsBefore.subsetOf(dataDirsAfter),
      "vacuum reaped dirs despite the unreadable candidate")
  }

  test("detail() describes the table from metadata alone") {
    val t = tmp("graft-detail")
    ManifestTable.append(spark,
      Seq((1L, "en"), (2L, "de")).toDF("id", "lang"), t,
      statsCols = Seq("id"), bloomCols = Seq("id"),
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("lang")))
    ManifestTable.addConstraint(spark, t, "id_pos", "id > 0")
    ManifestTable.createTag(spark, t, "r1", 1L)
    ManifestTable.stageAppend(spark, Seq((3L, "fr")).toDF("id", "lang"),
      t, "pending")
    val d = ManifestTable.detail(spark, t).head()
    assert(d.getAs[String]("format") == "graft-manifest")
    assert(d.getAs[Long]("num_dirs") == 2L &&
      d.getAs[Long]("num_rows") == 2L)
    ManifestTable.createBranch(spark, t, "wip")
    ManifestTable.appendToBranch(spark,
      Seq((9L, "en"), (10L, "en")).toDF("id", "lang"), t, "wip")
    val d2 = ManifestTable.detail(spark, t).head()
    def arr(c: String): Seq[String] =
      d2.getAs[scala.collection.Seq[String]](c).toSeq
    assert(arr("partition_spec") == Seq("identity:lang"))
    assert(arr("branches") == Seq("wip"))
    // the stuck-auditor surfacer: per-branch staged commit/row counts
    // and the oldest commit's age, from metadata alone
    val bd = d2.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("branch_detail").toSeq
    assert(bd.size == 1)
    assert(bd.head.getAs[String]("name") == "wip")
    assert(bd.head.getAs[Long]("staged_commits") == 1L)
    assert(bd.head.getAs[Long]("staged_rows") == 2L)
    val age = bd.head.getAs[Long]("oldest_staged_age_ms")
    assert(age >= 0L && age < 3600L * 1000,
      s"staged age must be a sane wall-clock delta, got $age")
    ManifestTable.abandonBranch(spark, t, "wip")
    assert(arr("stats_cols") == Seq("id") &&
      arr("bloom_cols") == Seq("id"))
    assert(arr("constraints") == Seq("id_pos"))
    assert(arr("tags") == Seq("r1"))
    assert(arr("staged") == Seq("pending"))
    ManifestTable.abandonStaged(spark, t, "pending")
  }

  test("WAP on a partitioned table stages partition-pure dirs") {
    val t = tmp("graft-wap-part")
    ManifestTable.append(spark,
      Seq((1L, "en")).toDF("id", "lang"), t,
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("lang")))
    ManifestTable.stageAppend(spark,
      Seq((2L, "en"), (3L, "de")).toDF("id", "lang"), t, "p1")
    ManifestTable.publish(spark, t, "p1")
    val es = ManifestTable.entriesOf(spark, t,
        ManifestTable.latestVersion(spark, t).get)
      .filter(_.files.exists(_.nonEmpty))
    assert(es.forall(_.partition.contains("lang")))
    // so partition retention works across published candidates
    val (_, n) = ManifestTable.dropPartitions(spark, t,
      Map("lang" -> "de"))
    assert(n == 1 && ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
  }
}
