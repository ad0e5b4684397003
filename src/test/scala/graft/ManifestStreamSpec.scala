package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The manifest table as a STREAMING source: offsets are committed
  * versions, micro-batches are provenance-aware version-range diffs —
  * bootstrap, tail, maintenance-transparent restart, and the loud
  * vacuumed-checkpoint contract.
  */
class ManifestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("streams commits exactly once: bootstrap, tail, restart through compaction") {
    val tmp = Files.createTempDirectory("graft-mfstream").toString
    val t = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    ManifestTable.append(spark, Seq(3L).toDF("id"), t)
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Seq[Long]]()
    def start() = spark.readStream.format("graft-manifest").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    // batch 0 bootstraps the whole existing table (the Delta
    // readStream convention: existing content, then the tail)
    assert(batches(0L) == Seq(1L, 2L, 3L))
    // tail: a commit while the stream runs arrives alone
    ManifestTable.append(spark, Seq(4L).toDF("id"), t)
    q.processAllAvailable()
    assert(batches.values.flatten.toSeq.sorted == Seq(1L, 2L, 3L, 4L))
    q.stop()
    // maintenance while stopped: compaction of DRAINED commits is
    // invisible to the restarted stream (provenance), and only the
    // genuinely new commit is delivered
    ManifestTable.compact(spark, t)
    ManifestTable.append(spark, Seq(5L).toDF("id"), t)
    batches.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(batches.values.flatten.toSeq.sorted == Seq(5L),
      s"restart must deliver only the post-checkpoint commit, got " +
        s"${batches.toMap}")
    // vacuum past the checkpoint: the restart fails LOUDLY naming the
    // re-bootstrap contract — never a silent whole-table re-read
    ManifestTable.append(spark, Seq(6L).toDF("id"), t)
    ManifestTable.vacuum(spark, t, 1)
    val q3 = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("re-bootstrap")))
    q3.stop()
  }

  test("writeStream sink: exactly-once commits, replay skipped on the tag") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-mfsink").toString
    val t = s"$tmp/table"
    val mem1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q1 = mem1.toDF.toDF("id").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$tmp/ckpt1")
      .option("statsCols", "id")
      .start(t)
    mem1.addData(1L, 2L); q1.processAllAvailable()
    mem1.addData(3L); q1.processAllAvailable()
    q1.stop()
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    assert(ManifestTable.latestTag(spark, t) == 1L)
    // recorded stats drive pruning as usual
    assert(ManifestTable.readPruned(spark, t, "id", 3L, 9L)
      .inputFiles.length <
      ManifestTable.read(spark, t).inputFiles.length)
    // a RESET batchId under a fresh checkpoint is NOT a replay — the
    // watermark was raised by another writer identity, and skipping
    // would silently drop new data. The single-writer check is loud.
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q2 = mem2.toDF.toDF("id").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$tmp/ckpt2")
      .start(t)
    mem2.addData(1L, 2L)
    val exw = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    def wmsgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ wmsgs(x.getCause))
    assert(wmsgs(exw).exists(_.contains("DIFFERENT streaming writer")),
      s"got ${wmsgs(exw)}")
    q2.stop()
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L),
      "the refused batch must not have landed")
    // only append mode: a groupBy-complete stream is rejected loudly
    val ex = intercept[Exception] {
      mem2.toDF.toDF("id").groupBy("id").count().writeStream
        .format("graft-manifest").outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt3").start(s"$tmp/t2")
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("append log")))
  }

  test("maxVersionsPerTrigger bounds each micro-batch; restart keeps the cursor") {
    val tmp = Files.createTempDirectory("graft-mfrate").toString
    val t = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    (1L to 6L).foreach(i =>
      ManifestTable.append(spark, Seq(i).toDF("id"), t))
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Seq[Long]]()
    def start() = spark.readStream.format("graft-manifest")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    // a 6-version backlog with limit 2 drains as exactly 3 bounded
    // micro-batches — never one unbounded bootstrap — and their union
    // is precisely the one-shot read
    assert(batches.keySet == Set(0L, 1L, 2L),
      s"expected 3 rate-limited batches, got ${batches.toMap}")
    assert(batches.values.forall(_.size == 2))
    assert(batches.values.flatten.toSeq.sorted ==
      ids(ManifestTable.read(spark, t)))
    // restart with a lagged backlog: the cursor resumes from the
    // CHECKPOINT (not zero), and the new backlog drains bounded too
    (7L to 9L).foreach(i =>
      ManifestTable.append(spark, Seq(i).toDF("id"), t))
    batches.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(batches.values.flatten.toSeq.sorted == Seq(7L, 8L, 9L),
      s"restart must deliver only post-checkpoint commits, got " +
        s"${batches.toMap}")
    assert(batches.size == 2 && batches.values.map(_.size).toSeq.sorted
      == Seq(1, 2),
      s"a 3-version lag with limit 2 drains as 2+1, got ${batches.toMap}")
  }

  test("maxVersionsPerTrigger steps through RETAINED versions on a vacuumed table") {
    val tmp = Files.createTempDirectory("graft-mfratevac").toString
    val t = s"$tmp/table"
    (1L to 6L).foreach(i =>
      ManifestTable.append(spark, Seq(i).toDF("id"), t))
    // vacuum sparsifies the version numbers: retained = v4, v5, v6.
    // Version ARITHMETIC (base + max) would name vacuumed v1 as the
    // first batch end and fail; counting through the retained list
    // must bootstrap at v4 then step v5, v6.
    ManifestTable.vacuum(spark, t, keepVersions = 3)
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Seq[Long]]()
    val q = spark.readStream.format("graft-manifest")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.keySet == Set(0L, 1L, 2L),
      s"bootstrap(v4) + v5 + v6 = 3 batches, got ${batches.toMap}")
    assert(batches(0L) == Seq(1L, 2L, 3L, 4L) &&
      batches(1L) == Seq(5L) && batches(2L) == Seq(6L),
      s"got ${batches.toMap}")
  }

  test("maxRowsPerTrigger sizes batches from recorded row counts; oversized commit delivers whole") {
    val tmp = Files.createTempDirectory("graft-mfrowrate").toString
    val t = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    // 6 commits x 10 rows
    (0L until 6L).foreach(i => ManifestTable.append(spark,
      (i * 10 until (i + 1) * 10).toDF("id"), t))
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Seq[Long]]()
    def start() = spark.readStream.format("graft-manifest")
      .option("maxRowsPerTrigger", "25").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    // a 60-row backlog with a 25-row cap drains as 3 batches of 2
    // commits (20 rows) each — versions are admitted until the next
    // would cross the cap — and the union is the one-shot read
    assert(batches.keySet == Set(0L, 1L, 2L),
      s"expected 3 row-capped batches, got ${batches.toMap}")
    assert(batches.values.forall(_.size == 20))
    assert(batches.values.flatten.toSeq.sorted ==
      ids(ManifestTable.read(spark, t)))
    // one commit LARGER than the cap still delivers whole (version
    // granularity, progress guaranteed), alone in its own batch
    ManifestTable.append(spark, (100L until 140L).toDF("id"), t)
    ManifestTable.append(spark, (140L until 150L).toDF("id"), t)
    batches.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(batches.size == 2 &&
      batches.values.map(_.size).toSeq.sorted == Seq(10, 40),
      s"expected the 40-row commit alone then the 10-row one, got " +
        s"${batches.toMap}")
  }

  test("maxBytesPerTrigger sizes batches from recorded file sizes") {
    val tmp = Files.createTempDirectory("graft-mfbyterate").toString
    val t = s"$tmp/table"
    // 4 equal-size commits; cap at just over two commits' bytes so
    // the backlog drains as 2 batches of 2 commits
    (0L until 4L).foreach(i => ManifestTable.append(spark,
      (i * 10 until (i + 1) * 10).toDF("id"), t))
    val perCommit = ManifestTable.entriesOf(spark, t, 1L)
      .flatMap(_.files).map(_.values.sum).sum
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Long]()
    val q = spark.readStream.format("graft-manifest")
      .option("maxBytesPerTrigger", (perCommit * 2 + 1).toString)
      .load(t)
      .writeStream.option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.count()); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.toMap == Map(0L -> 20L, 1L -> 20L),
      s"expected 2 byte-capped batches of 2 commits, got " +
        s"${batches.toMap}")
  }

  test("sink bloomCols: streaming-ingested dirs record Bloom filters; vacuum cadence reports") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-mfsinkbloom").toString
    val t = s"$tmp/table"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF.toDF("id").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$tmp/ckpt")
      .option("statsCols", "id")
      .option("bloomCols", "id")
      .option("vacuumEvery", "2")
      .option("keepVersions", "2")
      .start(t)
    mem.addData(4L, 8L); q.processAllAvailable()   // batch 0 -> v1
    mem.addData(5L, 9L); q.processAllAvailable()   // batch 1 -> v2
    mem.addData(6L, 10L); q.processAllAvailable()  // batch 2 -> v3 + vacuum
    q.stop()
    // every streaming-built dir carries its Bloom filter — the point
    // lookup prune a streaming-ingested interleaved table needs
    val v = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.entriesOf(spark, t, v)
      .forall(_.bloom.contains("id")),
      "streaming-ingested dirs must record bloomCols filters")
    // a point probe prunes below the full dir count, rows correct
    val p = ManifestTable.readPruned(spark, t, "id", 5L, 5L)
    assert(p.filter(col("id") === 5L).count() == 1)
    // the vacuum cadence surfaced its reap accounting (StreamingSpec's
    // alarm contract: runaway orphan creation must be observable)
    val rep = ManifestTable.lastVacuumReport
    assert(rep.exists(r => r.path == t && r.batchTag == 2L &&
      r.manifestsDropped == 1 && r.dirsReaped == 0),
      s"expected a batch-2 cadence report, got $rep")
  }

  test("streaming source applies pending deletion vectors; a dv commit delivers no rows") {
    val tmp = Files.createTempDirectory("graft-mfdvstream").toString
    val t = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    ManifestTable.append(spark, Seq(1L, 2L, 3L).toDF("id"), t,
      statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(4L, 5L).toDF("id"), t)
    ManifestTable.deleteKeys(spark, Seq(2L, 5L).toDF("id"), t, "id")
    val batches =
      new scala.collection.concurrent.TrieMap[Long, Seq[Long]]()
    def start() = spark.readStream.format("graft-manifest").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.select("id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    // bootstrap reads the CURRENT snapshot — tombstones applied (the
    // getBatch path routes through the same dv-aware readDirs)
    assert(batches.values.flatten.toSeq.sorted == Seq(1L, 3L, 4L))
    // a dv delete while streaming changes no dirs: the version
    // advances but the micro-batch diff is EMPTY (additive CDC — the
    // same contract as copy-on-write deletes after drain)
    ManifestTable.deleteKeys(spark, Seq(3L).toDF("id"), t, "id")
    ManifestTable.append(spark, Seq(6L).toDF("id"), t)
    q.processAllAvailable()
    q.stop()
    assert(batches.values.flatten.toSeq.sorted == Seq(1L, 3L, 4L, 6L),
      "the post-bootstrap dv delete must deliver nothing; the fresh " +
        "append must deliver exactly its rows")
  }

  test("a stream started on an empty path fails loudly; schema comes from the sidecar") {
    val tmp = Files.createTempDirectory("graft-mfstream2").toString
    val ex = intercept[RuntimeException] {
      spark.readStream.format("graft-manifest").load(s"$tmp/none")
    }
    assert(ex.getMessage.contains("commit once before starting"))
    val t = s"$tmp/table"
    ManifestTable.append(spark,
      Seq((1L, "a")).toDF("id", "s"), t)
    val df = spark.readStream.format("graft-manifest").load(t)
    assert(df.isStreaming && df.columns.toSeq == Seq("id", "s"))
  }

  test("stream-WAP: batches stage invisibly on a branch; audit reads " +
      "mid-stream; fast-forward publishes; replay skips through main") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-swap").toString
    val t = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    ManifestTable.append(spark, Seq(1L, 2L).toDF("id"), t,
      statsCols = Seq("id"))
    val mainFiles = ManifestTable.read(spark, t).inputFiles.toSet
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    def start(cp: String) = graft.streaming.Streams.branchSinkWriter(
      mem.toDF.toDF("id"), t, "ingest", cp,
      statsCols = Seq("id")).start()
    val q = start(ckpt)
    mem.addData(10L, 11L); q.processAllAvailable() // batch 0 -> c0001
    // AUDIT-READ ISOLATION mid-stream: main readers see only the
    // base, physically untouched; the auditor sees base + staged
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L))
    assert(ManifestTable.read(spark, t).inputFiles.toSet == mainFiles)
    assert(ids(ManifestTable.readBranch(spark, t, "ingest")) ==
      Seq(1L, 2L, 10L, 11L))
    mem.addData(12L); q.processAllAvailable()      // batch 1 -> c0002
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L),
      "main must stay oblivious while the stream stages")
    q.stop()
    // the audit gate: publish the staged window as ONE atomic commit
    ManifestTable.fastForwardBranch(spark, t, "ingest")
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 10L, 11L, 12L))
    assert(ManifestTable.branchNames(spark, t).isEmpty)
    // a RESET batchId under a fresh checkpoint AFTER the publish is
    // NOT a replay: the folded watermark was raised by the ORIGINAL
    // sink's identity, so the single-writer check refuses loudly
    // instead of silently dropping what could be new data
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q2 = graft.streaming.Streams.branchSinkWriter(
      mem2.toDF.toDF("id"), t, "ingest", s"$tmp/ckpt2").start()
    mem2.addData(10L, 11L)
    val exw = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    def wmsgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ wmsgs(x.getCause))
    assert(wmsgs(exw).exists(_.contains("DIFFERENT streaming writer")),
      s"got ${wmsgs(exw)}")
    q2.stop()
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 10L, 11L, 12L), "the refused batch must not land")
    assert(ids(ManifestTable.readBranch(spark, t, "ingest")) ==
      Seq(1L, 2L, 10L, 11L, 12L), "the refused batch must stage " +
        "NOTHING on the re-opened branch")
    // CRASH-BETWEEN-BATCHES RECOVERY: restart the ORIGINAL stream
    // from its retained checkpoint — the next fresh batch (id 2)
    // stages on the re-opened branch and a second audit publishes it
    val q3 = start(ckpt)
    mem.addData(13L); q3.processAllAvailable()
    q3.stop()
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 10L, 11L, 12L))
    assert(ids(ManifestTable.readBranch(spark, t, "ingest")) ==
      Seq(1L, 2L, 10L, 11L, 12L, 13L))
    ManifestTable.fastForwardBranch(spark, t, "ingest")
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 10L, 11L, 12L, 13L))
  }

  test("stream-WAP through the format API: option(branch) stages " +
      "invisibly; layout/vacuum knobs are refused loudly") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-swap3").toString
    val t = s"$tmp/table"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t,
      statsCols = Seq("id"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF.toDF("id").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$tmp/ckpt")
      .option("branch", "ingest")
      .option("statsCols", "id")
      .start(t)
    mem.addData(10L, 11L); q.processAllAvailable()
    q.stop()
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L),
      "main must stay oblivious to format-API branch staging")
    assert(ids(ManifestTable.readBranch(spark, t, "ingest")) ==
      Seq(1L, 10L, 11L))
    ManifestTable.fastForwardBranch(spark, t, "ingest")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L, 11L))
    // layout/vacuum knobs do not apply to a staging stream: loud
    val ex = intercept[Exception] {
      mem.toDF.toDF("id").writeStream
        .format("graft-manifest")
        .option("checkpointLocation", s"$tmp/ckpt2")
        .option("branch", "ingest")
        .option("vacuumEvery", "2")
        .start(t)
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("staging stream")),
      s"got ${msgs(ex)}")
  }

  test("auditBranch: the one-call auditor loop — publish on pass, " +
      "hold or abandon on fail, no-op on an empty branch") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-swap4").toString
    val t = s"$tmp/table"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t,
      statsCols = Seq("id"))
    // missing branch / commit-less branch: nothing to decide
    assert(graft.streaming.Streams.auditBranch(spark, t, "ingest",
      _ => sys.error("audit must not run")) == None)
    ManifestTable.createBranch(spark, t, "ingest")
    assert(graft.streaming.Streams.auditBranch(spark, t, "ingest",
      _ => sys.error("audit must not run on a commit-less branch"))
      == None)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = graft.streaming.Streams.branchSinkWriter(
      mem.toDF.toDF("id"), t, "ingest", s"$tmp/ckpt",
      statsCols = Seq("id")).start()
    mem.addData(10L, -5L); q.processAllAvailable()
    // the audit sees base + staged (corpus-level view) and REJECTS
    // (a negative id staged); the branch is held for a fix
    assert(graft.streaming.Streams.auditBranch(spark, t, "ingest",
      df => df.filter(col("id") < 0).isEmpty) == None)
    assert(ManifestTable.branchNames(spark, t).contains("ingest"),
      "reject without abandonOnReject must HOLD the branch")
    // the fix pass: branch DML drops the bad staged row; the next
    // audit cycle passes and publishes
    ManifestTable.deleteFromBranch(spark, t, "ingest", col("id") < 0)
    val v = graft.streaming.Streams.auditBranch(spark, t, "ingest",
      df => df.filter(col("id") < 0).isEmpty)
    assert(v.isDefined)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L))
    // the stream keeps going: next batch re-opens, a bad window with
    // abandonOnReject vanishes without a trace
    mem.addData(-7L); q.processAllAvailable()
    q.stop()
    assert(graft.streaming.Streams.auditBranch(spark, t, "ingest",
      df => df.filter(col("id") < 0).isEmpty,
      abandonOnReject = true) == None)
    assert(!ManifestTable.branchNames(spark, t).contains("ingest"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L))
  }

  test("stream-WAP crash window: a branch commit whose checkpoint " +
      "update was lost replays into a skip; bootstrap is refused") {
    val tmp = Files.createTempDirectory("graft-swap2").toString
    val t = s"$tmp/table"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t)
    // batch 0 stages, then the process dies BEFORE the checkpoint
    // write — the engine re-runs batch 0 on restart: the branch's
    // own tag watermark makes the re-run a no-op
    assert(ManifestTable.appendToBranchIfFresh(spark,
      Seq(7L).toDF("id"), t, "b", batchId = 0L))
    assert(!ManifestTable.appendToBranchIfFresh(spark,
      Seq(7L).toDF("id"), t, "b", batchId = 0L),
      "the replayed batch must skip on the branch tag watermark")
    assert(ids(ManifestTable.readBranch(spark, t, "b")) == Seq(1L, 7L),
      "exactly one staged copy across the crash window")
    // ... and AFTER the publish the skip holds through MAIN's
    // watermark (the branch no longer exists to remember the tag)
    ManifestTable.fastForwardBranch(spark, t, "b")
    assert(!ManifestTable.appendToBranchIfFresh(spark,
      Seq(7L).toDF("id"), t, "b", batchId = 0L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 7L))
    // a stream must not bootstrap a TABLE through a branch: there is
    // nothing to audit against
    val ex = intercept[Exception] {
      ManifestTable.appendToBranchIfFresh(spark,
        Seq(9L).toDF("id"), s"$tmp/none", "b", batchId = 0L)
    }
    assert(ex.getMessage.contains("no committed version"))
  }

  test("single-writer contract is MECHANICAL: a main-path sink beside " +
      "a branch sink on one table throws on its first batch") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-twowriters").toString
    val t = s"$tmp/table"
    ManifestTable.append(spark, Seq(1L).toDF("id"), t,
      statsCols = Seq("id"))
    def wmsgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ wmsgs(x.getCause))
    // the branch sink stages batches 0..1 and the auditor publishes —
    // its tags fold into MAIN's watermark under ITS writer identity
    val memB = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val qB = graft.streaming.Streams.branchSinkWriter(
      memB.toDF.toDF("id"), t, "ingest", s"$tmp/ckptB").start()
    memB.addData(10L); qB.processAllAvailable()
    memB.addData(11L); qB.processAllAvailable()
    ManifestTable.fastForwardBranch(spark, t, "ingest")
    assert(ManifestTable.latestTag(spark, t) == 1L)
    // a SECOND live streaming writer (main-path) starts beside it:
    // its batch 0 sits under the branch sink's folded watermark —
    // before this round that batch was SILENTLY SKIPPED (lost, its
    // checkpoint advanced); now the cross-writer skip throws
    val memM = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val qM = graft.streaming.Streams.manifestSinkWriter(
      memM.toDF.toDF("id"), t, s"$tmp/ckptM").start()
    memM.addData(99L)
    val exM = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qM.processAllAvailable()
    }
    assert(wmsgs(exM).exists(_.contains("DIFFERENT streaming writer")),
      s"got ${wmsgs(exM)}")
    qM.stop()
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L, 11L),
      "the refused batch must not land, and nothing must be lost")
    // ...and the branch-side check: a SECOND branch sink under a
    // fresh checkpoint refuses the same way (its batch 0 sits under
    // the folded watermark, which the original sink's identity owns)
    val memB2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val qB3 = graft.streaming.Streams.branchSinkWriter(
      memB2.toDF.toDF("id"), t, "ingest", s"$tmp/ckptB2").start()
    memB2.addData(77L)
    val exB = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qB3.processAllAvailable()
    }
    assert(wmsgs(exB).exists(_.contains("DIFFERENT streaming writer")))
    qB3.stop()
    // the ORIGINAL branch sink keeps running undisturbed (same
    // writer: replays skip quietly, fresh batches stage)
    memB.addData(12L); val qB2 = graft.streaming.Streams.branchSinkWriter(
      memB.toDF.toDF("id"), t, "ingest", s"$tmp/ckptB").start()
    qB2.processAllAvailable(); qB2.stop()
    assert(ids(ManifestTable.readBranch(spark, t, "ingest")) ==
      Seq(1L, 10L, 11L, 12L))
    qB.stop()
  }

  test("appendIfFresh writer identity: same-writer replays skip " +
      "quietly, anonymous callers keep the legacy skip, a " +
      "sequential writer replacement proceeds above the watermark") {
    val tmp = Files.createTempDirectory("graft-wid").toString
    val t = s"$tmp/table"
    assert(ManifestTable.appendIfFresh(spark, Seq(1L).toDF("id"), t,
      batchId = 5L, writerId = Some("ckptA")))
    // same writer, replay: quiet skip (the designed exactly-once)
    assert(!ManifestTable.appendIfFresh(spark, Seq(1L).toDF("id"), t,
      batchId = 5L, writerId = Some("ckptA")))
    // anonymous caller: legacy quiet skip
    assert(!ManifestTable.appendIfFresh(spark, Seq(1L).toDF("id"), t,
      batchId = 5L))
    // different writer at/below the watermark: LOUD
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.appendIfFresh(spark, Seq(2L).toDF("id"), t,
        batchId = 3L, writerId = Some("ckptB"))
    }
    assert(ex.getMessage.contains("DIFFERENT streaming writer"))
    // a REPLACEMENT writer whose batchIds exceed the watermark is a
    // legitimate sequential handover — proceeds and takes ownership
    assert(ManifestTable.appendIfFresh(spark, Seq(6L).toDF("id"), t,
      batchId = 6L, writerId = Some("ckptB")))
    assert(!ManifestTable.appendIfFresh(spark, Seq(6L).toDF("id"), t,
      batchId = 6L, writerId = Some("ckptB")))
    val ex2 = intercept[IllegalArgumentException] {
      ManifestTable.appendIfFresh(spark, Seq(9L).toDF("id"), t,
        batchId = 6L, writerId = Some("ckptA"))
    }
    assert(ex2.getMessage.contains("DIFFERENT streaming writer"))
  }
}
