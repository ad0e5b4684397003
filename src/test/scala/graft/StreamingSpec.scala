package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodRecord =
    """{"cveMetadata":{"cveId":"CVE-2024-1111","datePublished":"2024-01-01T00:00:00.000Z","dateUpdated":"2024-01-02T00:00:00.000Z"},"containers":{"cna":{"title":"t","descriptions":[{"value":"d"}],"metrics":[{"cvssV3_1":{"baseScore":5.0,"baseSeverity":"MEDIUM"}}],"problemTypes":[{"descriptions":[{"cweId":"CWE-79"}]}]}}}"""
  private val corruptRecord = """{"not json at all"""

  test("W2 exact: inactivity timeout stops the query after a quiet period") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val tmp = Files.createTempDirectory("graft-inactive").toString
    val parsed = Streams.parseCve(mem.toDF)
    val q = Streams.dualSinkWriter(parsed, s"$tmp/raw", s"$tmp/meta",
      s"$tmp/dlq", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    mem.addData(goodRecord)
    // late arrival while the monitor is watching: must extend the clock
    // and be processed before the stop (idle window sized generously —
    // the FIRST micro-batch of a cold session can take seconds)
    new Thread(() => { Thread.sleep(2000); mem.addData(goodRecord) }).start()
    Streams.stopAfterInactivity(q, idleMs = 8000)
    assert(!q.isActive)
    assert(spark.read.parquet(s"$tmp/raw").count() === 2)
  }

  test("streaming content dedup persists fingerprints across restarts") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dedup-sink").toString
    val dup = "the same doc text"
    // run 1: batch with an internal duplicate
    val mem1 = MemoryStream[(Long, String)]
    mem1.addData((1L, dup), (2L, dup), (3L, "unique one"))
    val q1 = Streams.dedupSinkWriter(
      mem1.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt1").start()
    q1.processAllAvailable(); q1.stop()
    val afterRun1 = spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted
    // in-batch dedup kept the lowest doc_id per content
    assert(afterRun1.toSeq === Seq(1L, 3L))
    // run 2: FRESH checkpoint (simulates checkpoint loss / a new job) —
    // a state-store dedup would forget; the fingerprint table must not
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((9L, dup), (10L, "another unique"))
    val q2 = Streams.dedupSinkWriter(
      mem2.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt2").start()
    q2.processAllAvailable(); q2.stop()
    val afterRun2 = spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted
    assert(afterRun2.toSeq === Seq(1L, 3L, 10L),
      "doc 9 duplicates run-1 content and must be dropped")
    // the fingerprint table holds exactly the admitted contents
    assert(spark.read.parquet(s"$tmp/fp").distinct().count() === 3L)
  }

  test("sink recovers a compaction-interrupted fingerprint table") {
    // The crash window: compactParquet renamed fp aside (.precompact)
    // but died before swapping the compacted copy in. A sink that
    // treated the absent path as "empty table" would re-admit every
    // duplicate and the next compaction's cleanup would delete the
    // stranded copy — the whole dedup history, gone silently.
    // readOrEmpty must rename the copy back instead.
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dedup-crash").toString
    val dup = "the same doc text"
    val mem1 = MemoryStream[(Long, String)]
    mem1.addData((1L, dup), (2L, "unique one"))
    val q1 = Streams.dedupSinkWriter(
      mem1.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt1").start()
    q1.processAllAvailable(); q1.stop()
    // strand the fp table exactly as the between-renames crash would
    assert(new java.io.File(s"$tmp/fp")
      .renameTo(new java.io.File(s"$tmp/fp.precompact")))
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((9L, dup), (10L, "another unique"))
    val q2 = Streams.dedupSinkWriter(
      mem2.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt2").start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 10L),
      "doc 9 duplicates pre-crash content and must still be dropped")
    assert(!new java.io.File(s"$tmp/fp.precompact").exists())
  }

  test("dedup sink cadence compacts only the re-scanned fp table") {
    // outPath is never read by this sink — compacting it in-batch
    // would be a full-table rewrite on the hot path for zero per-batch
    // benefit. The cadence must reset fp's file count and leave the
    // corpus's one-file-per-batch appends alone.
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dedup-cadence").toString
    val mem = MemoryStream[(Long, String)]
    val q = Streams.dedupSinkWriter(
      mem.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt",
      compactEvery = 2).start()
    (1 to 4).foreach { i =>
      mem.addData((i.toLong, s"content $i distinct body"))
      q.processAllAvailable()
    }
    q.stop()
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(_.getName.endsWith(".parquet"))
    // 4 batches, cadence fired at batch 3 (batchId 2): fp was reset to
    // minFiles and has since gained one append file; out holds its 4
    // untouched per-batch appends
    assert(dataFiles(s"$tmp/fp") <=
      spark.sparkContext.defaultParallelism + 1)
    assert(dataFiles(s"$tmp/out") === 4,
      "corpus compaction is offline maintenance, not the sink's hot path")
    assert(spark.read.parquet(s"$tmp/out").count() === 4L)
  }

  test("table-backed sinks append ONE file per micro-batch") {
    // The fp/band/corpus tables are re-scanned by EVERY later batch,
    // so their file count is a compounding per-batch cost — the
    // 200-batch admission probe measured multi-file appends doubling
    // steady-state batch time from listing/footer overhead alone
    // (STREAMBENCH.md). Pin the one-file-per-append shape.
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-sink-files").toString
    val mem = MemoryStream[(Long, String)]
    val q = Streams.dedupSinkWriter(
      mem.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/fp", s"$tmp/ckpt").start()
    (1 to 3).foreach { i =>
      mem.addData((i.toLong, s"content $i distinct body"))
      q.processAllAvailable()
    }
    q.stop()
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles(s"$tmp/fp") === 3,
      "fp table must gain exactly one file per batch")
    assert(dataFiles(s"$tmp/out") === 3,
      "corpus table must gain exactly one file per batch")
  }

  test("compactEvery bounds sink table file counts, semantics intact") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-sink-compact").toString
    val base = "the quick brown fox jumps over the lazy dog again today"
    val mem = MemoryStream[(Long, String)]
    val q = Streams.nearDupSinkWriter(
      mem.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/bands", s"$tmp/ckpt", minJaccard = 0.5,
      compactEvery = 2).start()
    // 5 batches: batch 0 seeds `base`; batch 3 replays a NEAR-dup of
    // it — it must still be dropped when the tables it is checked
    // against have been through a compaction swap (batch 2)
    val texts = Seq(
      1L -> base,
      2L -> "completely different material with many distinct words here",
      3L -> "a third body of text sharing nothing with the others at all",
      4L -> (base.dropRight(5) + " soon"),
      5L -> "fifth and final fully novel content block for this stream")
    texts.foreach { t => mem.addData(t); q.processAllAvailable() }
    q.stop()
    assert(spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 5L),
      "doc 4 near-duplicates compacted-in content and must be dropped")
    // without compaction each table would carry 5 files (one per
    // batch); compaction at batches 2 and 4 resets the count to at
    // most minFiles (= defaultParallelism — the scan-parallelism floor)
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    val par = spark.sparkContext.defaultParallelism
    assert(dataFiles(s"$tmp/bands") <= par)
    assert(dataFiles(s"$tmp/out") <= par)
    // swap scaffolding cleaned up
    assert(!new java.io.File(s"$tmp/bands.precompact").exists())
    assert(!new java.io.File(s"$tmp/out.compacting").exists())
  }

  test("streaming near-dup sink drops near-duplicates of admitted content") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-neardup-sink").toString
    val base = "the quick brown fox jumps over the lazy dog again today"
    val near = "the quick brown fox jumps over the lazy dog again tomorrow"
    val other = "completely different material with many distinct words here"
    // run 1: batch holds a near-dup pair (base/near) + unrelated content
    val mem1 = MemoryStream[(Long, String)]
    mem1.addData((1L, base), (2L, near), (3L, other))
    val q1 = Streams.nearDupSinkWriter(
      mem1.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/bands", s"$tmp/ckpt1", minJaccard = 0.5).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L),
      "intra-batch near-dup (doc 2) must be dropped")
    // run 2: FRESH checkpoint (checkpoint loss) — the parquet corpus +
    // band tables alone must still drop a near-dup of run-1 content
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((9L, near),
      (10L, "fresh unique incoming content nothing like the rest at all"))
    val q2 = Streams.nearDupSinkWriter(
      mem2.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/bands", s"$tmp/ckpt2", minJaccard = 0.5).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 10L),
      "doc 9 near-duplicates run-1 content and must be dropped")
    // band table holds rows only for admitted docs
    assert(spark.read.parquet(s"$tmp/bands")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 10L))
    // REPLAY idempotence: re-processing an already-committed batch
    // (same docs, same ids — the crash-before-checkpoint-commit case)
    // must admit nothing and leave both tables unchanged
    val mem3 = MemoryStream[(Long, String)]
    mem3.addData((1L, base), (3L, other))
    val q3 = Streams.nearDupSinkWriter(
      mem3.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/bands", s"$tmp/ckpt3", minJaccard = 0.5).start()
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(s"$tmp/out").count() === 3L,
      "replayed docs must not duplicate corpus rows")
    assert(spark.read.parquet(s"$tmp/bands")
      .select("doc_id").distinct().count() === 3L)
    // CRASH between the two appends: band rows committed, corpus
    // append lost (bands are written first by design). The replayed
    // batch must re-admit the doc — its fp is absent from the corpus —
    // but must NOT append its band rows a second time: the fp replay
    // guard only consults the corpus table, so without the doc_id
    // anti-join the band table would accumulate duplicates across
    // crash/replay cycles.
    val doc20 =
      "entirely new survivor content with plenty of distinct words to band"
    val orphanBands = graft.dedup.NearDup.bands(
      Seq((20L, doc20)).toDF("doc_id", "text")).cache()
    val n20 = orphanBands.count()
    orphanBands.write.mode("append").parquet(s"$tmp/bands")
    orphanBands.unpersist()
    val mem4 = MemoryStream[(Long, String)]
    mem4.addData((20L, doc20))
    val q4 = Streams.nearDupSinkWriter(
      mem4.toDF.toDF("doc_id", "text"),
      s"$tmp/out", s"$tmp/bands", s"$tmp/ckpt4", minJaccard = 0.5).start()
    q4.processAllAvailable(); q4.stop()
    assert(spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 10L, 20L),
      "doc 20's corpus append was lost — the replay must re-admit it")
    assert(spark.read.parquet(s"$tmp/bands")
      .filter(col("doc_id") === 20L).count() === n20,
      "the replay must not duplicate doc 20's band rows")
  }

  test("W5: corrupt records split to DLQ instead of failing the stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(goodRecord, corruptRecord)
    val parsed = Streams.parseCve(mem.toDF.withColumnRenamed("value", "value"))
    val tmp = Files.createTempDirectory("graft-stream").toString
    val q = Streams.dualSinkWriter(parsed, s"$tmp/raw", s"$tmp/meta",
      s"$tmp/dlq", s"$tmp/ckpt").trigger(Streams.drainTrigger).start()
    q.awaitTermination()
    val raw = spark.read.parquet(s"$tmp/raw")
    val meta = spark.read.parquet(s"$tmp/meta")
    val dlq = spark.read.parquet(s"$tmp/dlq")
    assert(raw.count() == 1 && meta.count() == 1 && dlq.count() == 1)
    assert(meta.select("cve_id").collect()(0).getString(0) == "CVE-2024-1111")
    assert(dlq.select("raw").collect()(0).getString(0) == corruptRecord)
  }

  test("W4: restart with same checkpoint does not re-ingest drained data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(goodRecord)
    val tmp = Files.createTempDirectory("graft-stream-ck").toString
    def run(): Unit = {
      val q = Streams.dualSinkWriter(Streams.parseCve(mem.toDF),
        s"$tmp/raw", s"$tmp/meta", s"$tmp/dlq", s"$tmp/ckpt")
        .trigger(Streams.drainTrigger).start()
      q.awaitTermination()
    }
    run()
    run() // no new offsets -> no new rows
    assert(spark.read.parquet(s"$tmp/meta").count() == 1)
  }

  test("tumbling windows aggregate by event-time bucket") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:04:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:11:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 00:12:00"), "view", 8.0))
    val events = mem.toDF.toDF("ts", "event_type", "value")
    val out = Streams.drainToTable(spark,
      Streams.tumblingCounts(events), "tumbling_test")
      .orderBy("win_start", "event_type").collect()
      .map(r => (r.getAs[Timestamp]("win_start").toString,
        r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 00:10:00.0", "click", 1L, 4.0),
      ("2024-01-01 00:10:00.0", "view", 1L, 8.0)))
  }

  test("sliding windows place each event in width/slide windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData((Timestamp.valueOf("2024-01-01 00:07:00"), "click"))
    val events = mem.toDF.toDF("ts", "event_type")
    val out = Streams.drainToTable(spark,
      Streams.slidingCounts(events, width = "10 minutes",
        slide = "5 minutes"), "sliding_test")
      .orderBy("win_start").collect()
      .map(r => r.getAs[Timestamp]("win_start").toString)
    // a 00:07 event falls in the 00:00-00:10 and 00:05-00:15 windows
    assert(out.toSeq == Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"))
  }

  test("session windows split on gaps, keyed by user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 00:10:00"), 1L), // same session (gap 30m)
      (Timestamp.valueOf("2024-01-01 02:00:00"), 1L), // new session
      (Timestamp.valueOf("2024-01-01 00:05:00"), 2L))
    val events = mem.toDF.toDF("ts", "user_id")
    val out = Streams.drainToTable(spark,
      Streams.sessionCounts(events), "session_test")
      .orderBy("user_id", "sess_start").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    assert(out.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions only") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = Streams.statefulSessions(mem.toDS().toDF("_1", "_2")
      .as[(Long, Timestamp)], gapUs = 30L * 60 * 1000 * 1000)
    val q = out.writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    // batch 1: two sessions' worth of events for user 1, one for user 2
    mem.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:10:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // nothing closed yet (watermark has not advanced)
    assert(spark.table("sess_state").count() == 0)
    // batch 2: a much later event closes user 1's first session inline
    // and advances the watermark so user 2's session times out
    mem.addData((1L, Timestamp.valueOf("2024-01-01 03:00:00")))
    q.processAllAvailable()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 06:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_state")
      .orderBy("user_id", "start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 1: first session had 2 events; user 2: timed-out session of 1
    assert(rows.contains((1L, 2L)))
    assert(rows.contains((2L, 1L)))
  }

  test("sessionizer handles above-watermark out-of-order events") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = Streams.statefulSessions(mem.toDS().toDF("_1", "_2")
      .as[(Long, Timestamp)], gapUs = 30L * 60 * 1000 * 1000,
      watermark = "6 hours")
    val q = out.writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 02:00:00")))
    q.processAllAvailable()
    // batch 2, both above the 6h watermark: 01:45 is within gap of the
    // open session's start -> merges BACKWARDS (start moves to 01:45);
    // 00:00 is >gap before start -> emitted as its own closed session
    mem.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 01:45:00")))
    q.processAllAvailable()
    // far-future event closes the merged session inline
    mem.addData((1L, Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    val rows = spark.table("sess_ooo")
      .select("user_id", "n_events", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows.contains((1L, 1L, us("2024-01-01 00:00:00"),
      us("2024-01-01 00:00:00"))))
    assert(rows.contains((1L, 2L, us("2024-01-01 01:45:00"),
      us("2024-01-01 02:00:00"))))
  }

  test("sessionizer merges multiple late events into one closed session") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = Streams.statefulSessions(mem.toDS().toDF("_1", "_2")
      .as[(Long, Timestamp)], gapUs = 30L * 60 * 1000 * 1000,
      watermark = "12 hours")
    val q = out.writeStream.format("memory").queryName("sess_late2")
      .outputMode("append").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 06:00:00")))
    q.processAllAvailable()
    // two late events within gap of EACH OTHER but both >gap before
    // the open session: they must close as ONE two-event session
    mem.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:20:00")))
    q.processAllAvailable()
    q.stop()
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    val rows = spark.table("sess_late2")
      .select("user_id", "n_events", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows === Set((1L, 2L, us("2024-01-01 00:00:00"),
      us("2024-01-01 00:20:00"))))
  }

  test("stream-stream interval join matches within the time band only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val errors = MemoryStream[(Long, Timestamp)]
    val joined = Streams.intervalJoin(
      clicks.toDF.toDF("user_id", "ts"),
      errors.toDF.toDF("user_id", "ts"),
      key = "user_id", before = "10 minutes", after = "10 minutes")
      .select(col("user_id"), col("l_ts").as("click_ts"),
        col("r_ts").as("error_ts"))
    val q = joined.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    clicks.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00")))
    errors.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:05:00")), // in band
      (1L, Timestamp.valueOf("2024-01-01 01:00:00")), // out of band
      (2L, Timestamp.valueOf("2024-01-01 00:09:00")), // in band
      (3L, Timestamp.valueOf("2024-01-01 00:01:00"))) // no left key
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ij_test")
      .select("user_id", "error_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(rows === Set(
      (1L, "2024-01-01 00:05:00.0"),
      (2L, "2024-01-01 00:09:00.0")))
  }

  test("interval join honors a custom event-time column name") {
    implicit val sq = spark.sqlContext
    val l = MemoryStream[(Long, Timestamp)]
    val r = MemoryStream[(Long, Timestamp)]
    val joined = Streams.intervalJoin(
      l.toDF.toDF("k", "evt"), r.toDF.toDF("k", "evt"),
      key = "k", before = "5 minutes", after = "5 minutes",
      tsCol = "evt")
      .select(col("k"), col("l_evt"), col("r_evt"))
    val q = joined.writeStream.format("memory").queryName("ij_ts_test")
      .outputMode("append").start()
    l.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00")))
    r.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:03:00")),  // in band
      (1L, Timestamp.valueOf("2024-01-01 00:30:00")))  // out of band
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ij_ts_test").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSeq
    assert(rows === Seq((1L, "2024-01-01 00:03:00.0")))
  }

  test("streaming dedup drops repeated (cve_id, date_updated) within watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(("CVE-1", t0), ("CVE-1", t0), ("CVE-2", t0))
    val meta = mem.toDF.toDF("cve_id", "date_updated")
    val out = Streams.drainToTable(spark,
      Streams.streamingDedup(meta), "dedup_test", complete = false)
    assert(out.count() == 2)
  }

  test("stream-static enrich left-joins the dim per batch, state-free") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"), (9L, "c"))
    val stream = mem.toDF.toDF("id", "v")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("id", "name")
    val out = Streams.drainToTable(spark,
      Streams.enrich(stream, dim, "id"), "enrich_test", complete = false)
    val got = out.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    // matched rows enriched; the unmatched stream row survives (left)
    assert(got == Seq((1L, "a", Some("one")), (2L, "b", Some("two")),
      (9L, "c", None)))
  }

  test("streaming ANN index sink appends each vector once and serves it") {
    import graft.vector.IvfPq
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ann-sink").toString
    val d = "/root/testdata/sf0.001"
    val corpus = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val delta = corpus.filter(col("vec_id") % 5 === 0)
    val path = s"$tmp/index"
    IvfPq.ensureBuilt(spark, base, m = 8, k = 16, nCentroids = 4,
      kmIters = 2, path)
    // the delta arrives as two micro-batches, then batch 1's rows
    // REPLAY (an at-least-once upstream re-delivery)
    val rows = delta.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])]
    // compactEvery=2: the cadence fires on batch 2 (the replay batch),
    // so the equality checks below also prove compaction preserves
    // index content mid-stream
    val q = Streams.annIndexSinkWriter(
      mem.toDF.toDF("vec_id", "embedding"), path, s"$tmp/ckpt",
      compactEvery = 2).start()
    mem.addData(b1.toSeq); q.processAllAvailable()
    mem.addData(b2.toSeq); q.processAllAvailable()
    mem.addData(b1.toSeq); q.processAllAvailable()
    q.stop()
    // post-compaction layout: exactly one file per bucket directory
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .foreach { b =>
        assert(b.listFiles().count(_.getName.endsWith(".parquet")) === 1,
          s"bucket ${b.getName} must compact to one file")
      }
    // every corpus row indexed exactly once — the replay was a no-op
    val idx = spark.read.parquet(path)
    assert(idx.count() == corpus.count())
    assert(idx.select("vec_id").distinct().count() == corpus.count())
    // the streamed index equals q117's one-shot append of the same
    // delta (frozen quantizers make rows per-row functions — batch
    // boundaries, like file layout, are unobservable)
    val oneShot = s"$tmp/oneshot"
    IvfPq.ensureBuilt(spark, base, m = 8, k = 16, nCentroids = 4,
      kmIters = 2, oneShot)
    IvfPq.append(spark, oneShot, delta)
    def content(p: String) = spark.read.parquet(p)
      .select("vec_id", "embedding", "codes", "gen", "bucket")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq,
        r.getSeq[Int](2).toSeq, r.getLong(3), r.getInt(4))).toSeq
    assert(content(path) == content(oneShot))
    // streamed-in vectors serve immediately: each delta query's rank-1
    // is its exact zero-distance self-hit
    val queries = delta.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val self = IvfPq.probe(spark, path, IvfPq.centroidsOf(spark, path),
      queries, m = 8, topK = 5, nProbe = 4, shortlist = 50)
      .filter(col("rk") === 1).collect()
    assert(self.nonEmpty && self.forall(r =>
      r.getLong(0) == r.getLong(2) && r.getDouble(3) == 0.0))
  }

  test("streaming keyword-index sink posts each doc once and serves it") {
    import graft.text.InvertedIndex
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kw-sink").toString
    val postings = s"$tmp/postings"
    val b1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
    val b2 = Seq((3L, "alpha gamma beta"), (4L, "delta beta"))
    val mem = MemoryStream[(Long, String)]
    // compactEvery=2: the recluster cadence fires on batch 2 (the
    // replay batch), so the checks below also prove the layout swap
    // preserves posting content mid-stream
    val q = Streams.keywordIndexSinkWriter(
      mem.toDF.toDF("doc_id", "text"), postings, s"$tmp/ckpt",
      compactEvery = 2, reclusterFiles = 2).start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable() // at-least-once replay
    q.stop()
    // replay was a no-op: postings are one row per (term, doc), and
    // match the one-shot build of the same corpus exactly
    val docs = (b1 ++ b2).toDF("doc_id", "text")
    val oneShot = s"$tmp/oneshot"
    InvertedIndex.build(docs, oneShot, 2)
    def content(p: String) = spark.read.parquet(p)
      .select("term", "doc_id").as[(String, Long)].collect().sorted.toSeq
    assert(content(postings) == content(oneShot))
    // post-recluster layout: the cadence rewrote to the target slice
    // count (batch files would otherwise keep accumulating)
    assert(new java.io.File(postings).listFiles()
      .count(_.getName.endsWith(".parquet")) === 2)
    // streamed-in docs serve: conjunctive search over the live table
    assert(InvertedIndex.search(spark, postings, docs,
      Seq("alpha", "beta")).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(InvertedIndex.search(spark, postings, docs, Seq("delta"))
      .select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("CMS sink: exactly-once under replay, bit-identical to the one-shot build") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cms-sink").toString
    val counters = s"$tmp/counters"
    val hot = "the hot banner line repeats"
    val b1 = Seq((1L, hot), (2L, "unique one text alpha beta"))
    val b2 = Seq((3L, hot), (4L, "another unique gamma delta run"))
    def table(p: String) = spark.read.parquet(p)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    // run 1: two incremental batches
    val mem1 = MemoryStream[(Long, String)]
    val q1 = Streams.cmsSinkWriter(mem1.toDF.toDF("doc_id", "text"),
      counters, s"$tmp/ckpt1").start()
    mem1.addData(b1); q1.processAllAvailable()
    mem1.addData(b2); q1.processAllAvailable()
    q1.stop()
    val afterRun1 = table(counters)
    // run 2: already-applied data redelivered under a RESET batchId
    // (the checkpoint-loss redelivery shape) — the watermark must make
    // the increment a no-op, where an anti-join cannot help counters
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streams.cmsSinkWriter(mem2.toDF.toDF("doc_id", "text"),
      counters, s"$tmp/ckpt2").start()
    mem2.addData(b1); q2.processAllAvailable()
    q2.stop()
    assert(table(counters) == afterRun1, "replayed batch must not re-count")
    // streamed counters are BIT-identical to a one-shot build of the
    // same corpus (integer merge is order-free): same sink, one batch
    val mem3 = MemoryStream[(Long, String)]
    val q3 = Streams.cmsSinkWriter(mem3.toDF.toDF("doc_id", "text"),
      s"$tmp/oneshot", s"$tmp/ckpt3").start()
    mem3.addData(b1 ++ b2); q3.processAllAvailable()
    q3.stop()
    assert(table(counters) == table(s"$tmp/oneshot"))
    // each depth row's counters sum to the total n-gram occurrences
    val totalShingles = (b1 ++ b2).map(_._2.split("\\s+").length - 2).sum
    spark.read.parquet(counters).groupBy("j").agg(sum("cnt").as("s"))
      .as[(Int, Long)].collect()
      .foreach { case (j, s) => assert(s == totalShingles, s"row $j") }
    // estimates: never under the true count; the hot 3-grams (2 docs
    // each) read exactly 2 under this low-collision config
    val est = Streams.cmsEstimates(spark, counters,
      Seq("the hot banner", "unique one text", "zzz not there")
        .toDF("shingle"), "shingle")
      .as[(String, Long)].collect().toMap
    assert(est("the hot banner") == 2L)
    assert(est("unique one text") == 1L)
    assert(est("zzz not there") == 0L)
    // crash between the swap's renames: the table sits under
    // .precompact; the next batch must repair it, not restart from zero
    assert(new java.io.File(counters)
      .renameTo(new java.io.File(s"$counters.precompact")))
    val mem4 = MemoryStream[(Long, String)]
    val q4 = Streams.cmsSinkWriter(mem4.toDF.toDF("doc_id", "text"),
      counters, s"$tmp/ckpt4").start()
    mem4.addData(b1); q4.processAllAvailable()
    q4.stop()
    assert(table(counters) == afterRun1)
    assert(!new java.io.File(s"$counters.precompact").exists())
    // a sink restarted with DIFFERENT sketch params must refuse the
    // table loudly — merging incompatible bucket spaces would split
    // counts across hash spaces and break est >= true silently
    val mem5 = MemoryStream[(Long, String)]
    val q5 = Streams.cmsSinkWriter(mem5.toDF.toDF("doc_id", "text"),
      counters, s"$tmp/ckpt5", width = 2048).start()
    mem5.addData(b2)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q5.processAllAvailable()
    }
    assert(ex.getMessage.contains("incompatible") ||
      Option(ex.getCause).exists(_.getMessage.contains("incompatible")))
    q5.stop()
    assert(table(counters) == afterRun1, "failed batch must not mutate")
  }

  test("manifest sink: each batch is one atomic snapshot; replay skips on the tag") {
    import graft.sinks.ManifestTable
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-manifest-sink").toString
    val t = s"$tmp/table"
    val b1 = Seq((1L, "a"), (2L, "b"))
    val b2 = Seq((3L, "c"))
    def ids() = ManifestTable.read(spark, t)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b3 = Seq((4L, "d"))
    val mem1 = MemoryStream[(Long, String)]
    val q1 = Streams.manifestSinkWriter(mem1.toDF.toDF("doc_id", "text"),
      t, s"$tmp/ckpt1", statsCols = Seq("doc_id"),
      vacuumEvery = 2, keepVersions = 1).start()
    mem1.addData(b1); q1.processAllAvailable()
    // snapshot isolation mid-stream: resolve v1 now...
    val snap = ManifestTable.read(spark, t)
    mem1.addData(b2); q1.processAllAvailable()
    mem1.addData(b3); q1.processAllAvailable() // batch 2: vacuum fires
    q1.stop()
    assert(ids() == Seq(1L, 2L, 3L, 4L))
    // the vacuum cadence bounded the version count to keepVersions,
    // but every data dir is still referenced by the kept snapshot —
    // the resolved mid-stream reader below is unaffected
    assert(ManifestTable.versions(spark, t) == Seq(3L))
    assert(snap.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L), "mid-stream reader must keep its committed prefix")
    // a reset batchId under a FRESH checkpoint is not a replay: the
    // watermark belongs to the original sink's identity, so the
    // single-writer check refuses loudly instead of silently
    // dropping what could be new data
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streams.manifestSinkWriter(mem2.toDF.toDF("doc_id", "text"),
      t, s"$tmp/ckpt2", statsCols = Seq("doc_id")).start()
    mem2.addData(b1)
    val exw = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    def wmsgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ wmsgs(x.getCause))
    assert(wmsgs(exw).exists(_.contains("DIFFERENT streaming writer")),
      s"got ${wmsgs(exw)}")
    q2.stop()
    assert(ids() == Seq(1L, 2L, 3L, 4L))
    assert(ManifestTable.latestTag(spark, t) == 2L)
    // the recorded per-batch stats prune: ids >= 3 live in the later
    // batches' dirs only
    assert(ManifestTable.readPruned(spark, t, "doc_id", 3L, 99L)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }
}
