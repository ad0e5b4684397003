package graft.streaming

import graft.model.Cve
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming re-expression of the reference's Kafka consumer
  * pipeline (SURVEY.md §2.10):
  *
  *  - W1 micro-batch poll loop (1 s `consumer.poll`,
  *    `/root/reference/consumer/consumer.py:131`) -> `Trigger.ProcessingTime`;
  *  - W2 drain-then-stop (10 s inactivity timeout,
  *    `/root/reference/airflow/dags/src/consumer.py:129-155`) ->
  *    `Trigger.AvailableNow` (drain all available offsets, then stop —
  *    the documented deviation: exact inactivity semantics would need a
  *    StreamingQueryListener);
  *  - W3 dual-sink routing (same topic to Snowflake and Pinecone via two
  *    consumer groups, `airflow/dags/etl.py:125-138`) -> one stream, one
  *    `foreachBatch` writing both tables (atomic per micro-batch), or two
  *    independently checkpointed queries;
  *  - W4 at-least-once from earliest -> `startingOffsets=earliest` +
  *    checkpointing (exactly-once into file sinks);
  *  - W5 per-record error isolation (try/except-per-message,
  *    `consumer/consumer.py:111-125`) -> PERMISSIVE `from_json`: corrupt
  *    records parse to null and are split to a dead-letter output instead
  *    of killing the query.
  *
  * Scale notes (100 TB / 1000 executors): every transform here is a
  * stateless per-row projection except the windowed aggregations, whose
  * state is bounded by watermarks; `foreachBatch` writes partitioned
  * parquet appends, so sink parallelism follows the batch's partitioning
  * (repartition by a stable key before heavy sinks to avoid small files).
  */
object Streams {

  /** Parse a raw string-valued stream (Kafka `value` / file lines) into
    * [[Cve.cveSchema]] columns plus the raw payload. Corrupt rows keep
    * `parsed` null — route them with [[splitCorrupt]]. */
  def parseCve(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.withColumn("parsed", from_json(col(valueCol), Cve.cveSchema))

  /** W5: split good/corrupt. Good rows are flattened to schema columns;
    * corrupt rows (unparseable JSON or missing cveId) carry the raw
    * payload for the dead-letter sink. */
  def splitCorrupt(parsed: DataFrame, valueCol: String = "value")
      : (DataFrame, DataFrame) = {
    val ok = parsed
      .filter(col("parsed").isNotNull &&
        col("parsed.cveMetadata.cveId").isNotNull)
      .select(col("parsed.*"))
    val dlq = parsed
      .filter(col("parsed").isNull ||
        col("parsed.cveMetadata.cveId").isNull)
      .select(col(valueCol).as("raw"))
    (ok, dlq)
  }

  /** W3: the dual-sink ingest — one micro-batch writes BOTH the raw
    * VARIANT-style table (K1, `processor.py:48-58`) and the extracted
    * silver table (K2 embedding metadata, `consumer/consumer.py:92-104`),
    * plus a dead-letter table for corrupt rows. One checkpoint = one
    * consumer group; the write pair is per-batch atomic-enough for
    * at-least-once parquet appends keyed by batch id. */
  def dualSinkWriter(parsed: DataFrame, rawPath: String, metaPath: String,
      dlqPath: String, checkpoint: String): DataStreamWriter[Row] =
    parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // three sinks consume the same micro-batch: persist once so the
        // source (Kafka at scale) is read once, not three times
        batch.persist()
        try {
          val (ok, dlq) = splitCorrupt(batch)
          Cve.rawPersist(ok).write.mode("append").parquet(rawPath)
          Cve.extractMeta(ok).write.mode("append").parquet(metaPath)
          dlq.write.mode("append").parquet(dlqPath)
        } finally batch.unpersist()
        ()
      }

  /** W1: the 1 s micro-batch cadence. */
  val pollTrigger: Trigger = Trigger.ProcessingTime("1 second")

  /** W2: drain everything available, then stop. */
  val drainTrigger: Trigger = Trigger.AvailableNow()

  /** W2, exact variant: block until `idleMs` passes with no new input
    * rows, then stop the query — the reference consumer's
    * inactivity-timeout drain (`airflow/dags/src/consumer.py:129-155`:
    * keep polling, exit after 10 s without a record) reproduced
    * precisely, where [[drainTrigger]] is the one-shot approximation
    * that cannot notice data arriving AFTER the drain began. Use with
    * [[pollTrigger]] so new arrivals keep resetting the clock.
    *
    * Driver-side monitor (the correct place for a stop decision):
    * watches `recentProgress` for batches with rows and extends the
    * deadline on each; progress events are tiny driver metadata, so
    * polling them costs nothing at any scale. */
  def stopAfterInactivity(query: org.apache.spark.sql.streaming.StreamingQuery,
      idleMs: Long, pollMs: Long = 100): Unit = {
    var deadline = System.nanoTime() + idleMs * 1000000L
    var seenBatch = -1L
    def sawRows(): Boolean = {
      var saw = false
      query.recentProgress
        .filter(p => p.numInputRows > 0 && p.batchId > seenBatch)
        .foreach { p =>
          seenBatch = math.max(seenBatch, p.batchId)
          saw = true
        }
      saw
    }
    var draining = true
    while (query.isActive && draining) {
      while (query.isActive && System.nanoTime() < deadline) {
        if (sawRows()) deadline = System.nanoTime() + idleMs * 1000000L
        Thread.sleep(pollMs)
      }
      if (query.isActive) {
        // Progress only lands in recentProgress AFTER a batch commits,
        // so an in-flight batch (possibly longer than idleMs) must
        // finish before the stop decision — otherwise rows that DID
        // arrive inside the window would be killed mid-batch. If the
        // drain surfaced new rows, the clock restarts; else stop.
        query.processAllAvailable()
        if (sawRows()) deadline = System.nanoTime() + idleMs * 1000000L
        else draining = false
      }
    }
    if (query.isActive) query.stop()
  }

  /** Stream-stream INTERVAL JOIN with watermarks: each left event
    * matches right events for the same key whose time falls in
    * [left.ts - before, left.ts + after]. Both sides carry watermarks,
    * so Spark bounds the join state on each side to the interval plus
    * the watermark delay and purges it as event time advances — the
    * state-safe way to correlate two live streams (e.g. clicks against
    * errors) at any scale; an un-watermarked stream join would buffer
    * forever. Inner join: unmatched rows drop (outer variants need the
    * same watermark + interval bounds).
    *
    * Output schema is DISAMBIGUATED — `key`, `l_<tsCol>`, `r_<tsCol>`,
    * and every other column prefixed `l_`/`r_` — so the joined stream
    * selects and sinks without qualified-alias gymnastics.
    * `tsCol` names the event-time column BOTH frames must carry
    * (default "ts"), mirroring how `key` is parameterized. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "1 hour", tsCol: String = "ts"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).as("l")
    val r = right.withWatermark(tsCol, watermark).as("r")
    def payload(df: DataFrame, side: String) =
      df.columns.toIndexedSeq.filterNot(c => c == key || c == tsCol)
        .map(c => col(s"$side.$c").as(s"${side}_$c"))
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $after"))
      .select(Seq(col(s"l.$key").as(key),
        col(s"l.$tsCol").as(s"l_$tsCol"),
        col(s"r.$tsCol").as(s"r_$tsCol")) ++ payload(left, "l") ++
        payload(right, "r"): _*)
  }

  /** Watermarked tumbling-window counts over an events-shaped stream
    * (ts, event_type, value) — the §2.10 gap-fill: the reference has no
    * event-time semantics at all. State is purged past the watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour",
      width: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window variant: width/slide windows overlap, each event
    * lands in width/slide windows. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour",
      width: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"))

  /** Session windows: a session extends while events arrive within
    * `gap` of each other, keyed by user. */
  def sessionCounts(events: DataFrame, watermark: String = "1 hour",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n"))

  /** Streaming exact dedup on the record identity (cve_id, dateUpdated)
    * — the streaming form of the reference's idempotent re-upsert
    * semantics. Watermarked so state does not grow unboundedly. */
  def streamingDedup(meta: DataFrame, watermark: String = "1 hour"): DataFrame =
    meta
      .withWatermark("date_updated", watermark)
      .dropDuplicatesWithinWatermark("cve_id", "date_updated")


  /** Batch-bounded idempotence anti-join: the `batch` rows whose `key`
    * is absent from `existing`. The naive
    * `batch.join(existing.select(key), key, "left_anti")` makes the
    * EXISTING side the join's build side — at a grown table the
    * planner falls back to a sort-merge join and SHUFFLES the whole
    * table's key column every micro-batch (guide §3.1's "pick the
    * strategy deliberately", applied to the sink hot loop; the q120
    * bloom-routed join already proved the shape). This form keeps the
    * table STREAMING through its scan at any size: broadcast the
    * batch's (micro-batch-bounded) key set, left-semi-probe the
    * existing keys with it, and anti-join the batch against the —
    * again batch-bounded — hit set. Result is identical; only the
    * join strategy changes. */
  private def freshByKey(batch: DataFrame, existingKeys: DataFrame,
      key: String): DataFrame = {
    val hits = existingKeys.select(col(key))
      .join(broadcast(batch.select(col(key)).distinct()),
        Seq(key), "left_semi")
      .distinct()
    batch.join(broadcast(hits), Seq(key), "left_anti")
  }

  /** Streaming CONTENT dedup against a PERSISTED fingerprint table —
    * the continuous-ingest form of exact dedup (q40/q92): each
    * micro-batch of (doc_id, text) rows is deduped within itself
    * (lowest doc_id per fingerprint wins), anti-joined against every
    * fingerprint ever admitted, and only the survivors append to the
    * corpus; their fingerprints append to the table. Unlike
    * [[streamingDedup]]'s state-store window, the fingerprint table is
    * a plain parquet table: it is UNBOUNDED in time (a duplicate of
    * last year's doc is still dropped), survives restarts and even
    * checkpoint loss, and is queryable/compactable like any table. A
    * replayed batch is idempotent for admission (its fps already
    * exist, so the anti-join drops every row); appends remain
    * at-least-once, standard for parquet sinks.
    *
    * Scale shape: admission is the [[freshByKey]] broadcast-semi
    * shape — the fingerprint table STREAMS through its column-pruned
    * scan against the micro-batch's broadcast key set, so no
    * table-side shuffle exists to pre-pay at any corpus size.
    *
    * `compactEvery` > 0 compacts the FINGERPRINT table every that many
    * batches after the appends commit — only the table this sink
    * re-scans per batch (the anti-join). The corpus at `outPath` is
    * append-only from the sink's view: compacting it in-batch would be
    * a full-table rewrite on the hot path for zero per-batch benefit,
    * so its file count is downstream readers' concern — bound it with
    * an offline [[graft.sinks.Maintenance.compactParquet]] call on
    * whatever cadence those readers need. ([[nearDupSinkWriter]]
    * compacts both of ITS tables because it re-scans both.) */
  def dedupSinkWriter(docs: DataFrame, outPath: String, fpPath: String,
      checkpoint: String, compactEvery: Int = 0): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val firsts = batch
          .withColumn("fp",
            graft.functions.TextFunctions.fingerprint(col("text")))
          .groupBy(col("fp"))
          .agg(min(struct(col("doc_id"), col("text"))).as("r"))
          .select(col("fp"), col("r.doc_id").as("doc_id"),
            col("r.text").as("text"))
        // first batch: no table yet — everything is fresh
        val seen = readOrEmpty(spark, fpPath,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fp",
              org.apache.spark.sql.types.StringType))))
        val fresh = freshByKey(firsts, seen, "fp")
        fresh.persist()
        try {
          // ONE file per batch append (not one per shuffle partition):
          // the fp table is re-scanned by EVERY later batch's
          // anti-join, so its FILE COUNT is a per-batch cost that
          // compounds — at micro-batch sizes the dominant growth term
          // is per-file listing/footer overhead, not bytes (measured:
          // the 200-batch admission probe, STREAMBENCH.md). Appends
          // are batch-sized, so one task writes them comfortably;
          // long-lived tables bound total count via
          // [[graft.sinks.Maintenance.compactParquet]].
          fresh.select(col("doc_id"), col("text")).repartition(1)
            .write.mode("append").parquet(outPath)
          fresh.select(col("fp")).repartition(1)
            .write.mode("append").parquet(fpPath)
        } finally fresh.unpersist()
        // cadence compacts ONLY the re-scanned table: fp is this
        // sink's per-batch anti-join input (its file count is a
        // per-batch cost); outPath is never read by the sink, so its
        // compaction belongs to an offline quiet-window call
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.sinks.Maintenance.compactParquet(spark, fpPath,
            minFiles = spark.sparkContext.defaultParallelism)
        ()
      }

  /** Read a parquet table that may not exist yet (first micro-batch of
    * a fresh sink): absent -> an empty frame with the given schema.
    * Repairs an interrupted compaction FIRST
    * ([[graft.sinks.Maintenance.recoverPrecompact]]): a crash between
    * the swap's two renames leaves the only complete copy under
    * `.precompact`, and treating that state as "empty table" would
    * re-admit the entire corpus and let the next compaction's cleanup
    * delete the stranded copy forever. */
  private def readOrEmpty(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    graft.sinks.Maintenance.recoverPrecompact(spark, path)
    // "empty" ONLY when the table holds no committed data yet: a
    // blanket Try here would turn a transient storage error on an
    // EXISTING fingerprint/postings table into an empty seen-set, and
    // the batch would re-admit everything as fresh (duplicate corpus
    // rows / doubled postings) instead of failing for retry. The
    // check is hasDataFiles, not bare exists: a crash during the very
    // FIRST write leaves a dir holding only _temporary, and treating
    // that as "exists, so a failed read is fatal" would brick the
    // stream on a state where nothing was ever committed. Data files
    // present + failed read = loud.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (graft.sinks.ManifestTable.hasDataFiles(fs, path))
      spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Streaming NEAR-dup admission against the PERSISTED corpus — the
    * continuous-ingest form of the full LSH dedup chain (q89's batch
    * shape run per micro-batch): each batch of (doc_id, text) rows is
    * exact-deduped within itself, then checked for near-duplicates
    * (band-bucket candidates -> exact Jaccard >= `minJaccard`) against
    * everything ever admitted AND against earlier docs in the same
    * batch; survivors append to the corpus at `outPath` and their LSH
    * band rows append to the band table at `bandPath`.
    *
    * Steady-state cost per batch: the batch's own signature pass plus
    * one FULL band-table scan for candidate generation and one
    * doc_id-only column-pruned scan of the same table for the
    * replay-dedup anti-join inside the band append — the corpus is
    * never re-tokenized; only docs that land in a candidate pair pay
    * the shingle verification
    * ([[graft.dedup.NearDup.incrementalVerifiedWithBands]]). Like
    * [[dedupSinkWriter]], the parquet tables are the source of truth:
    * restart after checkpoint loss still drops near-dups of last
    * year's content, and a REPLAYED micro-batch is a no-op for
    * admission (its fingerprints already sit in the corpus table).
    * Batch doc_ids must be unique across the stream's lifetime.
    * Intra-batch near-dup pairs keep the lower doc_id; corpus-vs-batch
    * pairs always keep the already-admitted corpus doc (the incoming
    * doc is dropped regardless of id order).
    *
    * `compactEvery` > 0 compacts the band and corpus tables
    * ([[graft.sinks.Maintenance.compactParquet]]) every that many
    * batches, AFTER the batch's appends commit: each append adds one
    * file per table, so without maintenance the rescans' per-file cost
    * crosses the fixed batch cost around batch ~400 at 4k-doc batches
    * (measured — STREAMBENCH.md). Inside foreachBatch is the one spot
    * that is a quiet window by construction (no concurrent batch
    * touches the tables). A replayed batch may re-compact: layout-only,
    * rows unchanged, so harmless. */
  def nearDupSinkWriter(docs: DataFrame, outPath: String, bandPath: String,
      checkpoint: String, minJaccard: Double = 0.5,
      compactEvery: Int = 0): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.types._
        val firsts = batch
          .withColumn("fp",
            graft.functions.TextFunctions.fingerprint(col("text")))
          .groupBy(col("fp"))
          .agg(min(struct(col("doc_id"), col("text"))).as("r"))
          .select(col("fp"), col("r.doc_id").as("doc_id"),
            col("r.text").as("text"))
        // the corpus table carries each admitted doc's fingerprint,
        // computed once at admission — the exact-dedup anti-join below
        // reads ONLY that column (columnar prune), never re-hashing
        // the corpus
        val corpus = readOrEmpty(spark, outPath, StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("fp", StringType))))
        val corpusBands = readOrEmpty(spark, bandPath, StructType(Seq(
          StructField("doc_id", LongType), StructField("band", IntegerType),
          StructField("band_key", StringType))))
        // exact-content anti-join BEFORE the LSH pass. This is what
        // makes the sink (a) replay-idempotent — a re-executed batch's
        // docs match their own admitted fingerprints and drop out
        // (LSH alone cannot catch a replay: the corpus copy has the
        // SAME doc_id, and candidate generation excludes self-pairs) —
        // and (b) closed for sub-shingle docs: texts under ShingleN
        // tokens get no band rows, so only this fingerprint check
        // stops their exact copies from re-admitting forever.
        val novel = freshByKey(firsts, corpus, "fp")
          .localCheckpoint()
        val (verified, truncation) = graft.dedup.NearDup
          .incrementalVerifiedWithBandsAndTruncation(
            corpus.select(col("doc_id"), col("text")), corpusBands,
            novel.select(col("doc_id"), col("text")), minJaccard)
        val drops = verified
          .select(col("doc_b").as("doc_id")).distinct()
        // truncation is never silent (the NearDup contract): over-cap
        // buckets traded recall for boundedness — say so per batch.
        // The report is this CALL's return value, not JVM state, so
        // concurrent sinks in one JVM can't cross their reports.
        graft.dedup.NearDup.warnIfTruncated(
          "nearDupSinkWriter batch", truncation)
        // drops is batch-bounded (verified pairs of THIS batch) but
        // descends from checkpointed frames with no size stats — hint
        // the broadcast so the planner never sort-merges it
        val fresh = novel.join(broadcast(drops), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        // bands FIRST: a crash between the two appends must not leave
        // corpus text invisible to future candidate generation. The
        // failure modes are asymmetric: orphan band rows (bands
        // written, corpus append lost) are SOFT — verification drops
        // pairs whose corpus text is missing, and the replayed batch
        // re-admits the docs (their fps aren't in the corpus yet) —
        // while corpus rows without band rows would admit their
        // near-dups forever.
        // anti-join on doc_id vs the persisted band table: a crash
        // AFTER the bands append but BEFORE the corpus append, then a
        // replay, would otherwise append the doc's band rows a second
        // time (the fp replay guard only consults the corpus table) —
        // duplicate band rows inflate bucket_n toward the truncation
        // cap and grow the table without bound. Parquet appends commit
        // at job level, so a doc present in the band table has ALL its
        // band rows; doc_id granularity is safe.
        // ONE file per batch append: both tables are re-scanned by
        // every later batch (bands twice — candidate scan + replay
        // anti-join; corpus once — fp anti-join), so their file count
        // is a compounding per-batch cost. The 200-batch probe showed
        // un-coalesced appends (~5 files/batch each) doubling the
        // steady-state batch time by batch ~150 from listing/footer
        // overhead alone — the byte-growth term is 100x smaller at
        // these sizes. Batch appends are micro-batch-sized (a few MB);
        // one write task is the right shape, and long-lived tables
        // bound total file count via
        // [[graft.sinks.Maintenance.compactParquet]].
        freshByKey(
          graft.dedup.NearDup.bands(
            fresh.select(col("doc_id"), col("text"))),
          corpusBands, "doc_id")
          .repartition(1)
          .write.mode("append").parquet(bandPath)
        fresh.select(col("doc_id"), col("text"), col("fp"))
          .repartition(1)
          .write.mode("append").parquet(outPath)
        // maintenance cadence: AFTER both appends commit, so a crash
        // mid-compaction never loses an append (the swap is crash-safe
        // end-to-end: a crash between its renames strands the table
        // under .precompact, and the next batch's readOrEmpty runs
        // recoverPrecompact to rename it back before treating the path
        // as readable/empty). minFiles=defaultParallelism
        // because BOTH tables are this sink's hot scans — compacting a
        // sub-128MB table to one file would serialize every later
        // batch's candidate/anti-join scan (one file = one input split)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          val par = spark.sparkContext.defaultParallelism
          graft.sinks.Maintenance.compactParquet(spark, bandPath,
            minFiles = par)
          graft.sinks.Maintenance.compactParquet(spark, outPath,
            minFiles = par)
        }
        ()
      }

  /** Streaming ANN index maintenance: each micro-batch of
    * (vec_id, embedding) rows appends to the persisted IVF-PQ index at
    * `indexPath` with both quantizers FROZEN
    * ([[graft.vector.IvfPq.append]]) — the continuous-ingest form of
    * q117's one-shot delta append, and the reference consumer's
    * embed-then-upsert loop (one ANN-service upsert per consumed
    * record, `/root/reference/consumer/consumer.py:58-67`) as a Spark
    * sink: bulk partition-wise appends per batch instead of per-record
    * RPCs. The index must already exist ([[graft.vector.IvfPq
    * .ensureBuilt]] over the base corpus) before the stream starts;
    * `append` refuses an unbuilt path loudly.
    *
    * Idempotence: like [[dedupSinkWriter]], the persisted table itself
    * is the source of truth — the batch drops in-batch duplicate ids,
    * then anti-joins the index's vec_id column (a column-pruned scan:
    * one BIGINT column per batch, the same per-batch linear term the
    * admission sink pays on its band table), so a REPLAYED batch, a
    * checkpoint-loss restart, or an upstream duplicate id is dropped
    * rather than double-inserted — a duplicated index row would
    * otherwise surface as a repeated id in probe top-k lists. Newly
    * appended rows serve from the very next probe; recall drift under
    * the frozen quantizers is bounded by the scheduled full-rebuild
    * cadence (README, q117).
    *
    * `compactEvery` > 0 compacts the index back to one file per bucket
    * ([[graft.vector.IvfPq.compact]]) every that many batches — the
    * same maintenance cadence as [[nearDupSinkWriter]]: each append
    * adds up to one file per touched bucket, and the anti-join rescans
    * the index every batch, so file count is a compounding per-batch
    * cost. Bucket layout is preserved (one file PER BUCKET), so probe
    * partition pruning and scan parallelism are unaffected — no
    * minFiles analogue needed. Content is probe-identical across the
    * swap (IvfPqSpec pins compact; the sink test pins the cadence). */
  def annIndexSinkWriter(vecs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 0): DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // a crash between compact's two renames leaves the index only
        // under .precompact — restore before reading, or the anti-join
        // below would see nothing and double-insert the whole batch
        graft.sinks.Maintenance.recoverPrecompact(spark, indexPath)
        // anti-join the LIVE view, not the raw files: a key deleted
        // from the index ([[graft.vector.IvfPq.delete]]) must be
        // re-insertable — its dead rows' ids would otherwise block
        // the re-insert forever
        val fresh = freshByKey(batch.dropDuplicates("vec_id"),
          graft.vector.IvfPq.live(spark, indexPath), "vec_id")
          .persist()
        try if (fresh.head(1).nonEmpty)
          graft.vector.IvfPq.append(spark, indexPath, fresh)
        finally fresh.unpersist()
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.vector.IvfPq.compact(spark, indexPath)
        ()
      }

  /** Streaming keyword-index maintenance: each micro-batch of
    * (doc_id, text) rows appends its (term, doc_id) postings to the
    * persisted posting table at `postingsPath` — the continuous-ingest
    * form of [[graft.text.InvertedIndex.build]], so a continuously
    * growing corpus stays keyword-searchable without re-tokenizing
    * what is already indexed. Searches
    * ([[graft.text.InvertedIndex.search]]) serve newly admitted docs
    * from the very next batch.
    *
    * Idempotence: the posting table itself is the source of truth —
    * the batch drops in-batch duplicate doc ids, then anti-joins the
    * table's distinct doc_id column (column-pruned scan, one BIGINT
    * column), so a replayed batch or checkpoint-loss restart never
    * double-posts a document (a doubled posting would double the
    * term-match count `matchingIds` intersects on, corrupting
    * conjunctive results — not just wasting space).
    *
    * Layout: appends are ONE file per batch (the measured
    * file-count-growth lesson, STREAMBENCH.md) but NOT term-clustered
    * — a batch file spans the whole term range, so footer min/max
    * prunes nothing inside it and per-term search cost grows with the
    * unclustered fraction. `compactEvery` > 0 therefore runs
    * [[graft.text.InvertedIndex.recluster]] every that many batches:
    * unlike the dedup sinks' plain compaction this RESTORES the
    * range-clustered layout (term slices, tight footers), resetting
    * both the file-count term and the pruning loss in one crash-safe
    * swap. The anti-join also re-scans this table per batch, so the
    * cadence serves the sink itself, not just searchers. */
  def keywordIndexSinkWriter(docs: DataFrame, postingsPath: String,
      checkpoint: String, compactEvery: Int = 0,
      reclusterFiles: Int = 16): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val seen = readOrEmpty(spark, postingsPath,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("term",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType))))
        val fresh = freshByKey(batch.dropDuplicates("doc_id"),
          seen, "doc_id")
        // the ONE shared posting projection (InvertedIndex.postingsOf):
        // same tokenization and column order as the batch build, by
        // construction rather than by parallel maintenance
        graft.text.InvertedIndex.postingsOf(fresh)
          .repartition(1)
          .write.mode("append").parquet(postingsPath)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.text.InvertedIndex.recluster(spark, postingsPath,
            reclusterFiles)
        ()
      }

  /** Exactly-once streaming Count-Min maintenance: each micro-batch's
    * word n-grams increment a PERSISTED relational CMS counter table
    * (the q95 form: (j, bucket, n) rows, d×w of them — fixed size
    * forever, the whole point of a sketch), so corpus-wide frequency
    * estimates stay queryable while the stream runs, without ever
    * storing the n-gram tail.
    *
    * Why this sink is different from the others: counter INCREMENTS
    * are not idempotent — the dedup/ANN/keyword sinks make replays
    * no-ops by anti-joining the table (set semantics), but a replayed
    * batch re-added to counters would double its contribution
    * silently. Exactly-once here comes from a TRANSACTIONAL swap: the
    * merged counters and the applied-batch watermark (`_applied`, an
    * underscore side file the main read ignores) land in the same
    * directory rename, so "counters include batch B" and "watermark
    * says B" are inseparable. A replay (batchId <= watermark) is
    * skipped; a crash BETWEEN the swap's renames is repaired by
    * [[graft.sinks.Maintenance.recoverPrecompact]]; a crash before
    * the swap leaves the old dir + old watermark, and the retry
    * re-derives the same merge. Merging is integer addition —
    * commutative, associative, partition-order-free — so the streamed
    * table is BIT-IDENTICAL to a one-shot batch build of the same
    * corpus (the spec pins exactly that, replay included).
    *
    * The watermark keys on batchId, so exactly-once holds for any
    * REPLAY of an already-applied batch — in-lineage retry, restart
    * from a retained checkpoint, or redelivery of old data under a
    * reset batchId after checkpoint loss. What it cannot survive is
    * checkpoint loss followed by NEW data arriving under a reused low
    * batchId (it would be skipped as a replay): the anti-join sinks
    * shrug that off because their dedup is content-based, but a
    * counter has no content identity. Retain the checkpoint (the
    * standard streaming contract), or rebuild the sketch offline —
    * it is one scan of the corpus by construction.
    *
    * The foreachBatch body assumes single-writer (standard structured
    * streaming: one query owns a sink path). At 100 TB-rate streams
    * the batch-side work is one scan + a d×w-bounded aggregate; the
    * table side is constant-size, so per-batch cost never grows —
    * unlike every append-table sink, this one needs NO compaction
    * cadence. */
  def cmsSinkWriter(docs: DataFrame, countersPath: String,
      checkpoint: String, n: Int = 3, depth: Int = 4,
      width: Int = 1024): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.sinks.Maintenance.recoverPrecompact(spark, countersPath)
        val live = new org.apache.hadoop.fs.Path(countersPath)
        val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
        // the side file records (watermark, depth, width, ngram): a
        // restarted sink configured with DIFFERENT sketch params would
        // otherwise merge increments from an incompatible bucket space
        // into the same (j, bucket) rows — splitting an item's counts
        // across hash spaces and silently breaking the one-sided
        // est >= true contract. Mismatch is a loud error, not a merge.
        // absence is the only silent case: a transient/corrupt read of
        // an EXISTING side file must fail the batch loudly (a swallowed
        // failure would reset `applied` to -1 while the counter table
        // still exists, re-merging already-applied batches and silently
        // double-counting — the exact opposite of exactly-once)
        val appliedPath =
          new org.apache.hadoop.fs.Path(s"$countersPath/_applied")
        val meta =
          if (!graft.sinks.ManifestTable.hasDataFiles(fs,
              appliedPath.toString)) None
          else Some(spark.read.parquet(appliedPath.toString)
            .select("applied", "depth", "width", "ngram").head())
        meta.foreach { m =>
          require(m.getInt(1) == depth && m.getInt(2) == width &&
            m.getInt(3) == n,
            s"cmsSinkWriter: counter table $countersPath was built " +
              s"with (depth=${m.getInt(1)}, width=${m.getInt(2)}, " +
              s"ngram=${m.getInt(3)}) but this sink is configured " +
              s"(depth=$depth, width=$width, ngram=$n) — incompatible " +
              "bucket spaces cannot merge; use a new path or rebuild")
        }
        val applied = meta.map(_.getLong(0)).getOrElse(-1L)
        if (batchId > applied) {
          val P = graft.functions.TextFunctions.MinhashP
          val toks = graft.functions.TextFunctions.tokens(col("text"))
          // fold the 64-bit hash to 32 bits before the (a*h + b) mix:
          // a is 29 bits, so the product stays far under 2^63 — the
          // same no-overflow convention as the engine's md5-32 token
          // hashes (ANSI mode makes a wrapping multiply an ERROR, not
          // a hash)
          val sh = batch.withColumn("toks", toks)
            .select(explode(
              graft.functions.TextFunctions.shinglesOf(col("toks"), n))
              .as("shingle"))
            .select(pmod(xxhash64(col("shingle")), lit(1L << 32)).as("h"))
          val jb = explode(array((0 until depth).map { j =>
            val (a, b) = graft.functions.TextFunctions.minhashParams(j)
            struct(lit(j).as("j"),
              (pmod(col("h") * a + b, lit(P)) % width).as("bucket"))
          }: _*)).as("jb")
          val inc = sh.select(jb)
            .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
            .groupBy(col("j"), col("bucket"))
            .agg(count(lit(1)).as("cnt"))
          import spark.implicits._
          def writeInto(tmp: String): Unit = {
            val merged =
              if (fs.exists(live))
                spark.read.parquet(countersPath).unionByName(inc)
                  .groupBy(col("j"), col("bucket"))
                  .agg(sum(col("cnt")).as("cnt"))
              else inc
            merged.repartition(1).write.mode("overwrite").parquet(tmp)
            Seq((batchId, depth, width, n))
              .toDF("applied", "depth", "width", "ngram").repartition(1)
              .write.mode("overwrite").parquet(s"$tmp/_applied")
          }
          if (fs.exists(live))
            graft.sinks.Maintenance.writeAndSwap(spark, countersPath)(
              writeInto)
          else {
            // first batch: no table to swap — build fully in a temp
            // dir, then ONE atomic rename publishes counters and
            // watermark together
            val tmp = new org.apache.hadoop.fs.Path(
              s"$countersPath.compacting")
            fs.delete(tmp, true)
            writeInto(tmp.toString)
            require(fs.rename(tmp, live),
              s"cmsSinkWriter: could not publish first batch to $live")
          }
        }
        ()
      }

  /** Estimated occurrence count for each row of `items` (a single
    * string column) against a [[cmsSinkWriter]] counter table: hash,
    * probe all d rows, take the min — `est >= true` always, the
    * standard CMS readout (q95's probe join, against the streamed
    * table). Depth and width come from the table's own `_applied`
    * record, never from the caller — a probe in the wrong bucket
    * space would silently undercount. */
  def cmsEstimates(s: org.apache.spark.sql.SparkSession,
      countersPath: String, items: DataFrame,
      itemCol: String): DataFrame = {
    val m = s.read.parquet(s"$countersPath/_applied")
      .select("depth", "width").head()
    val (depth, width) = (m.getInt(0), m.getInt(1))
    val P = graft.functions.TextFunctions.MinhashP
    val jb = explode(array((0 until depth).map { j =>
      val (a, b) = graft.functions.TextFunctions.minhashParams(j)
      struct(lit(j).as("j"),
        (pmod(pmod(xxhash64(col(itemCol)), lit(1L << 32)) * a + b,
          lit(P)) % width).as("bucket"))
    }: _*)).as("jb")
    items.select(col(itemCol), jb)
      .select(col(itemCol), col("jb.j").as("j"),
        col("jb.bucket").as("bucket"))
      .join(s.read.parquet(countersPath), Seq("j", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("est"))
  }

  /** Exactly-once streaming ingest into a
    * [[graft.sinks.ManifestTable]]: each micro-batch commits as one
    * immutable data dir + one atomically-renamed manifest carrying
    * the batchId as its tag — so "batch B's rows are in the table"
    * and "watermark says B" are a single filesystem rename, and a
    * replayed batch (tag <= watermark) is skipped without any
    * content-based dedup. This is the third idempotence mechanism in
    * the sink family, and the cheapest: the anti-join sinks pay a
    * per-batch table scan for content identity, the CMS sink rewrites
    * its (fixed-size) state per batch; here the append IS the commit
    * and costs only the batch write + one tiny manifest.
    *
    * What readers get over a plain parquet-append sink: snapshot
    * isolation while the stream runs (a query planned mid-stream
    * reads a consistent committed prefix, never a half-written
    * batch), time travel to any batch boundary, and — with
    * `statsCols` set — manifest-level dir pruning
    * ([[graft.sinks.ManifestTable.readPruned]]), which for a
    * monotone column (event time, ingest id) makes "recent data"
    * queries skip every old batch dir from ONE metadata read. The
    * same batchId-watermark caveat as [[cmsSinkWriter]] applies:
    * retain the checkpoint; after checkpoint loss, NEW data under a
    * reused low batchId would be skipped as a replay.
    *
    * In-stream maintenance is VACUUM, not compaction: `vacuumEvery`
    * > 0 drops snapshots beyond the newest `keepVersions` every that
    * many fresh batches — a metadata-only delete that bounds the
    * manifest directory's listing cost (which every batch's
    * watermark read pays). Retention trades against incremental
    * consumers ([[graft.sinks.ManifestTable.readSince]]): a consumer
    * whose checkpoint falls behind by more than `keepVersions` finds
    * it vacuumed and must re-bootstrap with a full read — size
    * `keepVersions` to cover the slowest consumer's lag, exactly like
    * a Kafka retention window. Data-dir compaction
    * ([[graft.sinks.ManifestTable.compact]]) is deliberately NOT
    * offered on the hot path: it is a full-table rewrite, so an
    * in-stream cadence would pay O(table²) cumulative bytes — the
    * same trap the dedup sink's corpus-compaction comment documents.
    * Run it offline in a quiet window; dir-count growth between
    * compactions costs readers one extra listing per dir, the same
    * linear term as any append table's file count. */
  def manifestSinkWriter(docs: DataFrame, tablePath: String,
      checkpoint: String, statsCols: Seq[String] = Nil,
      vacuumEvery: Int = 0, keepVersions: Int = 2,
      bloomCols: Seq[String] = Nil): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the exactly-once skip + vacuum cadence is the ONE shared
        // implementation both streaming write paths use (this
        // foreachBatch form and the graft-manifest StreamSinkProvider)
        graft.sinks.ManifestTable.appendIfFresh(batch.sparkSession,
          batch, tablePath, batchId, statsCols, vacuumEvery,
          keepVersions, bloomCols, writerId = Some(checkpoint))
        ()
      }

  /** STREAM-WAP: exactly-once streaming ingest into a manifest-table
    * BRANCH — [[manifestSinkWriter]]'s batchId discipline composed
    * with the write-audit-publish gate: every micro-batch stages as
    * an INVISIBLE branch commit (main readers see nothing), the
    * auditor reads the branch whole
    * ([[graft.sinks.ManifestTable.readBranch]] = base + staged
    * batches), fixes bad staged rows in place if needed (branch DML),
    * and publishes the audited window as ONE atomic commit
    * ([[graft.sinks.ManifestTable.fastForwardBranch]]) — or abandons
    * it without a trace. The production ingest shape: data quality
    * problems are caught while they are still nobody's problem,
    * continuously, without pausing the stream's staging side.
    *
    * Exactly-once across the WHOLE loop, not just the staging side
    * ([[graft.sinks.ManifestTable.appendToBranchIfFresh]]): the
    * replay watermark is max(branch staged tags, main table tag), so
    * a batch replayed AFTER its window was fast-forwarded (branch
    * consumed, tags folded into main) still skips; the sink re-opens
    * the branch from the then-current snapshot on the next fresh
    * batch. Crash between a branch commit and the checkpoint update
    * replays into a skip — the branch commit IS the atomic unit,
    * like the main-path sink's manifest rename.
    *
    * The publish cadence is the AUDITOR's, not the sink's, by
    * design: fast-forward validates against the table as it is NOW
    * (schema, constraints, partition purity), so it belongs with
    * whoever owns the audit decision — [[auditBranch]] is that loop
    * in one call. At 100 TB rate nothing here scales with table
    * size: each batch is one staged dir write + one slot claim, the
    * fast-forward is metadata-only (zero data movement, however many
    * batches the audit window staged).
    *
    * SINGLE WRITER, table-wide — MECHANICALLY ENFORCED: this sink is
    * the table's ONE streaming writer. Batch tags share one space per
    * table, so running a main-path sink ([[manifestSinkWriter]])
    * beside a branch sink on the same table would cross-inflate both
    * watermarks after a fast-forward (the published branch tags fold
    * into main's) and skip the other stream's batches. Each sink
    * therefore records its WRITER IDENTITY (its checkpoint path)
    * with every watermark it raises, and a batch about to be skipped
    * on a watermark some OTHER writer raised throws loudly instead —
    * that shape is never a replay, it is the second live writer (or
    * a rebuilt checkpoint reusing low batchIds) surfacing. */
  def branchSinkWriter(docs: DataFrame, tablePath: String,
      branch: String, checkpoint: String,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sinks.ManifestTable.appendToBranchIfFresh(
          batch.sparkSession, batch, tablePath, branch, batchId,
          statsCols, bloomCols, writerId = Some(checkpoint))
        ()
      }

  /** The AUDITOR side of the stream-WAP loop, as one call: read the
    * branch WHOLE (base + every staged batch), run the caller's
    * audit, and either FAST-FORWARD the audited window onto main
    * (one atomic metadata-only commit) or leave the branch for a
    * FIX pass (branch DML) / an explicit abandon. Returns the
    * committed version on publish, None when the audit rejected.
    * A branch with nothing staged is a no-op None (nothing to
    * publish OR reject — the stream simply hasn't produced since the
    * last cycle). Run it on the audit's own cadence (a scheduled
    * job) while [[branchSinkWriter]] keeps staging — the sink
    * re-opens the branch on its next fresh batch after a publish.
    * `audit` sees exactly what main WOULD contain if published —
    * base rows included, so corpus-level invariants (dedup rates,
    * distribution drift) are checkable, not just per-batch ones. */
  def auditBranch(spark: SparkSession, tablePath: String,
      branch: String, audit: DataFrame => Boolean,
      evolveSchema: Boolean = false,
      abandonOnReject: Boolean = false): Option[Long] = {
    val t = graft.catalog.GraftNames.resolve(spark, tablePath)
    if (!graft.sinks.ManifestTable.branchNames(spark, t)
        .contains(branch)) return None
    // nothing staged yet: no decision to make. The probe is the
    // branch's COMMIT count, not its row count — an audit window
    // whose fixes deleted every staged row is still a real publish
    // decision (publishing it commits the empty window and resets
    // the loop), while a commit-less branch just means the stream
    // has not produced since the last cycle.
    // capture the commit set FIRST: the audit window and the publish
    // set are then the SAME commits even while branchSinkWriter
    // keeps staging — a batch staged after this capture is neither
    // judged nor published this cycle (it waits for the next one),
    // and fastForwardBranch's consume salvages it instead of
    // deleting it with the branch dir.
    val window = graft.sinks.ManifestTable
      .branchCommitNames(spark, t, branch)
    if (window.isEmpty) return None
    if (audit(graft.sinks.ManifestTable.readBranch(spark, t, branch,
        Some(window))))
      Some(graft.sinks.ManifestTable.fastForwardBranch(spark, t,
        branch, evolveSchema = evolveSchema,
        onlyCommits = Some(window)))
    else {
      if (abandonOnReject)
        graft.sinks.ManifestTable.abandonBranch(spark, t, branch)
      None
    }
  }

  /** CDC APPLY: follow a manifest table's CHANGE FEED
    * (`readStream.format("graft-manifest").option("readChangeFeed",
    * "true")`) into a FOLLOWER manifest table that converges to the
    * source — the replication/GDPR-mirror loop: a delete upstream
    * propagates as a delete downstream, an in-place update arrives
    * as its delete-preimage + insert-postimage pair and nets to the
    * new value. Per micro-batch (one exactly-once unit): delete rows
    * apply FIRST as one keyed merge-on-read delete, then insert rows
    * append as one tag-carrying commit — the batchId watermark gates
    * the WHOLE batch, so a replay after any crash point re-applies
    * deletes (idempotent: the keys are already gone, or about to be
    * re-inserted by the gated append that did not land) and the
    * append lands exactly once. `keyCol` must uniquely identify live
    * rows in the source (the same contract the source's own
    * merge/deleteKeys ops have).
    *
    * A micro-batch may span SEVERAL source versions (rate limits,
    * catch-up after downtime), and a key can change more than once
    * inside it — inserted by one version, deleted by a later one.
    * Replaying those events out of order would resurrect rows, so
    * each batch is NETTED per key first: the key's LAST change in
    * the batch wins (at equal version the insert-postimage beats its
    * delete-preimage), every touched key clears with one keyed
    * delete, and the net-insert rows land as one tag-carrying
    * commit. That keeps the whole batch ONE idempotent unit: the
    * batchId watermark gates it, so a replay after any crash point
    * re-clears already-cleared keys (a no-op) and the append lands
    * exactly once.
    *
    * Scale: the netting is one window over the batch's CHANGE rows
    * (not the follower); each batch then costs one deleteKeys
    * (tombstone write, dirs pruned by key stats/Blooms) + one append
    * — never a rewrite of the follower proportional to its size. */
  def applyChangesSinkWriter(changes: DataFrame, tablePath: String,
      keyCol: String, checkpoint: String, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    require(changes.columns.contains("_change_type") &&
      changes.columns.contains("_commit_version"),
      "Streams.applyChangesSinkWriter: the input is not a change " +
        "feed — read the source with option(\"readChangeFeed\", " +
        "\"true\")")
    // the replica may be addressed by catalog name too — resolved
    // ONCE here, so every per-batch call below sees a plain path
    val tablePathResolved = graft.catalog.GraftNames.resolve(
      changes.sparkSession, tablePath)
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import graft.sinks.ManifestTable
        // the tag watermark gates the whole batch: a replayed batch
        // must re-apply NOTHING (its append already landed). A skip
        // on a watermark ANOTHER writer raised is not a replay — the
        // shared single-writer check turns it loud.
        val freshBatch =
          batchId > ManifestTable.latestTag(spark, tablePathResolved)
        if (!freshBatch)
          ManifestTable.requireSameWriter(spark, tablePathResolved,
            batchId, Some(checkpoint),
            ManifestTable.tagWriterOf(spark, tablePathResolved),
            "applyChangesSinkWriter")
        if (freshBatch) {
          // NET per key: the last change wins; the insert-postimage
          // outranks its own version's delete-preimage
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(keyCol))
            .orderBy(col("_commit_version").desc,
              when(col("_change_type") === "insert", 1)
                .otherwise(0).desc)
          val wk = org.apache.spark.sql.expressions.Window
            .partitionBy(col(keyCol))
          val last = batch
            .withColumn("_graft_rn",
              org.apache.spark.sql.functions.row_number().over(w))
            .withColumn("_graft_n",
              org.apache.spark.sql.functions.count(lit(1)).over(wk))
            .filter(col("_graft_rn") === 1)
            .localCheckpoint()
          // a key needs CLEARING only when the batch deleted it or
          // changed it more than once (single-event inserts are
          // fresh rows under the key-uniqueness contract) — so a
          // pure-append batch, the steady state, skips the delete
          // commit entirely
          val clear = last.filter(
            col("_change_type") === "delete" || col("_graft_n") > 1)
            .select(col(keyCol))
          if (ManifestTable.latestVersion(spark, tablePathResolved).isDefined
              && !clear.isEmpty)
            ManifestTable.deleteKeys(spark, clear, tablePathResolved, keyCol)
          ManifestTable.appendIfFresh(spark,
            last.filter(col("_change_type") === "insert")
              .drop("_graft_rn", "_graft_n", "_change_type",
                "_commit_version"),
            tablePathResolved, batchId,
            statsCols = (statsCols :+ keyCol).distinct,
            bloomCols = bloomCols, writerId = Some(checkpoint))
        }
        ()
      }
  }

  /** ANN-INDEX CDC FOLLOWER: follow a corpus table's CHANGE FEED
    * (`readStream.format("graft-manifest").option("readChangeFeed",
    * "true")`) into a persisted IVF-PQ index, so the index FOLLOWS
    * its corpus — the consistency loop the reference gets by
    * construction from its delegated store's single upsert/delete
    * surface (`/root/reference/consumer/consumer.py:111-125`), and
    * the piece that closes the GDPR gap: a corpus `deleteKeys` /
    * `dropPartitions` propagates here as an index delete, so deleted
    * documents' vectors stop serving instead of living on in the
    * index forever.
    *
    * Per micro-batch (one convergent unit): the batch's change rows
    * NET per key exactly like [[applyChangesSinkWriter]] (last change
    * wins; the insert-postimage outranks its own version's
    * delete-preimage), then
    *  1. keys the batch deleted or changed more than once CLEAR with
    *     one index tombstone ([[graft.vector.IvfPq.delete]] — cut
    *     above every current row generation);
    *  2. net-insert rows that are not already live append with both
    *     quantizers frozen ([[graft.vector.IvfPq.append]] — stamped
    *     at the max tombstone cut, so they serve above the clear).
    *
    * Exactly-once by CONVERGENCE, not by a watermark — the index is
    * not a manifest table and carries no tag: a replayed batch
    * re-tombstones at a cut above the crashed attempt's append and
    * re-appends above it (one live copy per key, whatever the crash
    * point), and a replayed pure-insert batch anti-joins the live
    * view and lands nothing. That is the same
    * source-of-truth discipline as [[annIndexSinkWriter]], extended
    * to deletes and in-place updates by the generation ordering.
    *
    * Scale: netting is one window over the batch's CHANGE rows; each
    * batch then costs one tombstone write + one delta append — never
    * work proportional to index size. Tombstones accumulate only
    * until the next [[graft.vector.IvfPq.compact]] (run it on the
    * usual cadence; probes mask via a broadcast anti-join meanwhile).
    * The embedding column must match the index's build-time
    * dimension; `keyCol`/`embCol` name the feed's columns. */
  def annIndexChangesFollower(changes: DataFrame, indexPath: String,
      checkpoint: String, keyCol: String = "vec_id",
      embCol: String = "embedding",
      compactEvery: Int = 0): DataStreamWriter[Row] = {
    require(changes.columns.contains("_change_type") &&
      changes.columns.contains("_commit_version"),
      "Streams.annIndexChangesFollower: the input is not a change " +
        "feed — read the source with option(\"readChangeFeed\", " +
        "\"true\")")
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.sinks.Maintenance.recoverPrecompact(spark, indexPath)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(col("_commit_version").desc,
            when(col("_change_type") === "insert", 1)
              .otherwise(0).desc)
        val wk = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
        val last = batch
          .withColumn("_graft_rn", row_number().over(w))
          .withColumn("_graft_n", count(lit(1)).over(wk))
          .filter(col("_graft_rn") === 1)
          .localCheckpoint()
        // pure single-event inserts are fresh keys under the corpus
        // key-uniqueness contract — the steady state skips the
        // tombstone write entirely
        val clear = last.filter(
          col("_change_type") === "delete" || col("_graft_n") > 1)
          .select(col(keyCol).as("vec_id"))
        if (!clear.isEmpty)
          graft.vector.IvfPq.delete(spark, indexPath, clear)
        val fresh = freshByKey(
          last.filter(col("_change_type") === "insert")
            .select(col(keyCol).as("vec_id"), col(embCol).as("embedding")),
          graft.vector.IvfPq.live(spark, indexPath), "vec_id")
        if (fresh.head(1).nonEmpty)
          graft.vector.IvfPq.append(spark, indexPath, fresh)
        // maintenance cadence (annIndexSinkWriter's contract): the
        // follower both FRAGMENTS bucket dirs (one file per touched
        // bucket per batch) and ACCUMULATES tombstones (every
        // delete/update batch adds to the probe-time mask) — compact
        // resets both in one crash-safe swap
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.vector.IvfPq.compact(spark, indexPath)
        ()
      }
  }

  /** ONE-CALL recovery for a change-feed follower that LAGGED PAST
    * the source's vacuum window: the stream's next restart fails
    * loudly ("checkpoint vN is not a committed snapshot … vacuumed")
    * because the step diff needs every intermediate version, and the
    * documented fix is a sinceVersion-0 re-bootstrap. This helper IS
    * that fix: it deletes the follower's checkpoint AND the replica
    * table (both derived state — the replica is rebuilt exactly),
    * then returns a fresh [[applyChangesSinkWriter]] whose first
    * micro-batch re-bootstraps from the source's CURRENT snapshot
    * (a fresh change-feed stream with no checkpoint starts at
    * sinceVersion 0, which emits the live rows as inserts — no
    * vacuumed intermediate is needed).
    *
    * Deliberately DESTRUCTIVE on exactly the two derived artifacts
    * and nothing else: the source table is never touched, and the
    * helper refuses a replica path that equals the source (deleting
    * the source would be data loss, not recovery). Both tables may
    * be addressed by catalog name. */
  def rebootstrapChangesFollower(spark: SparkSession,
      source: String, replica: String, keyCol: String,
      checkpoint: String, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val srcPath = graft.catalog.GraftNames.resolve(spark, source)
    val dstPath = graft.catalog.GraftNames.resolve(spark, replica)
    val conf = spark.sessionState.newHadoopConf()
    // the overlap guard is QUALIFIED-PATH PREFIX, not string
    // equality: a replica or checkpoint nested UNDER the source dir
    // (replica = s"$src/replica") would be recursively deleted right
    // along with source data, and a delete target that CONTAINS the
    // source dir would take it down from above — both are data loss
    // wearing a recovery helper's clothes
    def qual(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    val srcQ = qual(srcPath)
    Seq("replica" -> dstPath, "checkpoint" -> checkpoint).foreach {
      case (what, p) =>
        val q = qual(p)
        require(q != srcQ && !q.startsWith(srcQ + "/") &&
            !srcQ.startsWith(q + "/"),
          s"Streams.rebootstrapChangesFollower: $what path $p " +
            s"overlaps the source table $srcPath — refusing to " +
            "delete anything that could take source data with it")
    }
    Seq(dstPath, checkpoint).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).delete(hp, true)
    }
    applyChangesSinkWriter(
      spark.readStream.format("graft-manifest")
        .option("readChangeFeed", "true").load(source),
      replica, keyCol, checkpoint, statsCols = statsCols,
      bloomCols = bloomCols)
  }

  /** Stream-static enrichment join: each micro-batch left-joins the
    * static dimension on `key` — the streaming form of the J2
    * enrichment join (lookup metadata for every arriving record).
    * Stream-static joins are STATE-FREE (nothing accumulates across
    * batches, no watermark needed, unlike stream-stream joins) and the
    * static side is re-planned per batch, so a dim table updated in
    * place is picked up on the next batch. The join strategy is left
    * to the planner: small dims auto-broadcast per batch, bigger dims
    * co-locate via a bucketed layout
    * ([[graft.layout.Layout.writeBucketed]]) — callers who KNOW the
    * dim is broadcast-sized can pass `broadcast(dim)` themselves; a
    * hard-coded hint here would force a multi-GB dim onto the driver
    * every micro-batch. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** Per-user session accumulator state for [[statefulSessions]]. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** A closed session emitted by [[statefulSessions]] (epoch micros). */
  final case class ClosedSession(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Custom arbitrary-state sessionization via flatMapGroupsWithState
    * (the capability `session_window` can't express: emit CLOSED
    * sessions only, with whatever per-session payload the state holds).
    * A session closes when a newer event arrives more than `gapUs`
    * after the last one, or when the event-time watermark passes the
    * session's expiry (EventTimeTimeout). State per user is O(1); the
    * watermark bounds state lifetime exactly like the built-in
    * session_window aggregation.
    *
    * Out-of-order events above the watermark sessionize correctly
    * WITHIN each micro-batch (full interval merge, envelopes can grow
    * backwards); sessions that closed more than `gap` before the open
    * session emit immediately and — append-mode streaming — cannot be
    * reopened by a yet-later event that would have bridged them. Only
    * the single open session per key is retained state. */
  def statefulSessions(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
      gapUs: Long, watermark: String = "0 seconds")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L
    events
      .withColumnRenamed("_1", "user_id").withColumnRenamed("_2", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.n, s.start, s.last))
          } else {
            // Standard interval sessionization over the batch's events
            // PLUS the open session as a pseudo-interval: sort all
            // pieces by start and fold-merge any two within the gap
            // (envelopes can grow backwards for above-watermark
            // out-of-order events — two late events within gap of each
            // other correctly form ONE session). Everything but the
            // latest surviving session closes; the latest becomes the
            // new state, and its timeout never moves backwards.
            val pieces = (rows.map(r => { val t = micros(r._2)
              SessState(t, t, 1) }).toSeq ++ state.getOption.toSeq)
              .sortBy(s => (s.start, s.last))
            var merged = List.empty[SessState]
            pieces.foreach { p =>
              merged match {
                case h :: tl if p.start - h.last <= gapUs =>
                  merged = SessState(h.start, math.max(h.last, p.last),
                    h.n + p.n) :: tl
                case _ => merged = p :: merged
              }
            }
            val latest :: closedSess = merged: @unchecked
            state.update(latest)
            state.setTimeoutTimestamp((latest.last + gapUs) / 1000L + 1L)
            closedSess.reverseIterator
              .map(s => ClosedSession(user, s.n, s.start, s.last))
          }
      }
  }

  /** End-to-end batch-mode equivalent of the Airflow DAG
    * (`airflow/dags/etl.py:164-197`): read a landing dir of CVE JSON,
    * persist raw + extracted tables with the same W5 corrupt-split as
    * the streaming path (unparseable / id-less records would otherwise
    * surface as all-default silver rows). The streaming path is the
    * same plan with readStream + [[dualSinkWriter]]. */
  def ingestBatch(spark: SparkSession, landingDir: String, rawPath: String,
      metaPath: String, dlqPath: Option[String] = None): Unit = {
    val docs = spark.read
      .schema(Cve.cveSchema.add("_corrupt_record", "string"))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("recursiveFileLookup", "true").json(landingDir)
    val ok = docs
      .filter(col("cveMetadata").isNotNull &&
        col("cveMetadata.cveId").isNotNull)
      .drop("_corrupt_record")
    Cve.rawPersist(ok).write.mode("append").parquet(rawPath)
    Cve.extractMeta(ok).write.mode("append").parquet(metaPath)
    dlqPath.foreach { p =>
      docs.filter(col("cveMetadata").isNull ||
          col("cveMetadata.cveId").isNull)
        .select(coalesce(col("_corrupt_record"), to_json(struct(col("*"))))
          .as("raw"))
        .write.mode("append").parquet(p)
    }
  }

  /** Run a streaming DataFrame to completion against an in-memory sink
    * and return the result table (test/drain utility — W2 semantics). */
  def drainToTable(spark: SparkSession, df: DataFrame, name: String,
      complete: Boolean = true): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete() else OutputMode.Append())
      .trigger(drainTrigger)
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
