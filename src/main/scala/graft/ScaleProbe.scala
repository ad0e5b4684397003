package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Dev tool: replicate sf0.1 10x (keys shifted, doc text perturbed) into
  * /tmp/scale10 and time headline queries there vs sf0.1 — a superlinear
  * blowup here is a scale bug no sf0.1 bench would show. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/scale10"
    val copies = 10

    def replicate(name: String, keyCols: Map[String, Long]): Unit = {
      val base = Tables.table(spark, src, name)
      val reps = (0 until copies).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        } match {
          case df if name == "documents" && i > 0 =>
            df.withColumn("text",
              concat(col("text"), lit(" uniq"), col("doc_id")))
          case df => df
        }
      }
      reps.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    }
    // docs100: 100x documents/embeddings replica — the dedup/text
    // north-star stressed one decade beyond the full 10x probe
    // (500k docs). Every token is TAGGED with its copy index, so
    // cross-copy Jaccard is 0 and the corpus behaves like 100
    // independent organic corpora — the linear-growth scale test.
    // (An earlier suffix-only perturbation left all 100 copies mutual
    // near-dups: candidate generation still ran — 40 s for the 27M
    // pairs that corpus genuinely contains — but verifying 27M pairs
    // is the adversarial wall the bucket cap exists to fence, not the
    // organic path this probe measures.)
    def buildDocs100(out100: String): Unit = {
      val base = Tables.table(spark, src, "documents")
      (0 until 100).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", if (i == 0) col("text")
            else regexp_replace(col("text"), "(\\S+)", s"x${i}y$$1"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out100/documents.parquet")
      val emb = Tables.table(spark, src, "embeddings")
      (0 until 100).map { i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out100/embeddings.parquet")
      Tables.invalidateSpreadCache()
      println("BUILT scale100docs")
    }
    // curatefull: the COMPOSED chain (exact dedup + quality -> outlier
    // trim -> near-dup components -> rebalance) end-to-end at 500k
    // docs, with per-stage wall attribution from curateFull's own
    // eager stage boundaries — stages are individually probed above,
    // but the composed chain (with its intermediate materializations)
    // is what a user ships.
    if (args.headOption.contains("curatefull")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val stages = scala.collection.mutable.LinkedHashMap
        .empty[String, Double]
      val t0 = System.nanoTime()
      val curated = Pipeline.curateFull(
        Tables.documents(spark, out100), stageSeconds = Some(stages))
      curated.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val rows = curated.count()
      stages.update("5_rebalance_action",
        total - stages.values.sum)
      stages.toSeq.sortBy(_._1).foreach { case (s, sec) =>
        println(f"TIME curatefull $s $sec%.2f s")
      }
      println(f"TIME curatefull TOTAL $total%.2f s ($rows rows kept)")
      spark.stop()
      return
    }
    // q110serve: per-query SERVING latency of the persisted IVF-PQ
    // index at 100x (200k vectors), index pre-built — the number the
    // bench total can't show (it times a 2000-probe batch; production
    // serves one query at a time). Reports p50/p95/mean over
    // single-query probes after warmup.
    if (args.headOption.contains("q110serve")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val tb = System.nanoTime()
      val (cents, built) =
        operators.VectorQueries.ensureQ110Index(spark, out100)
      println(f"TIME q110serve index_build ${(System.nanoTime() - tb) / 1e9}%.2f s (ran=$built)")
      val path = operators.VectorQueries.q110IndexPath(out100)
      // % 997 stride: the replicated id space (100 windows of 5k ids,
      // 1M apart) holds only ~22 multiples of the old 9973 stride —
      // a 17-sample tail made p95 an outlier-reader. ~500 candidates
      // exist at 997; limit(50) -> 5 warmup + 45 measured.
      val probeVecs = Tables.embeddings(spark, out100)
        .filter(col("vec_id") % 997 === 0)
        .select(col("vec_id"), col("embedding"))
        .limit(50).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      import spark.implicits._
      def serveOnce(id: Long, emb: Seq[Float]): Double = {
        val q = Seq((id, emb)).toDF("query_id", "q_emb")
        val t0 = System.nanoTime()
        graft.vector.IvfPq.probe(spark, path, cents, q,
          m = 8, topK = 10, nProbe = 6, shortlist = 100)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      probeVecs.take(5).foreach { case (id, e) => serveOnce(id, e) } // warm
      val lats = probeVecs.drop(5).map { case (id, e) => serveOnce(id, e) }
        .sorted
      // nearest-rank: ceil(p*n)-th order statistic ((p*n).toInt reads
      // one rank high — p50 over 40 samples would report the 52.5th
      // percentile, inflating the published latencies)
      def pct(p: Double) = lats(math.min(lats.length - 1,
        math.ceil(p * lats.length).toInt - 1))
      println(f"TIME q110serve n=${lats.length} p50=${pct(0.50)}%.3f s p95=${pct(0.95)}%.3f s mean=${lats.sum / lats.length}%.3f s")
      spark.stop()
      return
    }
    // annsink: the streaming ANN index sink's per-batch cost curve at
    // 100x — base index built on 80% of the 200k-vector corpus, the
    // 40k-vector delta streamed in 1k-vector micro-batches through
    // annIndexSinkWriter. The claim being falsified: per batch =
    // fixed append cost + ONE column-pruned vec_id anti-join scan of
    // the growing index, i.e. LINEAR per-batch growth (the admission
    // sink's band-table argument, applied to the index table). Emits
    // the same curve/slope/ratio line as StreamBench so the two sinks'
    // evidence reads side by side in STREAMBENCH.md.
    if (args.headOption.contains("annsink")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val corpus = Tables.embeddings(spark, out100)
        .select(col("vec_id"), col("embedding"))
      val base = corpus.filter(col("vec_id") % 5 =!= 0)
      val delta = corpus.filter(col("vec_id") % 5 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-annsink").toString
      val path = s"$tmp/index"
      val tb = System.nanoTime()
      graft.vector.IvfPq.ensureBuilt(spark, base, m = 8, k = 256,
        nCentroids = 64, kmIters = 2, path)
      println(f"TIME annsink base_build ${(System.nanoTime() - tb) / 1e9}%.2f s (${base.count()} vectors)")
      val nBatches = (delta.count() / 1000L).toInt
      delta.repartition(nBatches)
        .write.mode("overwrite").parquet(s"$tmp/landing")
      val src = spark.readStream.option("maxFilesPerTrigger", "1")
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .parquet(s"$tmp/landing")
      val qName = "graft-annsink-probe"
      val batchSec =
        new java.util.concurrent.ConcurrentSkipListMap[Long, Double]()
      val listener =
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            if (e.progress.name == qName && e.progress.numInputRows > 0)
              Option(e.progress.durationMs.get("triggerExecution")).foreach(
                ms => batchSec.put(e.progress.batchId, ms.toDouble / 1e3))
        }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.annIndexSinkWriter(src, path,
        s"$tmp/ckpt").trigger(graft.streaming.Streams.drainTrigger)
        .queryName(qName).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.streams.removeListener(listener)
      // correctness floor before the numbers mean anything
      val idx = spark.read.parquet(path)
      require(idx.count() == corpus.count() &&
        idx.select("vec_id").distinct().count() == corpus.count(),
        "annsink probe: index must hold each corpus id exactly once")
      import scala.jdk.CollectionConverters._
      val curve = batchSec.entrySet().asScala.toSeq
        .map(e => e.getKey -> e.getValue)
      val steady = curve.drop(1).map(_._2)
      val half = steady.length / 2
      val ratio = (steady.drop(half).sum / (steady.length - half)) /
        (steady.take(half).sum / half)
      val slopeMs = {
        val n = steady.length
        val xm = (n - 1) / 2.0
        val ym = steady.sum / n
        val cov = steady.zipWithIndex
          .map { case (y, i) => (i - xm) * (y - ym) }.sum
        val vx = (0 until n).map(i => (i - xm) * (i - xm)).sum
        cov / vx * 1000.0
      }
      val curveJson = curve
        .map { case (b, s) => f"""[$b,$s%.2f]""" }.mkString(",")
      println(f"""{"metric":"annsink_batch_curve","unit":"sec/batch","rows":${delta.count()},"batches":${curve.length},"total_sec":$sec%.1f,"late_vs_early":$ratio%.2f,"slope_ms_per_batch":$slopeMs%.1f,"curve":[$curveJson]}""")
      spark.stop()
      return
    }
    // semdedup100: SemanticDedup at 500k vectors with the scale knob
    // turned (12 planes -> 4096 buckets, vs q116's 6 -> 64). The 100x
    // replica repeats each sf0.1 vector 100 times verbatim, so the
    // probe doubles as an end-to-end recall check: every copy beyond
    // a vector's first MUST be dominated (cosine exactly 1.0 lands in
    // the same bucket at any plane count) — survivors collapse back
    // to ~the organic 5k plus whatever the organic corpus itself
    // dominates.
    if (args.headOption.contains("semdedup100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val embs = Tables.embeddings(spark, out100)
      val nVecs = embs.count()
      val t0 = System.nanoTime()
      val f = graft.dedup.SemanticDedup.flagged(
        embs, "vec_id", "embedding", dim = 64, nPlanes = 12, theta = 0.3)
      val kept = f.filter(col("survivor")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIME semdedup100 $sec%.2f s " +
        f"($nVecs vectors -> $kept survivors)")
      // the replica's duplicate copies must all be gone: survivors
      // carry DISTINCT base ids (vec_id % 1000000 is the organic id)
      val dupSurvivors = f.filter(col("survivor"))
        .groupBy(col("vec_id") % 1000000L).count()
        .filter(col("count") > 1).count()
      println(s"CHECK semdedup100 duplicate-surviving base ids: " +
        s"$dupSurvivors (must be 0)")
      spark.stop()
      return
    }
    if (args.headOption.contains("docs100")) {
      val out100 = "/tmp/scale100docs"
      // the replica is deterministic, so an existing build is reused;
      // force a rebuild by deleting /tmp/scale100docs. args(1), when
      // given, substring-filters the query list (fast re-probes of
      // just-touched queries).
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val qs100 = Seq("q40_exact_dedup", "q41_minhash_bands",
        "q42_lsh_candidate_pairs", "q46_lsh_verified_dedup",
        "q47_simhash_banded", "q48_near_dup_components",
        "q82_contamination", "q87_doc_chunks", "q89_incremental_dedup",
        "q31_quality_filter", "q35_tfidf_top_terms",
        "q96_boilerplate_chunks", "q97_vocab_encode", "q98_token_rarity",
        "q99_source_dedup_rate", "q101_snapshot_diff",
        "q102_temperature_resample", "q103_bpe_pair_counts",
        "q104_length_outlier_trim", "q105_url_canonical_dedup",
        "q106_upsert_merge", "q107_repeated_spans", "q108_token_drift",
        "q109_bpe_merges", "q110_ivf_pq_ann", "q111_bpe_segment")
        .filter(n => args.lift(1).forall(n.contains))
      qs100.foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, out100)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val cnt = df.count()
        println(f"TIME docs100 $n $sec%.2f s ($cnt rows)")
      }
      spark.stop()
      return
    }
    // cdf100: the change feed's claim one decade up (500k docs, 10
    // range-sliced commits). The numbers that matter: a STEP diff
    // after a 500-row update must cost ∝ the ONE dir the update
    // touched — materially below the bootstrap read, which is the
    // honest ∝-table floor every CDC consumer pays exactly once.
    if (args.headOption.contains("cdf100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      val tc = "/tmp/scale100docs/docs_cdf"
      val fsC = new org.apache.hadoop.fs.Path(tc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsC.delete(new org.apache.hadoop.fs.Path(tc), true)
      val slice = math.max(n / 10, 1)
      val tb0 = System.nanoTime()
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(col("doc_id") >= i * slice &&
            (if (i == 9) lit(true) else col("doc_id") < (i + 1) * slice)),
          tc, statsCols = Seq("doc_id"))
      }
      println(f"TIME cdf100 ingest_10commits " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s ($n rows)")
      val t1 = System.nanoTime()
      graft.sinks.ManifestTable.updateRange(spark, tc, "doc_id",
        100L, 599L, Seq("n_chars" -> (col("n_chars") + 1)))
      println(f"TIME cdf100 update_500rows_1of10dirs " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
      val v = graft.sinks.ManifestTable.latestVersion(spark, tc).get
      val t2 = System.nanoTime()
      val step = graft.sinks.ManifestTable
        .readChanges(spark, tc, v - 1, v).count()
      println(f"TIME cdf100 step_diff_touched_dir " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s ($step change rows)")
      val t3 = System.nanoTime()
      val boot = graft.sinks.ManifestTable
        .readChanges(spark, tc, 0, v).count()
      println(f"TIME cdf100 bootstrap_floor " +
        f"${(System.nanoTime() - t3) / 1e9}%.2f s ($boot rows)")
      // the recovery path end-to-end: a fresh follower (the exact
      // stream rebootstrapChangesFollower starts) rebuilds the
      // replica from the current snapshot in ONE micro-batch — the
      // wall a lagged consumer pays ONCE after a vacuumed gap
      val t4 = System.nanoTime()
      val qb = graft.streaming.Streams.rebootstrapChangesFollower(
        spark, tc, s"$out100/docs_cdf_replica", "doc_id",
        s"$out100/docs_cdf_ckpt", statsCols = Seq("doc_id")).start()
      qb.processAllAvailable(); qb.stop()
      val rep = graft.sinks.ManifestTable.read(spark,
        s"$out100/docs_cdf_replica").count()
      println(f"TIME cdf100 follower_rebootstrap " +
        f"${(System.nanoTime() - t4) / 1e9}%.2f s ($rep replica rows)")
      spark.stop()
      return
    }
    // mc100: the ordered-clause MERGE's cost claim one decade up
    // (500k docs, 10 range-sliced commits). The numbers that matter:
    // a conditioned UPDATE/DELETE merge whose 500 keys live in ONE
    // dir must rewrite ∝ that dir (the composite of envelope + per-
    // row probe + Bloom pruning), while a NOT MATCHED BY SOURCE
    // statement honestly pays the whole-table rewrite — the gap IS
    // the prune.
    // gd100: the GENERAL-predicate SQL DELETE/UPDATE at 500k rows in
    // 10 range-disjoint dirs. The numbers that matter: a
    // mixed-conjunct statement (integral range AND string point — the
    // first statement a migrating Delta/Iceberg user writes) rewrites
    // ONLY the dirs the scan's own conjunct probe cannot rule out
    // (1 of 10 here), and the honest floor — a predicate the
    // extractors cannot bound (pure OR across columns) — rewrites
    // every dir once, exactly what any engine pays for it.
    if (args.headOption.contains("gd100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      val tg = "/tmp/scale100docs/docs_gd"
      val fsG = new org.apache.hadoop.fs.Path(tg)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsG.delete(new org.apache.hadoop.fs.Path(tg), true)
      val slice = 10000000L
      val tb0 = System.nanoTime()
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(col("doc_id") >= i * slice &&
            (if (i == 9) lit(true) else col("doc_id") < (i + 1) * slice)),
          tg, statsCols = Seq("doc_id", "lang", "n_chars"))
      }
      println(f"TIME gd100 ingest_10commits " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s ($n rows)")
      spark.read.format("graft-manifest").load(tg)
        .createOrReplaceTempView("gd_t")
      def dirs(): Set[String] = graft.sinks.ManifestTable.entriesOf(
        spark, tg,
        graft.sinks.ManifestTable.latestVersion(spark, tg).get)
        .map(_.dir).toSet
      // mixed conjuncts: the doc_id range pins dir 0, lang rides the
      // string bounds/Blooms — the general path's pruned shape
      val b1 = dirs()
      val t1 = System.nanoTime()
      spark.sql("DELETE FROM gd_t " +
        "WHERE doc_id BETWEEN 0 AND 5999 AND lang = 'de'")
      println(f"TIME gd100 delete_mixed_conjuncts " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"(${(b1 -- dirs()).size} of 10 dirs rewritten)")
      // an OR straddling the range still prunes on the extracted
      // conjunct (doc_id >= 9*slice): 1 of 10
      val b2 = dirs()
      val t2 = System.nanoTime()
      spark.sql("UPDATE gd_t SET n_chars = 0 " +
        s"WHERE doc_id >= ${9 * slice} AND " +
        "(lang = 'en' OR lang = 'fr')")
      println(f"TIME gd100 update_range_and_or " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s " +
        f"(${(b2 -- dirs()).size} of 10 dirs rewritten)")
      // the honest floor: nothing extractable — every dir pays once
      val b3 = dirs()
      val t3 = System.nanoTime()
      spark.sql("DELETE FROM gd_t " +
        "WHERE lang = 'no-such-lang' OR n_chars < 0")
      println(f"TIME gd100 delete_unboundable_floor " +
        f"${(System.nanoTime() - t3) / 1e9}%.2f s " +
        f"(${(b3 -- dirs()).size} of 10 dirs rewritten)")
      spark.stop()
      return
    }
    // nst100: NESTED-leaf stats at 500k rows — the raw-CVE-shaped
    // table's pruning story without a flattening pass. 10 dirs
    // range-disjoint on the LEAF meta.n (doc_id * 10 strides with
    // the copy offset); the numbers that matter: a pushed nested
    // range conjunct reads 1 of 10 dirs' files, and the same filter
    // over a stats-less nested table reads all 10 — the delta IS the
    // nested-stats machinery.
    if (args.headOption.contains("nst100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"),
          struct(col("lang"), (col("doc_id") * 10).as("n")).as("meta"))
      val n = docs.count()
      def build(path: String, stats: Seq[String]): Unit = {
        val fsN = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fsN.delete(new org.apache.hadoop.fs.Path(path), true)
        val slice = 100000000L // meta.n = doc_id * 10
        (0L until 10L).foreach { i =>
          graft.sinks.ManifestTable.append(spark,
            docs.filter(col("meta.n") >= i * slice &&
              (if (i == 9) lit(true)
               else col("meta.n") < (i + 1) * slice)),
            path, statsCols = stats)
        }
      }
      val tS = "/tmp/scale100docs/docs_nst"
      val tB = "/tmp/scale100docs/docs_nst_blind"
      val tb0 = System.nanoTime()
      build(tS, Seq("doc_id", "meta.lang", "meta.n"))
      println(f"TIME nst100 ingest_nested_stats " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s ($n rows)")
      build(tB, Seq("doc_id")) // same layout, NO nested stats
      def timedCount(path: String, label: String): Unit = {
        val t0 = System.nanoTime()
        // exchange-free shape (no AQE wrapper), so the executed
        // plan's FileSourceScanExec metrics are directly readable
        val df = spark.read.format("graft-manifest").load(path)
          .filter(col("meta.n") >= 950000000L &&
            col("meta.lang") =!= "zz")
          .select(col("doc_id"))
        val c = df.collect().length
        val files = df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numFiles").value
        }.sum
        val total = graft.sinks.ManifestTable.read(spark, path)
          .inputFiles.length
        println(f"TIME nst100 $label " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"($c rows, $files of $total files read)")
      }
      timedCount(tS, "nested_range_pruned")
      timedCount(tB, "nested_range_blind")
      spark.stop()
      return
    }
    // sqd100: subquery-predicate DML at 500k rows in 10 interleaved
    // dirs (doc_id % 10 — every dir's range spans the domain; only
    // per-dir Blooms discriminate, the scattered-key worst case).
    // The numbers that matter: a string IN-subquery delete routes
    // MERGE-ON-READ (zero data files rewritten, however many dirs
    // hold a key), the integral IN-list twin does too, and a scalar
    // subquery folds to the range fast path (whole expired dirs drop
    // from metadata alone).
    if (args.headOption.contains("sqd100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"),
          concat(lit("d"), col("doc_id")).as("key"),
          col("lang"), col("n_chars"))
      val n = docs.count()
      val tq = "/tmp/scale100docs/docs_sqd"
      val fsQ = new org.apache.hadoop.fs.Path(tq)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsQ.delete(new org.apache.hadoop.fs.Path(tq), true)
      val tb0 = System.nanoTime()
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(pmod(col("doc_id"), lit(10)) === i),
          tq, statsCols = Seq("doc_id"),
          bloomCols = Seq("key", "doc_id"))
      }
      println(f"TIME sqd100 ingest_10commits_interleaved " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s ($n rows)")
      spark.read.format("graft-manifest").load(tq)
        .createOrReplaceTempView("sqd_t")
      def fileMap(): Map[String, Any] = graft.sinks.ManifestTable
        .entriesOf(spark, tq,
          graft.sinks.ManifestTable.latestVersion(spark, tq).get)
        .map(e => e.dir -> e.files).toMap
      // 1k scattered string keys via an uncorrelated IN-subquery:
      // materialized at rule time, routed merge-on-read
      val b1 = fileMap()
      val t1 = System.nanoTime()
      spark.sql("DELETE FROM sqd_t WHERE key IN " +
        "(SELECT key FROM sqd_t WHERE doc_id % 500 = 7)")
      val same1 = fileMap() == b1
      println(f"TIME sqd100 delete_in_subquery_1k_keys " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"(zero data files rewritten: $same1)")
      // the integral IN-list twin, hand-written scattered keys
      val b2 = fileMap()
      val t2 = System.nanoTime()
      spark.sql("DELETE FROM sqd_t WHERE doc_id IN " +
        (0 until 500).map(i => i * 997L).mkString("(", ", ", ")"))
      val same2 = fileMap() == b2
      println(f"TIME sqd100 delete_int_inlist_500_keys " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s " +
        f"(zero data files rewritten: $same2)")
      // scalar subquery folds to the retention-range fast path
      val t3 = System.nanoTime()
      spark.sql("DELETE FROM sqd_t WHERE doc_id > " +
        "(SELECT max(doc_id) - 1000 FROM sqd_t)")
      println(f"TIME sqd100 delete_scalar_subquery_range " +
        f"${(System.nanoTime() - t3) / 1e9}%.2f s")
      spark.stop()
      return
    }
    // swap100: the stream-WAP sink's per-batch overhead vs the
    // main-path sink — same table shape, same 40 batches x 25k rows
    // through MemoryStream, then the fast-forward's cost for the
    // whole staged window. The claim under test: staging costs what
    // appending costs (one dir write + a slot claim + a constant
    // watermark probe — NOT a per-batch scan of the window), and the
    // publish is metadata-only however many batches accumulated.
    if (args.headOption.contains("swap100")) {
      implicit val sq = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val nBatches = 40
      val rowsPer = 25000L
      def drive(branch: Boolean): (Double, Double) = {
        val root = s"/tmp/swap100-${if (branch) "br" else "main"}"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val t = s"$root/table"
        graft.sinks.ManifestTable.append(spark,
          spark.range(1).toDF("id"), t, statsCols = Seq("id"))
        val mem = MemoryStream[Long]
        val writer =
          if (branch) graft.streaming.Streams.branchSinkWriter(
            mem.toDF.toDF("id"), t, "ingest", s"$root/ckpt",
            statsCols = Seq("id"))
          else graft.streaming.Streams.manifestSinkWriter(
            mem.toDF.toDF("id"), t, s"$root/ckpt",
            statsCols = Seq("id"))
        val q = writer.start()
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { b =>
          mem.addData((b * rowsPer) until ((b + 1) * rowsPer): _*)
          q.processAllAvailable()
        }
        val stageSec = (System.nanoTime() - t0) / 1e9
        q.stop()
        val t1 = System.nanoTime()
        if (branch)
          graft.sinks.ManifestTable.fastForwardBranch(spark, t, "ingest")
        val pubSec = (System.nanoTime() - t1) / 1e9
        val n = graft.sinks.ManifestTable.read(spark, t).count()
        require(n == nBatches * rowsPer + 1,
          s"swap100: expected ${nBatches * rowsPer + 1} rows, got $n")
        (stageSec, pubSec)
      }
      val (mainSec, _) = drive(branch = false)
      val (brSec, ffSec) = drive(branch = true)
      println(f"TIME swap100 main_sink_40x25k $mainSec%.2f s " +
        f"(${nBatches * rowsPer / mainSec}%.0f rows/s)")
      println(f"TIME swap100 branch_sink_40x25k $brSec%.2f s " +
        f"(${nBatches * rowsPer / brSec}%.0f rows/s, " +
        f"${brSec / mainSec}%.2fx main) + fast_forward $ffSec%.2f s " +
        "(metadata-only, 40 staged commits -> one atomic publish)")
      spark.stop()
      return
    }
    // annserve100: the adaptive-probe rule at PRODUCTION SHAPE — the
    // sf-test corpora have 8 coarse cells over 500 vectors, where a
    // 72% scan fraction is geometry, not policy; here 200k synthetic
    // vectors with 256 PLANTED direction clusters (deterministic
    // hash noise around hash centroids, unit-normalized) get a
    // 256-cell k-means++ index, and the SAME margin rule (slack 0.5,
    // minProbe 2) is measured for recall@10 and the per-query probe
    // budget. The claim under test: when cells are finer than
    // clusters, the rule probes a few cells, not a fraction of the
    // index.
    if (args.headOption.contains("annserve100")) {
      import org.apache.spark.sql.expressions.Window
      val nVec = 200000L
      val nClu = 256
      val dim = 64
      // two corpora: tight clusters (noise 0.3 — decisive
      // assignments, the rule should sit at minProbe) and
      // overlapping clusters (noise 0.9 — boundary-heavy, the rule
      // should SPEND more exactly where fixed-nProbe recall dies)
      for (noise <- Seq(0.3, 0.9)) {
      // deterministic planted-cluster corpus: centroid c's dim j is
      // a signed hash; a vector = its cluster centroid + 0.3-scaled
      // per-(id, j) hash noise, then unit-normalized by l2Norm
      def h(parts: org.apache.spark.sql.Column*) =
        (pmod(xxhash64(parts: _*), lit(2000001L)) - 1000000L) / 1e6
      val corpus = spark.range(nVec).toDF("vec_id")
        .withColumn("c", pmod(col("vec_id"), lit(nClu.toLong)))
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)),
            j => (h(col("c"), j) + lit(noise) * h(col("vec_id"), j))
              .cast("float")))
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val cents = graft.vector.VectorIndex
        .kmeansPpCentroids(corpus, nClu, iters = 2).localCheckpoint()
      val idx = s"/tmp/annserve100/index-$noise"
      graft.vector.VectorIndex.build(corpus, cents, idx)
      println(f"TIME annserve100 build_kmpp256_200k_noise$noise " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      // BOUNDARY queries by construction: each query is the mixture
      // of three corpus vectors from three DIFFERENT planted
      // clusters (cluster = id % 256), so its true top-10 spans ~3
      // cells — the case a fixed 2-cell budget cannot cover and the
      // margin rule must detect (three near-equal centroid scores)
      val queries = corpus.filter(col("vec_id") % 4000 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("e0"))
        .join(corpus.select((col("vec_id") - 1).as("query_id"),
          col("embedding").as("e1")), "query_id")
        .join(corpus.select((col("vec_id") - 2).as("query_id"),
          col("embedding").as("e2")), "query_id")
        .select(col("query_id"),
          zip_with(col("e0"), zip_with(col("e1"), col("e2"),
            (a, b) => a + b), (a, b) => (a + b).cast("float"))
            .as("q_emb"))
        .localCheckpoint()
      val nQ = queries.count()
      // truth: brute-force cosine top-10
      import graft.functions.VectorFunctions._
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val truth = corpus.crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rk", org.apache.spark.sql.functions
          .row_number().over(w))
        .filter(col("rk") <= 10)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val t1 = System.nanoTime()
      val got = graft.vector.VectorIndex.probeAdaptive(spark, idx,
        cents, queries, k = 10, slack = 0.5, minProbe = 2)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val wallP = (System.nanoTime() - t1) / 1e9
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      // the probe budget the margin rule actually spent, per query
      val wb = Window.partitionBy(col("query_id"))
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(col("csim").desc, col("cent_id"))
      val avgProbed = queries.crossJoin(broadcast(cents))
        .select(col("query_id"), col("cent_id"),
          cosine(col("q_emb"), col("c_emb")).as("csim"))
        .withColumn("best", max(col("csim")).over(wb))
        .withColumn("rk", org.apache.spark.sql.functions
          .row_number().over(wr))
        .filter(col("rk") <= 2 ||
          col("csim") >= col("best") - lit(0.5) * (lit(1.0) - col("best")))
        .groupBy("query_id").count()
        .agg(avg("count")).head().getDouble(0)
      // the fixed-nProbe=2 baseline at the same centroids — what
      // the adaptive spend buys on the boundary-heavy corpus
      val fixedGot = graft.vector.VectorIndex.probe(spark, idx,
        cents, queries, k = 10, nProbe = 2)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val fixedRecall = truth.map { case (q, t) =>
        fixedGot.getOrElse(q, Set.empty).intersect(t).size.toDouble /
          t.size
      }.sum / truth.size
      println(f"TIME annserve100 adaptive_probe_256cells_noise$noise " +
        f"$wallP%.2f s ($nQ queries: recall@10 $recall%.3f at avg " +
        f"$avgProbed%.1f/256 cells = ${avgProbed / nClu * 100}%.1f%% " +
        f"of the index; fixed nProbe=2 recall $fixedRecall%.3f)")
      }
      spark.stop()
      return
    }
    // ann2l100: the TWO-LEVEL coarse quantizer at a 10,000-cell
    // serving shape — the scale where the single-level coarse stage's
    // queries x centroids broadcast product stops being "tiny" (a
    // 10⁹–10¹⁰-vector corpus wants 10⁵–10⁶ cells). The numbers that
    // matter: recall holds vs the single-level probe at the same
    // centroids, and the level-1 prune admits a small FRACTION of
    // super-cells (hence of centroids) per query.
    if (args.headOption.contains("ann2l100")) {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions._
      val nVec = 200000L
      val nClu = 10000
      val nSuper = 100
      val dim = 64
      def h(parts: org.apache.spark.sql.Column*) =
        (pmod(xxhash64(parts: _*), lit(2000001L)) - 1000000L) / 1e6
      // HIERARCHICAL planted structure — the distribution shape
      // two-level quantization exists for (and real embedding
      // corpora have: topics containing subtopics): each vector =
      // its SUPER-cluster direction + a sub-cluster offset + noise.
      // On structureless data (10k uniformly random directions) the
      // super-centroids are means of near-orthogonal vectors — they
      // shrink toward zero and level-1 similarity carries no signal
      // (measured: the margin rule admits 80% of super-cells and
      // still loses 0.05 recall). That is a property of the data,
      // not the mechanism; the contract is multi-scale structure.
      val corpus = spark.range(nVec).toDF("vec_id")
        .withColumn("c", pmod(col("vec_id"), lit(nClu.toLong)))
        .withColumn("s", pmod(col("c"), lit(nSuper.toLong)))
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)),
            j => (h(col("s"), j) + lit(0.45) * h(col("c"), j)
              + lit(0.25) * h(col("vec_id"), j)).cast("float")))
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      // stride seeds, NO flat Lloyd pass: at 10k cells the flat
      // corpus x centroids assignment product OOMs (the exact wall
      // the two-level machinery removes) — the level-1 quantizer is
      // built over the centroid SET (10k rows, cheap), then the
      // index assignment itself goes hierarchical (buildHier)
      val cents = graft.vector.VectorIndex
        .centroids(corpus, nClu).localCheckpoint()
      val t1 = System.nanoTime()
      val (sc0, centToSuper0) = graft.vector.VectorIndex
        .superCentroids(cents, nSuper)
      val sc = sc0.localCheckpoint()
      val centToSuper = centToSuper0.localCheckpoint()
      println(f"TIME ann2l100 level1_build_100supers " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
      val idx = "/tmp/ann2l100/index"
      graft.vector.VectorIndex.buildHier(corpus, cents, sc,
        centToSuper, idx)
      println(f"TIME ann2l100 build_hier_10kcells_200k " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      val queries = corpus.filter(col("vec_id") % 4000 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("e0"))
        .join(corpus.select((col("vec_id") - 1).as("query_id"),
          col("embedding").as("e1")), "query_id")
        .select(col("query_id"),
          zip_with(col("e0"), col("e1"),
            (a, b) => (a + b).cast("float")).as("q_emb"))
        .localCheckpoint()
      val nQ = queries.count()
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val truth = corpus.crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      def recallOf(m: Map[Long, Set[Long]]): Double =
        truth.map { case (q, t) =>
          m.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
        }.sum / truth.size
      val t2 = System.nanoTime()
      val two = graft.vector.VectorIndex.probeAdaptive2(spark, idx,
        cents, sc, centToSuper, queries, k = 10,
        slack = 0.5, minProbe = 2, l1Slack = 1.0, l1MinProbe = 2)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val wall2 = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val one = graft.vector.VectorIndex.probeAdaptive(spark, idx,
        cents, queries, k = 10, slack = 0.5, minProbe = 2)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val wall1 = (System.nanoTime() - t3) / 1e9
      // the level-1 prune fraction: admitted (query, super) pairs
      // and the centroid fraction they expose, re-derived with the
      // probe's own expressions
      val wb1 = Window.partitionBy(col("query_id"))
      val wr1 = Window.partitionBy(col("query_id"))
        .orderBy(col("csim").desc, col("cent_id"))
      val admitted = queries.crossJoin(broadcast(sc))
        .select(col("query_id"), col("cent_id"),
          cosine(col("q_emb"), col("c_emb")).as("csim"))
        .withColumn("best", max(col("csim")).over(wb1))
        .withColumn("rk", row_number().over(wr1))
        .filter(col("rk") <= 2 ||
          col("csim") >= col("best") - lit(1.0) * (lit(1.0) - col("best")))
        .select(col("query_id"), col("cent_id").as("super_id"))
        .localCheckpoint()
      val supFrac = admitted.count().toDouble / (nQ * nSuper)
      val centFrac = admitted
        .join(centToSuper, "super_id").count().toDouble / (nQ * nClu)
      println(f"TIME ann2l100 probe_two_level $wall2%.2f s vs " +
        f"single_level $wall1%.2f s ($nQ queries over $nClu cells: " +
        f"recall@10 two=${recallOf(two)}%.3f one=${recallOf(one)}%.3f; " +
        f"level-1 admits ${supFrac * 100}%.1f%% of super-cells = " +
        f"${centFrac * 100}%.1f%% of centroids scored per query)")
      // the pin that isolates what the LEVEL-1 PRUNE costs: the
      // two-level probe must hold the single-level probe's recall at
      // the same quantizer (absolute recall at this shape is a
      // property of the stride seeding at 20 vectors/cell, measured
      // above, not of the two-level mechanism)
      require(recallOf(two) >= recallOf(one) - 0.02,
        f"ann2l100: level-1 pruning cost " +
          f"${recallOf(one) - recallOf(two)}%.3f recall — above the " +
          "0.02 budget")
      spark.stop()
      return
    }
    // sqj100: the OVER-CAP IN-subquery auto-route at 1M keys — the
    // REAL inline cap (100k), no lowering: a 4M-row table in 10
    // range-disjoint dirs, `DELETE WHERE doc_id IN (SELECT …)`
    // returning 1,000,000 keys. The pins that matter: the statement
    // routes merge-on-read (zero data files rewritten, the key set
    // never collected to the driver), and the dirs the tombstone
    // attaches to are EXACTLY the dirs whose stats admit a matching
    // key — the same overlap a scan of the predicate touches.
    if (args.headOption.contains("sqj100")) {
      val tq = "/tmp/scale100docs/docs_sqj"
      val fsQ = new org.apache.hadoop.fs.Path(tq)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsQ.delete(new org.apache.hadoop.fs.Path(tq), true)
      val rows = spark.range(0L, 4000000L).toDF("doc_id")
        .withColumn("lang",
          element_at(array(lit("en"), lit("de"), lit("fr")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      val tb0 = System.nanoTime()
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          rows.filter(col("doc_id") >= i * 400000L &&
            col("doc_id") < (i + 1) * 400000L),
          tq, statsCols = Seq("doc_id"))
      }
      println(f"TIME sqj100 ingest_10commits_rangedisjoint " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s (4000000 rows)")
      spark.read.format("graft-manifest").load(tq)
        .createOrReplaceTempView("sqj_t")
      def entriesNow() = graft.sinks.ManifestTable.entriesOf(spark, tq,
        graft.sinks.ManifestTable.latestVersion(spark, tq).get)
      val before = entriesNow()
      // the scan-probe overlap: dirs whose recorded range admits a
      // matching key (keys live in doc_id < 2M -> 5 of 10 dirs)
      val overlap = before.count(_.statMin.get("doc_id")
        .exists(_ < 2000000L))
      val t1 = System.nanoTime()
      spark.sql("DELETE FROM sqj_t WHERE doc_id IN " +
        "(SELECT doc_id FROM sqj_t " +
        "WHERE doc_id < 2000000 AND doc_id % 2 = 0)")
      val wall = (System.nanoTime() - t1) / 1e9
      val after = entriesNow()
      val sameFiles = after.map(e => e.dir -> e.files).toMap ==
        before.map(e => e.dir -> e.files).toMap
      val beforeDv = before.map(e => e.dir -> e.dv).toMap
      val tombstoned = after.count(e => beforeDv.get(e.dir)
        .exists(_ != e.dv))
      val v = graft.sinks.ManifestTable.latestVersion(spark, tq).get
      val routed = graft.sinks.ManifestTable.commitInfoOf(spark, tq, v)
        .exists(_._1 == "deleteKeys")
      // fresh read — the temp view stays pinned at its own snapshot
      // (isolation), so the post-delete count needs a new relation
      val n = graft.sinks.ManifestTable.read(spark, tq).count()
      println(f"TIME sqj100 delete_in_subquery_1M_keys $wall%.2f s " +
        f"(routed_deleteKeys: $routed, zero data files rewritten: " +
        f"$sameFiles, dirs tombstoned: $tombstoned == scan overlap: " +
        f"$overlap -> ${tombstoned == overlap}, survivors: $n)")
      // the UPDATE twin: 1M keys (the surviving odd half of the low
      // range) route the frame-keyed COPY-ON-WRITE update — only the
      // 5 key-overlapping dirs rewrite, the other 5 stay untouched
      spark.read.format("graft-manifest").load(tq)
        .createOrReplaceTempView("sqj_t2")
      val beforeU = entriesNow()
      val overlapU = beforeU.count(_.statMin.get("doc_id")
        .exists(_ < 2000000L))
      val t2 = System.nanoTime()
      spark.sql("UPDATE sqj_t2 SET lang = 'xx' WHERE doc_id IN " +
        "(SELECT doc_id FROM sqj_t2 " +
        "WHERE doc_id < 2000000 AND doc_id % 2 = 1)")
      val wallU = (System.nanoTime() - t2) / 1e9
      val vU = graft.sinks.ManifestTable.latestVersion(spark, tq).get
      val routedU = graft.sinks.ManifestTable.commitInfoOf(spark, tq, vU)
        .exists(_._1 == "updateKeysFrame")
      val afterU = entriesNow()
      val beforeDirs = beforeU.map(e => e.dir -> e.files).toMap
      val rewrittenU = afterU.count(e => !beforeDirs.contains(e.dir))
      val patched = graft.sinks.ManifestTable.read(spark, tq)
        .filter(col("lang") === "xx").count()
      println(f"TIME sqj100 update_in_subquery_1M_keys $wallU%.2f s " +
        f"(routed_updateKeysFrame: $routedU, dirs rewritten: " +
        f"$rewrittenU == scan overlap: $overlapU -> " +
        f"${rewrittenU == overlapU}, rows patched: $patched)")
      spark.stop()
      return
    }
    // annfollow100: the ANN-index CDC follower loop at 500k vectors —
    // corpus table -> change feed -> persisted IVF-PQ index. The
    // numbers that matter: a 50k-key GDPR delete propagates as ONE
    // tombstone write (zero index files touched), the probe's
    // tombstone mask costs a broadcast anti-join until compact
    // materializes it, and the follower batch cost is delta-sized,
    // never index-sized.
    if (args.headOption.contains("annfollow100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val corpus = Tables.embeddings(spark, out100)
        .select(col("vec_id"), col("embedding"))
      val n = corpus.count()
      val tc = "/tmp/scale100docs/vec_corpus"
      val fsC = new org.apache.hadoop.fs.Path(tc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsC.delete(new org.apache.hadoop.fs.Path(tc), true)
      graft.sinks.ManifestTable.append(spark, corpus, tc,
        statsCols = Seq("vec_id"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-annfollow").toString
      val path = s"$tmp/index"
      val tb = System.nanoTime()
      graft.vector.IvfPq.ensureBuilt(spark,
        graft.sinks.ManifestTable.read(spark, tc), m = 8, k = 256,
        nCentroids = 64, kmIters = 2, path)
      println(f"TIME annfollow100 base_build " +
        f"${(System.nanoTime() - tb) / 1e9}%.2f s ($n vectors)")
      def follow() = graft.streaming.Streams.annIndexChangesFollower(
        spark.readStream.format("graft-manifest")
          .option("readChangeFeed", "true").load(tc),
        path, s"$tmp/ckpt")
        .trigger(graft.streaming.Streams.drainTrigger).start()
      // bootstrap: 500k insert events anti-joined against the live
      // index — the one index-sized pass a fresh checkpoint pays
      val t0 = System.nanoTime()
      val q0 = follow(); q0.awaitTermination()
      println(f"TIME annfollow100 bootstrap_noop " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      // the GDPR wave: 50k keys deleted upstream + 10k re-embedded
      // (update = delete-pre + insert-post through the feed)
      val dead = corpus.filter(col("vec_id") % 10 === 3)
        .select("vec_id")
      val nDead = dead.count()
      graft.sinks.ManifestTable.deleteKeys(spark, dead, tc, "vec_id")
      graft.sinks.ManifestTable.updateRange(spark, tc, "vec_id",
        0L, 9999L, Seq("embedding" ->
          slice(concat(col("embedding"), col("embedding")),
            lit(1), size(col("embedding")))))
      val t1 = System.nanoTime()
      val q1 = follow(); q1.awaitTermination()
      println(f"TIME annfollow100 follow_delete${nDead}_update10k " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
      val live = graft.vector.IvfPq.live(spark, path)
      val liveN = live.count()
      val srcN = graft.sinks.ManifestTable.read(spark, tc).count()
      require(liveN == srcN && live.select("vec_id").distinct()
          .count() == srcN,
        s"annfollow100: index diverged (live=$liveN src=$srcN)")
      val cents = graft.vector.IvfPq.centroidsOf(spark, path)
      val queries = corpus.filter(col("vec_id") % 100000 === 1)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb"))
      def probeOnce(tag: String): Seq[org.apache.spark.sql.Row] = {
        val t = System.nanoTime()
        val r = graft.vector.IvfPq.probeAdaptive(spark, path, cents,
          queries, m = 8, topK = 10, shortlist = 150).collect().toSeq
        println(f"TIME annfollow100 probe_$tag " +
          f"${(System.nanoTime() - t) / 1e9}%.2f s (${r.length} rows)")
        r
      }
      val masked = probeOnce("masked")
      require(!masked.exists(r => r.getLong(2) % 10 == 3),
        "annfollow100: a deleted key surfaced")
      val t2 = System.nanoTime()
      graft.vector.IvfPq.compact(spark, path)
      println(f"TIME annfollow100 compact_materialize " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s")
      val after = probeOnce("materialized")
      require(after == masked,
        "annfollow100: compact changed probe results")
      spark.stop()
      return
    }
    // brd100: branch-scoped DML at 500k rows — the audit-fix loop at
    // scale: main holds half, a branch stages the other half in 5
    // range-disjoint commits, a staged-only DELETE rewrites ONLY the
    // commits whose recorded stats admit a match, compactBranch
    // flattens the commit drip, fast-forward publishes as one commit.
    if (args.headOption.contains("brd100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      val tb = "/tmp/scale100docs/docs_brd"
      val fsB = new org.apache.hadoop.fs.Path(tb)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsB.delete(new org.apache.hadoop.fs.Path(tb), true)
      val half = 50000000L // doc_id domain: base + i*1M, i in 0..99
      graft.sinks.ManifestTable.append(spark,
        docs.filter(col("doc_id") < half), tb,
        statsCols = Seq("doc_id", "lang"))
      graft.sinks.ManifestTable.createBranch(spark, tb, "fix")
      val slice = 10000000L
      val tb0 = System.nanoTime()
      (0L until 5L).foreach { i =>
        graft.sinks.ManifestTable.appendToBranch(spark,
          docs.filter(col("doc_id") >= half + i * slice &&
            (if (i == 4) lit(true)
             else col("doc_id") < half + (i + 1) * slice)),
          tb, "fix", statsCols = Seq("doc_id", "lang"))
      }
      println(f"TIME brd100 branch_ingest_5commits " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s (~${n / 2} rows)")
      // staged-only DELETE: the doc_id conjunct pins ONE commit
      import org.apache.spark.sql.catalyst.expressions.{
        AttributeReference, GreaterThanOrEqual, Literal => CLit}
      import org.apache.spark.sql.types.LongType
      val t1 = System.nanoTime()
      val touched = graft.sinks.ManifestTable.deleteFromBranch(spark,
        tb, "fix",
        col("doc_id") >= (half + 4 * slice) && col("lang") === "de",
        Seq(GreaterThanOrEqual(
          AttributeReference("doc_id", LongType)(),
          CLit(half + 4 * slice))))
      println(f"TIME brd100 branch_delete_pruned " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"($touched of 5 staged dirs rewritten)")
      val t2 = System.nanoTime()
      val (cb, ca) = graft.sinks.ManifestTable.compactBranch(
        spark, tb, "fix")
      println(f"TIME brd100 compact_branch " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s " +
        f"($cb commits -> $ca)")
      val t3 = System.nanoTime()
      graft.sinks.ManifestTable.fastForwardBranch(spark, tb, "fix")
      println(f"TIME brd100 fast_forward " +
        f"${(System.nanoTime() - t3) / 1e9}%.2f s " +
        f"(${graft.sinks.ManifestTable.read(spark, tb).count()} rows)")
      spark.stop()
      return
    }
    if (args.headOption.contains("mc100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      val tm = "/tmp/scale100docs/docs_mc"
      val fsM = new org.apache.hadoop.fs.Path(tm)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsM.delete(new org.apache.hadoop.fs.Path(tm), true)
      // scale100 ids live at copy*1M + [0, ~5000]: 10M-wide value
      // slices give 10 equal, range-disjoint dirs (10 copies each)
      val slice = 10000000L
      val tb0 = System.nanoTime()
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(col("doc_id") >= i * slice &&
            (if (i == 9) lit(true) else col("doc_id") < (i + 1) * slice)),
          tm, statsCols = Seq("doc_id"))
      }
      println(f"TIME mc100 ingest_10commits " +
        f"${(System.nanoTime() - tb0) / 1e9}%.2f s ($n rows)")
      import spark.implicits._
      // 500 keys inside dir 0 (+100 delete markers), 100 fresh inserts
      val src = docs.filter(col("doc_id") < 600)
        .withColumn("n_chars",
          when(col("doc_id") % 6 === 0, lit(-1L))
            .otherwise(col("n_chars") + 1000))
        .unionByName(docs.filter(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 1000000000L))
      val t1 = System.nanoTime()
      val (_, touched) = graft.sinks.ManifestTable.mergeClauses(spark,
        src, tm, Seq("doc_id"),
        matched = Seq(
          (Some(col("_src_n_chars") < 0),
            graft.sinks.ManifestTable.MergeClauseAction.Delete),
          (None, graft.sinks.ManifestTable.MergeClauseAction.Update(
            Seq("n_chars" -> col("_src_n_chars"))))),
        notMatchedInsert = Seq(None))
      println(f"TIME mc100 merge_3clause_1of10dirs " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"($touched dirs rewritten)")
      // the honest floor: a BY SOURCE clause can claim any row, so
      // every dir rewrites
      val t2 = System.nanoTime()
      val (_, touchedAll) = graft.sinks.ManifestTable.mergeClauses(spark,
        docs.filter(col("doc_id") < 600), tm, Seq("doc_id"),
        matched = Seq((None,
          graft.sinks.ManifestTable.MergeClauseAction.Update(
            Seq("n_chars" -> col("_src_n_chars"))))),
        notMatchedBySource = Seq((Some(col("doc_id") % 1000000 === 999999),
          graft.sinks.ManifestTable.MergeClauseAction.Delete)))
      println(f"TIME mc100 merge_by_source_floor " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s " +
        f"($touchedAll dirs rewritten)")
      spark.stop()
      return
    }
    // cm100: the column-rename claims one decade up (500k docs, 10
    // range-disjoint dirs). The numbers that matter: the rename
    // itself is METADATA-ONLY (flat whatever the table holds), a
    // full-table aggregate reads the SAME wall before and after the
    // rename (field-id resolution is the stock vectorized reader —
    // zero plan change), and a pruned read on the RENAMED column
    // still skips the disjoint dirs (stats rekeyed, not lost).
    if (args.headOption.contains("cm100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      val tr = "/tmp/scale100docs/docs_cm"
      val fsR = new org.apache.hadoop.fs.Path(tr)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsR.delete(new org.apache.hadoop.fs.Path(tr), true)
      val slice = 10000000L
      (0L until 10L).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(col("doc_id") >= i * slice &&
            (if (i == 9) lit(true) else col("doc_id") < (i + 1) * slice)),
          tr, statsCols = Seq("doc_id", "n_chars"))
      }
      def fullAgg(c: String): Long = {
        val t0 = System.nanoTime()
        graft.sinks.ManifestTable.read(spark, tr)
          .agg(sum(col(c))).collect()
        System.nanoTime() - t0
      }
      fullAgg("n_chars") // warm page cache
      val pre = fullAgg("n_chars")
      println(f"TIME cm100 full_agg_before_rename ${pre / 1e9}%.2f s ($n rows)")
      val t1 = System.nanoTime()
      graft.sinks.ManifestTable.renameColumn(spark, tr, "n_chars", "chars")
      println(f"TIME cm100 rename_metadata_only " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
      val post = fullAgg("chars")
      println(f"TIME cm100 full_agg_after_rename ${post / 1e9}%.2f s " +
        f"(ratio ${post.toDouble / pre}%.2f)")
      val t3 = System.nanoTime()
      val pruned = spark.read.format("graft-manifest").load(tr)
        .filter(col("doc_id") < slice)
        .agg(sum(col("chars"))).collect()
      println(f"TIME cm100 pruned_read_renamed_col " +
        f"${(System.nanoTime() - t3) / 1e9}%.2f s " +
        f"(1 of 10 dirs via rekeyed doc_id stats)")
      spark.stop()
      return
    }
    // part100: the hidden-partitioning claims one decade past the 10x
    // probe (500k docs, 10 commits x 5 languages = 50 pure dirs). The
    // number that matters: dropPartitions' wall must be FLAT from 10x
    // to 100x — it is one manifest commit whatever the partition's
    // bytes — while the data-path ops (ingest, repartition fold) grow
    // linearly like any scan.
    if (args.headOption.contains("part100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
      val tp = "/tmp/scale100docs/docs_part"
      val fsP = new org.apache.hadoop.fs.Path(tp)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsP.delete(new org.apache.hadoop.fs.Path(tp), true)
      val tb = System.nanoTime()
      (0 until 10).foreach { i =>
        graft.sinks.ManifestTable.append(spark,
          docs.filter(pmod(col("doc_id"), lit(10)) === i), tp,
          statsCols = Seq("doc_id"),
          partitionSpec = Seq(
            graft.sinks.PartitionTransform.PIdentity("lang")))
      }
      val vB = graft.sinks.ManifestTable.latestVersion(spark, tp).get
      val nDirs = graft.sinks.ManifestTable.entriesOf(spark, tp, vB)
        .count(_.files.exists(_.nonEmpty))
      println(f"TIME part100 ingest_10x " +
        f"${(System.nanoTime() - tb) / 1e9}%.2f s ($nDirs pure dirs)")
      val tr = System.nanoTime()
      val enR = graft.sinks.ManifestTable.readPartitions(spark, tp,
        Map("lang" -> "en"))
      val enN = enR.agg(count(lit(1))).head().getLong(0)
      println(f"TIME part100 read_one_lang " +
        f"${(System.nanoTime() - tr) / 1e9}%.2f s " +
        f"($enN rows, ${enR.inputFiles.length} of $nDirs files)")
      val td = System.nanoTime()
      val (_, nd) = graft.sinks.ManifestTable.dropPartitions(spark,
        tp, Map("lang" -> "en"))
      println(f"TIME part100 drop_metadata_only " +
        f"${(System.nanoTime() - td) / 1e9}%.2f s " +
        f"($nd dirs dropped, $enN rows unreferenced, zero moved)")
      val tq = System.nanoTime()
      graft.sinks.ManifestTable.repartitionTable(spark, tp,
        sortWithin = Seq("doc_id"))
      val vR = graft.sinks.ManifestTable.latestVersion(spark, tp).get
      val nAfter = graft.sinks.ManifestTable.entriesOf(spark, tp, vR)
        .count(_.files.exists(_.nonEmpty))
      println(f"TIME part100 repartition_fold_sorted " +
        f"${(System.nanoTime() - tq) / 1e9}%.2f s " +
        f"(${nDirs - nd} dirs -> $nAfter, id-sorted within)")
      fsP.delete(new org.apache.hadoop.fs.Path(tp), true)
      spark.stop()
      return
    }
    // keyword100: the q122 inverted-index claim at 500k docs — one-off
    // posting build, then conjunctive keyword search via the index vs
    // the brute-force text scan (same answer asserted). The scan's
    // cost is reading+tokenizing every document's text; the index path
    // reads the term slices + a key semi-join. The perturbed replica
    // tags tokens per copy (x{i}y prefix), so the probed terms exist
    // only in copy 0 — the selective regime an index serves.
    if (args.headOption.contains("keyword100")) {
      val out100 = "/tmp/scale100docs"
      if (!new java.io.File(s"$out100/documents.parquet").exists())
        buildDocs100(out100)
      val docs = Tables.documents(spark, out100)
      val postings = s"$out100/postings"
      val tb0 = System.nanoTime()
      graft.text.InvertedIndex.build(docs, postings, 16)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val pBytes = new java.io.File(postings).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      println(f"TIME keyword100 build $buildSec%.2f s " +
        f"postings_mb=${pBytes / 1e6}%.1f")
      val terms = Seq("dup", "vector")
      def timed(label: String)(df: => DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIME keyword100 $label $sec%.2f s ($n rows)")
        n
      }
      val viaScan = timed("text_scan") {
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        docs.withColumn("toks", toks)
          .filter(terms.map(t => array_contains(col("toks"), t))
            .reduce(_ && _))
          .select("doc_id")
      }
      val viaIndex = timed("index_search") {
        graft.text.InvertedIndex
          .search(spark, postings, docs, terms).select("doc_id")
      }
      assert(viaScan == viaIndex, s"parity: scan=$viaScan index=$viaIndex")
      // ranked (BM25) and phrase search at the same scale: both serve
      // from their own one-off index build; the brute-force phrase
      // scan is the comparison point (ranked has no scan equivalent
      // cheaper than recomputing BM25 corpus-wide)
      val scoredPath = s"$out100/postings_scored"
      val ts0 = System.nanoTime()
      graft.text.InvertedIndex.buildScored(docs, scoredPath, 16)
      println(f"TIME keyword100 scored_build ${(System.nanoTime() - ts0) / 1e9}%.2f s")
      timed("ranked_search") {
        graft.text.InvertedIndex.rankedSearch(spark, scoredPath, terms, 100)
      }
      val posPath = s"$out100/postings_positional"
      val tp0 = System.nanoTime()
      graft.text.InvertedIndex.buildPositional(docs, posPath, 16)
      println(f"TIME keyword100 positional_build ${(System.nanoTime() - tp0) / 1e9}%.2f s")
      val phrase = Seq("big", "order", "scan")
      val phraseScan = timed("phrase_text_scan") {
        docs.withColumn("joined",
            concat(lit(" "), concat_ws(" ",
              graft.functions.TextFunctions.tokens(col("text"))), lit(" ")))
          .filter(col("joined").contains(" " + phrase.mkString(" ") + " "))
          .select("doc_id")
      }
      val phraseIdx = timed("phrase_index") {
        graft.text.InvertedIndex
          .phraseSearch(spark, posPath, docs, phrase).select("doc_id")
      }
      assert(phraseScan == phraseIdx,
        s"phrase parity: scan=$phraseScan index=$phraseIdx")
      spark.stop()
      return
    }
    // manifest10: the q127-q129 manifest-table claims at 10x (50k
    // docs, 40 commits) — wall AND files-touched for the full
    // snapshot read vs the stats-pruned read vs the incremental
    // (since-checkpoint) read. On local FS the wall deltas are mostly
    // decode work; the files-touched counts are the part that scales
    // to object stores (each untouched dir = skipped LIST + GETs).
    if (args.headOption.contains("manifest10")) {
      if (!new java.io.File(s"$out/documents.parquet").exists()) {
        replicate("documents", Map("doc_id" -> 1000000L))
        Tables.invalidateSpreadCache()
      }
      val docs = Tables.documents(spark, out)
      val n = docs.count()
      val t = "/tmp/scale10/docs_manifest40"
      org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // commit boundaries from the ACTUAL id distribution (the 10x
      // replica's ids are stride-shifted, not contiguous): 40 equal
      // quantile slices, so every commit holds ~n/40 rows and carries
      // tight disjoint stats
      import spark.implicits._
      val sortedIds = docs.select(col("doc_id")).as[Long]
        .collect().sorted
      val bounds = (0 until 40).map(i =>
        sortedIds((i * sortedIds.length / 40).toInt))
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$t/manifest"))) {
        val tb0 = System.nanoTime()
        (0 until 40).foreach { i =>
          val loOk = if (i == 0) lit(true) else col("doc_id") >= bounds(i)
          val hiOk =
            if (i == 39) lit(true) else col("doc_id") < bounds(i + 1)
          graft.sinks.ManifestTable.append(spark,
            docs.filter(loOk && hiOk), t, tag = i,
            statsCols = Seq("doc_id"))
        }
        println(f"TIME manifest10 build40 ${(System.nanoTime() - tb0) / 1e9}%.2f s")
      }
      def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        df.agg(count(lit(1))).head() // warm
        val d2 = df
        val t0 = System.nanoTime()
        val rows = d2.agg(count(lit(1))).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIME manifest10 $label $sec%.2f s " +
          f"($rows rows, ${d2.inputFiles.length} files)")
      }
      timed("full_snapshot") {
        graft.sinks.ManifestTable.read(spark, t)
      }
      timed("pruned_1of40") {
        graft.sinks.ManifestTable
          .readPruned(spark, t, "doc_id", bounds(7), bounds(8) - 1)
          .filter(col("doc_id").between(bounds(7), bounds(8) - 1))
      }
      timed("since_v39") {
        graft.sinks.ManifestTable.readSince(spark, t, 39L)
      }
      // the SQL surface: the same 1-of-40 range as pruned_1of40, but
      // as a pushed-down WHERE on the graft-manifest source — files
      // planned comes from the EXECUTED scan's numFiles metric (the
      // FileIndex prunes at listFiles time, so the relation's static
      // inputFiles list would overstate what the query touched)
      locally {
        def q = spark.read.format("graft-manifest").load(t)
          .filter(col("doc_id").between(bounds(7), bounds(8) - 1))
          .select(col("doc_id"))
        q.collect() // warm
        val d2 = q
        val t0 = System.nanoTime()
        val rows = d2.collect().length
        val sec = (System.nanoTime() - t0) / 1e9
        val nFiles = d2.queryExecution.executedPlan.collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numFiles").value
        }.getOrElse(-1L)
        println(f"TIME manifest10 sql_pruned_1of40 $sec%.2f s " +
          f"($rows rows, $nFiles files)")
      }
      // merge + cluster probes mutate the table — run them on a
      // throwaway copy so the cached 40-commit table stays pristine
      // for re-runs
      locally {
        val tCopy = "/tmp/scale10/docs_manifest40_mut"
        val conf = spark.sessionState.newHadoopConf()
        fs.delete(new org.apache.hadoop.fs.Path(tCopy), true)
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(t), fs,
          new org.apache.hadoop.fs.Path(tCopy), false, conf)
        // merge: rewrite every doc in ONE commit's key range (the
        // 100 TB shape — update cost ∝ dirs hit, not table size),
        // plus 100 fresh high-keyed inserts
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val updates = docs
          .filter(col("doc_id").between(bounds(7), bounds(8) - 1))
          .withColumn("n_chars", col("n_chars") + 1)
          .select(cols.map(col): _*)
        val inserts = docs.orderBy("doc_id").limit(100)
          .withColumn("doc_id", col("doc_id") + (1L << 41))
          .select(cols.map(col): _*)
        val tm0 = System.nanoTime()
        val (_, rewritten) = graft.sinks.ManifestTable.merge(spark,
          updates.unionByName(inserts), tCopy, "doc_id")
        println(f"TIME manifest10 merge_1of40 " +
          f"${(System.nanoTime() - tm0) / 1e9}%.2f s " +
          f"($rewritten of 40 dirs rewritten)")
        // cluster: the OPTIMIZE rewrite, 41 dirs -> 8 range-disjoint
        val tc0 = System.nanoTime()
        graft.sinks.ManifestTable.cluster(spark, tCopy, "doc_id", 8)
        val cSec = (System.nanoTime() - tc0) / 1e9
        val probe = graft.sinks.ManifestTable
          .readPruned(spark, tCopy, "doc_id", bounds(7), bounds(8) - 1)
        println(f"TIME manifest10 cluster_to8 $cSec%.2f s " +
          f"(post-cluster probe plans ${probe.inputFiles.length} files)")
        fs.delete(new org.apache.hadoop.fs.Path(tCopy), true)
      }
      // deletion-vector probe, on its own throwaway copy: a
      // SCATTERED-key delete (200 ids spread over every commit — the
      // workload where copy-on-write rewrites all 40 dirs) must cost
      // one tombstone write + a metadata commit with ZERO dirs
      // rewritten; then the read tax (broadcast anti-join) and the
      // one-staged-job materialization are measured separately
      locally {
        val tCopy = "/tmp/scale10/docs_manifest40_dv"
        val conf = spark.sessionState.newHadoopConf()
        fs.delete(new org.apache.hadoop.fs.Path(tCopy), true)
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(t), fs,
          new org.apache.hadoop.fs.Path(tCopy), false, conf)
        val keys = docs.filter(pmod(col("doc_id"), lit(250)) === 0)
          .select("doc_id")
        val nKeys = keys.count()
        val td0 = System.nanoTime()
        val (_, tombstoned) = graft.sinks.ManifestTable.deleteKeys(
          spark, keys, tCopy, "doc_id")
        println(f"TIME manifest10 dv_delete_scattered " +
          f"${(System.nanoTime() - td0) / 1e9}%.2f s " +
          f"($nKeys keys, $tombstoned dirs tombstoned, 0 rewritten)")
        val tr0 = System.nanoTime()
        val n = graft.sinks.ManifestTable.read(spark, tCopy)
          .agg(count(lit(1))).head().getLong(0)
        println(f"TIME manifest10 dv_read_tax " +
          f"${(System.nanoTime() - tr0) / 1e9}%.2f s ($n rows)")
        val tw0 = System.nanoTime()
        val (_, matDirs) = graft.sinks.ManifestTable.rewriteDeletes(
          spark, tCopy)
        println(f"TIME manifest10 dv_materialize " +
          f"${(System.nanoTime() - tw0) / 1e9}%.2f s " +
          f"($matDirs dirs rewritten in one staged job)")
        fs.delete(new org.apache.hadoop.fs.Path(tCopy), true)
      }
      // hidden-partitioning probe at the same 10x: ingest 8 commits
      // against an identity(lang) spec (8 x 5 languages = 40 pure
      // dirs), read ONE language (files planned ∝ that language's
      // dirs), DROP it metadata-only (wall must not scale with the
      // partition's rows — it moves none), then repartitionTable
      // folds the survivors to one dir per language
      locally {
        val tp = "/tmp/scale10/docs_manifest_part"
        fs.delete(new org.apache.hadoop.fs.Path(tp), true)
        val tb = System.nanoTime()
        (0 until 8).foreach { i =>
          graft.sinks.ManifestTable.append(spark,
            docs.filter(pmod(col("doc_id"), lit(8)) === i), tp,
            statsCols = Seq("doc_id"),
            partitionSpec = Seq(
              graft.sinks.PartitionTransform.PIdentity("lang")))
        }
        val vB = graft.sinks.ManifestTable.latestVersion(spark, tp).get
        val nDirs = graft.sinks.ManifestTable.entriesOf(spark, tp, vB)
          .count(_.files.exists(_.nonEmpty))
        println(f"TIME manifest10 part_ingest_8x " +
          f"${(System.nanoTime() - tb) / 1e9}%.2f s " +
          f"($nDirs pure dirs)")
        val tr = System.nanoTime()
        val enR = graft.sinks.ManifestTable.readPartitions(spark, tp,
          Map("lang" -> "en"))
        val enN = enR.agg(count(lit(1))).head().getLong(0)
        println(f"TIME manifest10 part_read_one_lang " +
          f"${(System.nanoTime() - tr) / 1e9}%.2f s " +
          f"($enN rows, ${enR.inputFiles.length} of $nDirs files)")
        val td = System.nanoTime()
        val (_, nd) = graft.sinks.ManifestTable.dropPartitions(spark,
          tp, Map("lang" -> "en"))
        println(f"TIME manifest10 part_drop_metadata_only " +
          f"${(System.nanoTime() - td) / 1e9}%.2f s " +
          f"($nd dirs dropped, $enN rows unreferenced, zero moved)")
        val tq = System.nanoTime()
        graft.sinks.ManifestTable.repartitionTable(spark, tp)
        val vR = graft.sinks.ManifestTable.latestVersion(spark, tp).get
        val nAfter = graft.sinks.ManifestTable.entriesOf(spark, tp, vR)
          .count(_.files.exists(_.nonEmpty))
        println(f"TIME manifest10 part_repartition_fold " +
          f"${(System.nanoTime() - tq) / 1e9}%.2f s " +
          f"(${nDirs - nd} dirs -> $nAfter, one per language)")
        fs.delete(new org.apache.hadoop.fs.Path(tp), true)
      }
      spark.stop()
      return
    }
    // bloom10: the q113 runtime-filter claim, measured — shuffle
    // records/bytes of the plain semi-join vs the bloom-prefiltered
    // one at 10x (1.5M orders), with broadcast joins DISABLED to model
    // the 100 TB regime where the dim side is too big to broadcast
    // (when it broadcasts there is no join shuffle to cut and the
    // bloom is pure overhead — that is exactly Spark's own
    // InjectRuntimeFilter applicability rule).
    if (args.headOption.contains("bloom10")) {
      if (!new java.io.File(s"$out/orders.parquet").exists()) {
        replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
        replicate("customer", Map("c_custkey" -> 1000000L))
        Tables.invalidateSpreadCache()
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val recs = new java.util.concurrent.atomic.AtomicLong
      val bytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            Option(e.taskMetrics).foreach { m =>
              recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
              bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            }
        })
      def probe(label: String)(df: => DataFrame): Unit = {
        // warm once (file listing, codegen), then measure
        df.write.format("noop").mode("overwrite").save()
        recs.set(0); bytes.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drains async
        println(f"TIME bloom10 $label $sec%.2f s " +
          f"shuffle_records=${recs.get} shuffle_mb=${bytes.get / 1e6}%.1f")
      }
      val dim = Tables.customer(spark, out)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      probe("plain_semi_join") {
        Tables.orders(spark, out)
          .join(dim, Seq("o_custkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
      }
      probe("bloom_prefiltered") {
        operators.LayoutQueries.bloomPrefilterJoin(spark, out)
      }
      // the OPTIMIZER-injected variant of the same cut: a plain
      // semi-join in a gated child session; InjectBloomPrefilter adds
      // the probe, so the shuffle numbers must land with
      // bloom_prefiltered's, not plain_semi_join's
      probe("auto_injected") {
        operators.LayoutQueries.autoBloomJoin(spark, out)
      }
      spark.stop()
      return
    }
    // antijoin10: the q120 routed-dedup claim, measured — a steady-state
    // batch (10% dups) anti-joined against a 10x corpus, plain vs
    // bloom-routed, broadcast disabled on the PLAIN side to model the
    // 100 TB regime where neither anti-join side broadcasts. The routed
    // form's broadcasts are the point: they are bounded by the BATCH
    // (suspect keys), never the corpus.
    if (args.headOption.contains("antijoin10")) {
      if (!new java.io.File(s"$out/documents.parquet").exists()) {
        replicate("documents", Map("doc_id" -> 1000000L))
        Tables.invalidateSpreadCache()
      }
      val recs = new java.util.concurrent.atomic.AtomicLong
      val bytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            Option(e.taskMetrics).foreach { m =>
              recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
              bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            }
        })
      def probe(label: String)(df: => DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        recs.set(0); bytes.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        println(f"TIME antijoin10 $label $sec%.2f s " +
          f"shuffle_records=${recs.get} shuffle_mb=${bytes.get / 1e6}%.1f")
      }
      import graft.functions.TextFunctions.fingerprint
      val docs = Tables.documents(spark, out)
      val corpusFp = docs.select(fingerprint(col("text")).as("fp"))
        .localCheckpoint() // measure the JOINs, not the fp computation
      val batchFp = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          fingerprint(when(pmod(col("doc_id"), lit(70)) === 3, col("text"))
            .otherwise(concat(col("text"), lit(" fresh"), col("doc_id"))))
            .as("fp"))
        .localCheckpoint() // ~10% dups (doc_id%70==3 of the %7==3 slice)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      probe("plain_anti_join") {
        batchFp.join(corpusFp, Seq("fp"), "left_anti")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
      val t0 = System.nanoTime()
      val bloom = graft.layout.RuntimeFilters.bloomBytes(
        corpusFp, "fp", math.max(docs.count(), 1L), 0.01)
      println(f"TIME antijoin10 bloom_build ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(${bloom.length / 1024} KiB; incremental mergeInPlace in the sinks)")
      probe("bloom_routed") {
        operators.Joins.bloomRoutedAntiJoin(batchFp, corpusFp, "fp", bloom)
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("build")) {
      replicate("lineitem", Map("l_orderkey" -> 10000000L))
      replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
      replicate("customer", Map("c_custkey" -> 1000000L))
      replicate("supplier", Map("s_suppkey" -> 1000000L))
      replicate("part", Map("p_partkey" -> 1000000L))
      replicate("documents", Map("doc_id" -> 1000000L))
      replicate("embeddings", Map("vec_id" -> 1000000L))
      replicate("events", Map("event_id" -> 100000000L, "user_id" -> 1000000L))
      Seq("region", "nation").foreach { n =>
        Tables.table(spark, src, n).write.mode("overwrite")
          .parquet(s"$out/$n.parquet") }
      println("BUILT scale10")
      // the build rewrote parquet at paths the query pass re-reads in
      // the SAME session — drop any spread decisions probed against a
      // previous build's files
      Tables.invalidateSpreadCache()
    }
    val qs = Seq("q01_pricing_summary", "q03_join_agg_revenue",
      "q20_cosine_knn", "q27_lsh_ann_pairs", "q35_tfidf_top_terms",
      "q40_exact_dedup", "q42_lsh_candidate_pairs",
      "q46_lsh_verified_dedup", "q47_simhash_banded",
      "q48_near_dup_components", "q66_sessionization",
      "q05_window_topk_per_group", "q76_sequence_packing",
      "q82_contamination", "q84_cluster_survivor", "q85_salted_skew_join",
      "q87_doc_chunks", "q89_incremental_dedup")
    Seq(src, out).foreach { dir =>
      // warmup
      Tables.lineitem(spark, dir).count(); Tables.documents(spark, dir).count()
      qs.foreach { n =>
        // ONE construction inside the timer (checkpoint-eager queries
        // run jobs there, and double construction would pin a second
        // set of never-freed checkpoint blocks); the row count re-runs
        // the same df afterwards, untimed — checkpointed subtrees are
        // reused, the rest re-executes only for reporting
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val cnt = df.count()
        println(f"TIME ${dir.split('/').last} $n $sec%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
