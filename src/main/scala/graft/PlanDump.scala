package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: regenerate PLANS.md — executed-plan evidence for the
  * headline queries (pushdown, broadcast choice, window group limits).
  * Run: `sbt "runMain graft.PlanDump"` (uses sf0.01). */
object PlanDump {

  private val picks: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      "Partial+final hash aggregation; decimal-exact sums; scan prunes to the 7 needed columns with the shipdate filter pushed.",
    "q02_filter_pushdown_scan" ->
      "Range + numeric filters reach the parquet scan (PushedFilters); projection prunes the read schema.",
    "q03_join_agg_revenue" ->
      "Fact joins build on the small sides (broadcast at this SF; AQE re-plans at scale); aggregation is map-side combined.",
    "q18_asof_join" ->
      "As-of join: one equi shuffle + per-left-row latest-wins window; no time fan-out beyond matched candidates.",
    "q20_cosine_knn" ->
      "Probes broadcast (IdentityBroadcastMode), corpus streamed once; per-query top-k runs as partial+final WindowGroupLimit, so full ranks never materialize.",
    "q25_label_centroid" ->
      "Typed Aggregator plans as ObjectHashAggregate with partial merge: only (sum, count) buffers shuffle.",
    "q31_quality_filter" ->
      "Quality expression evaluates twice (filter pushdown + projection) — documented accepted tradeoff; pure per-row computation after the spread rebalance (Tables.spread: a no-op on multi-row-group production files).",
    "q47_simhash_banded" ->
      "SimHash scale path: salted equi self-join on (band, band_value, salt) — no all-pairs; canonical-band emission dedups pairs without a distinct; fingerprints localCheckpointed so both sides read them once.",
    "q42_lsh_candidate_pairs" ->
      "Signatures computed once; ONE shuffle on (band, band_key): the spillable window row_number caps bucket membership before aggregation (observe metric reports truncation), then the same-keyed groupBy reuses the partitioning; pairs enumerated inside bounded buckets.",
    "q46_lsh_verified_dedup" ->
      "Candidate pairs only join back to shingle sets — the O(n^2) pair space never materializes.",
    "q91_star_join" ->
      "Star schema: region filter prunes before broadcast; all four dims broadcast; the two facts shuffle at most once each; aggregation partial+final.",
    "q82_contamination" ->
      "Decontamination: benchmark shingle set broadcast (eval sets are small by nature) from its own row-group-pruned scan (doc_id bound pushed down); corpus side streams once with no materialization; only per-doc hit counts shuffle.",
    "q85_salted_skew_join" ->
      "Salted skew join: the join key is (event_type, salt) so a hot key's rows spread across 16 sub-keys; result provably equals the plain join.",
    "q87_doc_chunks" ->
      "Chunking: sequence -> explode -> slice are all per-row expressions inside one codegen stage; no shuffle before the oracle-imposed final sort.",
    "q89_incremental_dedup" ->
      "Incremental dedup: capped band buckets localCheckpointed once; the self-join's probe side is only the incoming batch — existing x existing pairs are never generated.",
    "q96_boilerplate_chunks" ->
      "Boilerplate removal: one uniform md5-keyed shuffle for per-fp doc counts (partial agg); the top-K hot set broadcasts (K rows by construction); reassembly is one doc_id shuffle with an in-group array_sort, no corpus-row window.",
    "q97_vocab_encode" ->
      "Vocab encode: corpus token count is one uniform shuffle; the row_number window runs over the aggregated |vocab| frame only; the V-row vocab broadcasts into the encode join.",
    "q98_token_rarity" ->
      "Commonness score: token-count agg shuffles once; the vocab-sized count table broadcasts; per-doc regroup is the only other shuffle.",
    "q101_snapshot_diff" ->
      "Snapshot diff: both versions shuffle once on the uniform doc_id key into ONE full-outer sort-merge join; fingerprints are scan-side expressions, no driver state.",
    "q103_bpe_pair_counts" ->
      "BPE pair counts: pair fan-out is pure per-row slice+transform inside one codegen stage; one uniform-key count shuffle; top-20 is distributed TakeOrderedAndProject, never a global sort.",
    "q106_upsert_merge" ->
      "Upsert/MERGE: one doc_id-keyed full-outer sort-merge join replaces per-record upserts; fingerprint update-gating is a join-side expression.",
    "q110_ivf_pq_ann" ->
      "IVF-PQ probe (index persisted, built once via IvfPq.ensureBuilt; since round 7 the query wraps the probe in the recall-vs-exact overlap count, so a brute-force exact branch joins in at the top): bucket IN (...) is a planning-time partition filter on the index scan; the ADC stage scans (bucket, vec_id, codes) only — ReadSchema has no embedding column — and the shortlist broadcasts back for the exact re-rank over the same pruned partitions.",
    "q111_bpe_segment" ->
      "BPE encode, single-scan composition: the vocab is computed once and localCheckpoint'ed — train collects it and the encode joins against it (distinct skipped: groupBy output), so the plan below scans the checkpointed vocab (Scan ExistingRDD), NOT documents.parquet; the whole train-then-apply job reads documents exactly once, in the checkpoint job. The distinct vocab encodes via mapPartitions (merge table broadcast, never in the plan); subword counts are one partial+final agg.",
    "q113_bloom_prefilter_join" ->
      "The codegen'd `bloom_might_contain` probe sits in the fact scan's DataFilters — rows die inside the scan stage, before any exchange (here the dim broadcasts because sf is small; `graft.ScaleProbe bloom10` disables broadcast to model the 100 TB regime and measures the shuffle cut: 1,529,480 -> 337,504 records). Catalyst even propagates the probe to the dim side via constraint inference — harmless there.",
    "q119_auto_bloom_join" ->
      "q113's cut applied by the OPTIMIZER to a PLAIN semi-join (graft.plans.InjectBloomPrefilter, gates opened in the query's child session): the fact side gains `Filter(might_contain(Subquery ..., xxhash64(o_custkey)))` before its exchange, and the subquery is a one-shot distributed bloom_filter_agg over the pushed-down, column-pruned dim scan. Broadcast is disabled in the child session (the regime the rule targets), so the join is the sort-merge a 100 TB run would plan — the probe's record cut is measured in ScaleProbe bloom10 (1,529,480 -> 335,355, equal to the hand-built q113's) and spec-pinned via shuffle metrics in BloomInjectSpec.",
    "q114_partition_pruned_scan" ->
      "The year filter is gone from DataFilters entirely — it became a planning-time PartitionFilter (2 of 7 `o_year=` directories listed); ReadSchema carries only the two referenced data columns.",
    "q116_semdedup_buckets" ->
      "Semantic dedup with content-derived blocking: the sign-LSH bucket id is a scan-side codegen expression (six FloatDotProduct folds, no shuffle to assign); ONE hash exchange on bucket feeds the anchor window, and the dominated-pair join is an equi-join on bucket — pairwise work stays inside buckets, never a global cross product.",
    "q117_ivf_append_ann" ->
      "Probe over the base-built + delta-appended IVF-PQ index: structurally IDENTICAL to q110's plan — partition-pruned bucket scan, codes-only ReadSchema, broadcast shortlist re-rank — because append only adds files inside existing bucket=N partition directories with both quantizers frozen; index maintenance is invisible to the serving plan, which is the point (IvfPqSpec pins append ≡ rebuild under the same quantizers).",
    "q118_sorted_minmax_scan" ->
      "Min/max (zone-map) pruning over the range-sorted lineitem copy: the shipdate BETWEEN predicate shows in PushedFilters, and because each of the 16 files covers a narrow sorted slice, the parquet reader's footer check skips every non-overlapping row group before decoding a page — LayoutSpec asserts the skip from the footers themselves (<=1/4 of groups overlap a one-quarter predicate; a shuffled same-file-count copy overlaps 16/16). The plan looks like a plain filter-agg; the cut is in WHICH row groups the identical scan touches.",
    "q120_bloom_routed_dedup" ->
      "Bloom-routed anti-join: probe-NEGATIVE batch rows (provably new — no false negatives) bypass the join entirely via the codegen'd NOT might_contain filter; probe-positives resolve exactly through broadcast-semi then broadcast-anti, both broadcasts bounded by the BATCH. The corpus fingerprint side streams through its scan and never shuffles (plan-pinned in BloomRoutedJoinSpec; record cut measured in ScaleProbe antijoin10: 57,143 -> 715 shuffle records).",
    "q121_zorder_two_col_scan" ->
      "Z-order scan: BOTH range predicates (l_partkey OR l_suppkey) reach PushedFilters over the Morton-clustered copy, and because each of the 64 files tiles ~1/8 of EACH key range, footer min/max skips most row groups for either branch — ZOrderSpec pins the per-axis overlap from the footers (<=1/2 on both axes, vs >=90% on the non-lead axis of a single-sorted control). Plan shape is a plain filter-agg; the cut is row-group selection.",
    "q122_inverted_keyword_search" ->
      "Inverted-index search: the conjunctive term predicate is a pushed `term IN` on the range-clustered posting table (row groups outside the two terms' slices never decode); the intersect is a doc_id count over doc-frequency-sized slices; the corpus join is LEFT SEMI on the key with NO ReadSchema containing `text` anywhere in the plan — the full-text scan the index exists to avoid (pinned in InvertedIndexSpec).",
    "q123_cms_frequent_ngrams" ->
      "Two-pass heavy hitters: pass 2's plan shows the codegen'd `cms_at_least` probe INSIDE the scan stage's filter, upstream of the group-by exchange — only candidate n-grams (true hitters + the eps-bounded overcount tail) are shuffled; the mostly-unique tail dies at the scan. Pass 1 (the sketch build) is a separate fixed-size treeAggregate, not in this plan.",
    "q124_bm25_ranked_search" ->
      "Ranked search: pushed `term IN` over the scored posting table; per-term df is a window count over the two doc-frequency-sized slices (never a corpus scan); N and total length come from the `_stats` side file read (2 longs). The score is a single codegen projection over exact integers; top-15 is TakeOrderedAndProject on (rounded score, doc_id).",
    "q125_phrase_search" ->
      "Phrase search: pushed `term IN` over the positional posting table reads one slice per phrase term; slices join on doc_id (doc-frequency-sized, broadcast at this SF); adjacency is verified INSIDE the row by array-lambda expressions (a start matches iff term i sits at p+i) — no positional explode, no corpus text read, key semi-join back for output.",
    "q127_manifest_snapshot_read" ->
      "Manifest snapshot read: the scan's file list comes from ONE small manifest parquet (versioned, atomically renamed), never a recursive data-root listing — the FileScan's paths are exactly the snapshot's immutable commit dirs. Plan shape is a plain agg; the metadata story (atomic commit, isolation, time travel, vacuum) is ManifestTableSpec's.",
    "q128_manifest_pruned_scan" ->
      "Manifest-stats dir pruning: readPruned keeps only commit dirs whose recorded doc_id min/max overlaps [10, 60] — ONE of the four ingest dirs enters the scan (pinned via inputFiles in ManifestTableSpec), decided from the manifest before any file listing; the pushed doc_id filter then prunes row groups inside it. Two pruning levels, one answer — the oracle is the plain filtered aggregate.",
    "q129_manifest_read_since" ->
      "Incremental (CDC) read: the scan's paths are the latest snapshot's dirs MINUS the checkpointed version's — resolved from two manifest reads, so an incremental consumer's plan touches only the new commits' data. Dir-identity semantics (compaction resets them) are the documented drain-before-maintenance contract, spec-pinned.",
    "q136_manifest_string_bloom_lookup" ->
      "String-keyed point lookup through SQL: the pushed `doc_key IN (...)` becomes a string point set the ManifestFileIndex probes against each dir's STRING Bloom filter (the recorded string bounds all span the interleaved domain — provably useless, ManifestSqlSpec pins it), so the FileScan plans a strict subset of commit dirs with zero data-tree listings (file list from the manifest's recorded per-dir lists). PushedFilters still carries the In predicate for row-group skipping inside the kept dirs.",
    "q137_manifest_sql_dml" ->
      "Read side of the SQL-DML-built table: a plain aggregate whose FileScan paths are the manifest snapshot produced by 3x INSERT INTO + MERGE INTO + DELETE FROM statements (each routed by graft.plans.ManifestSqlRules to a manifest primitive at resolution time — interception before Spark's raw-file insert path is what keeps this table consistent). The scan reads only dirs the post-DML manifest references: replaced and deleted rows' original dirs are absent by construction.",
    "q138_manifest_zorder_cluster" ->
      "Z-cluster-rewritten manifest table queried on its SECOND axis (n_chars — the column a single-axis doc_id cluster could never prune): the FileScan's ManifestFileIndex path list is a strict subset of the 16 Morton-tiled dirs, decided from the manifest stats alone, with the pushed BETWEEN still pruning row groups inside the kept dirs (rows are z-sorted within each dir). ManifestSqlSpec pins numFiles on BOTH axes.",
    "q139_manifest_metadata_agg" ->
      "Metadata-only aggregate: the whole-table COUNT(*)/COUNT(col)/MIN/MAX over the manifest relation is rewritten by graft.plans.ManifestMetadataAggs into a LocalRelation computed from the manifest's recorded per-dir row counts, null counts, and min/max stats — the ENTIRE plan is the one-row LocalTableScan below; no FileScan, no exchange, zero data files. At 100 TB this is one manifest read instead of a full table scan.",
    "q140_manifest_grouped_metadata_agg" ->
      "GROUPED metadata-only aggregate over the one-commit-per-language layout: the manifest proves every dir single-group (grouping column min == max, zero recorded nulls), so GROUP BY lang folds per-dir — the executed plan is a LocalTableScan with one row per language, zero data files; a single mixed dir and the rule provably stands down (ManifestMetadataAggSpec pins both plans).",
    "q141_manifest_constraint_gate" ->
      "CHECK-constraint-gated table read back: a plain aggregate over the manifest snapshot whose content the write-boundary gate admitted — the corrupted second-half batch was REFUSED whole (one orphan dir, version untouched, builder-asserted), the repaired batch landed. The plan is the ordinary manifest scan; the evidence is the ANSWER matching the oracle's from-scratch recomputation of what should have been admitted.",
    "q142_manifest_deletion_vectors" ->
      "Merge-on-read deletion vectors: the scattered-key delete wrote ONE tombstone (zero data dirs rewritten, builder-asserted), and the SQL read was rewritten at resolution time (graft.plans.ManifestApplyDeletes) into per-tombstone-group manifest scans BroadcastHashJoin-LeftAnti'd against the broadcast tombstone key set, unioned with the clean dirs' plain scan (the post-delete re-insert commit — per-dir scoping keeps it alive). Filters still push into every sub-relation's ManifestFileIndex; the delete's read tax is exactly the one anti-join visible here.",
    "q143_manifest_restore" ->
      "RESTORE (rollback) read back: a plain aggregate whose FileScan paths are the restored snapshot's ORIGINAL dirs plus the post-rollback append — the corrupting overwrite's dir is absent by construction (the rollback manifest simply references the good version's immutable dirs; zero data movement, builder-asserted). The oracle recomputes the expected table from scratch; one leaked bad row would hash-mismatch.",
    "q144_filtered_knn" ->
      "Metadata-filtered vector search: the lang predicate prunes the corpus BEFORE any distance math — a BroadcastHashJoin LeftSemi against the filtered doc-id set sits directly on the embeddings scan, so dot products (the O(N·d) cost) run only on survivors; probes broadcast as in q20, and per-query top-k is the partial+final WindowGroupLimit, full ranks never materializing. Pre-filter beats post-filter twice at 100 TB: selectivity multiplies the whole scan, and k never under-fills.")

  /** Captured with broadcast joins disabled: at 100 TB neither side
    * broadcasts, and the co-location evidence (zero exchange under the
    * SortMergeJoin, `SelectedBucketsCount`) only shows in that regime. */
  private val picksNoBroadcast: Seq[(String, String)] = Seq(
    "q115_bucketed_colocated_join" ->
      "Both scans carry `SelectedBucketsCount: 8 out of 8` and `Bucketed: true`; the SortMergeJoin has NO exchange under it — the only hash exchange in the whole plan is the final groupBy's (pinned in LayoutSpec). The join shuffle was paid once, at table-write time.")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# PLANS — executed-plan evidence (generated by `graft.PlanDump` at sf0.01)\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.PlanDump\"`. What to look for per plan\n")
    sb.append("is noted above each block; full formatted output below it.\n")
    def emit(name: String, note: String, header: String = ""): Unit = {
      val df = SparkEntry.queries(name)(spark, d)
      sb.append(s"\n## $name$header\n\n$note\n\n```\n")
      sb.append(df.queryExecution.executedPlan.treeString
        .linesIterator.take(60).mkString("\n").take(8000))
      sb.append("\n```\n")
    }
    picks.foreach { case (name, note) => emit(name, note) }
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val bcSaved = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try picksNoBroadcast.foreach { case (name, note) =>
      emit(name, note, " (broadcast disabled)") }
    finally spark.conf.set(bcKey, bcSaved)
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("WROTE PLANS.md")
    spark.stop()
  }
}
