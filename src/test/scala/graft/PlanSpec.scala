package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the properties PLANS.md documents,
  * asserted so a rewrite can't silently lose them. String-level checks
  * on the executed plan are deliberately coarse — they pin WHAT the
  * plan must contain (pushdown, broadcast, group-limit, no stray
  * shuffle), not its exact shape. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q02: filters reach the parquet scan and the schema is pruned") {
    val p = plan("q02_filter_pushdown_scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"))
    // projection prunes to the 5 referenced columns (4 output + filter)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_returnflag"))
  }

  test("q20: per-query top-k plans as WindowGroupLimit, probes broadcast") {
    val p = plan("q20_cosine_knn")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("flagship: the bounded top-k frame is the broadcast build " +
      "side, never the metadata table") {
    val p = operators.VectorQueries.flagship(spark, d)
      .queryExecution.executedPlan.toString
    val join = p.linesIterator.find(_.contains("BroadcastHashJoin"))
    assert(join.isDefined, s"expected a broadcast hash join in:\n$p")
    // the build side must be the LEFT (top-k) input: NQ x K rows by
    // construction; the metadata side grows with the corpus
    assert(join.get.contains("BuildLeft"),
      s"the top-k side must be the build side, got: ${join.get}")
  }

  test("q91: star join broadcasts dims and pushes the date range down") {
    val p = plan("q91_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
    // the region filter must prune BEFORE the join, at its scan
    assert(p.contains("EqualTo(r_name,ASIA)"))
  }

  test("q85: the salted join key carries the salt column") {
    val p = plan("q85_salted_skew_join")
    assert(p.contains("__salt"))
  }

  test("q87: chunking plans with no hash-partition shuffle at all") {
    val p = plan("q87_doc_chunks")
    // sequence/explode/slice are per-row; only the final ORDER BY's
    // range exchange (and Tables.spread's round-robin, if probing
    // decided to rebalance) may appear — never a hashpartitioning
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("q40: exact dedup is one partial+final hash aggregate") {
    val p = plan("q40_exact_dedup")
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
    // exactly one hash shuffle: the fingerprint groupBy
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected 1 hash exchange, saw $n")
  }

  test("expensive-child generates are outer; no inferred filter re-runs them") {
    // A non-outer Generate over a computed array makes
    // InferFiltersFromGenerate add size/notnull guards that pushdown
    // rewrites into scan filters WITH THE FULL CHILD EXPRESSION
    // substituted — tokenize/shingle work then runs 2-3x per row
    // (measured 86 s vs 29 s on the 500k-doc q82 corpus pass). Pin
    // both halves of the fix: the outer flag (the rule skips outer
    // generates), and the absence of each query's expensive builder
    // inside any Filter/DataFilters line.
    val forbidden = Map(
      "q82_contamination" -> "concat_ws",       // shingle builder
      "q96_boilerplate_chunks" -> "concat_ws",  // chunk builder
      "q87_doc_chunks" -> "sequence(",          // chunk-start builder
      "q97_vocab_encode" -> "split(lower",      // tokenize
      "q98_token_rarity" -> "split(lower",      // tokenize
      "q35_tfidf_top_terms" -> "split(lower",   // tokenize
      "q53_cve_id_extract_dedup" -> "regexp_extract_all")
    forbidden.foreach { case (q, bad) =>
      val p = plan(q)
      val gens = p.linesIterator.filter(_.contains("Generate ")).toSeq
      assert(gens.nonEmpty, s"$q: expected a Generate in the plan")
      // GenerateExec prints (generator, requiredChildOutput, outer,
      // output) — outer renders as ", true, "
      gens.foreach(g =>
        assert(g.contains(", true, "), s"$q: non-outer generate: $g"))
      p.linesIterator.filter(_.contains("Filter")).foreach(l =>
        assert(!l.contains(bad),
          s"$q: generator child '$bad' leaked into a filter: ${l.take(200)}"))
    }
  }

  test("q111: the composed BPE train-then-encode never rescans documents") {
    // The train-then-apply composition computes the vocab ONCE
    // (localCheckpoint), trains from it, and encodes by joining the
    // SAME frame — so the final plan reads the checkpointed vocab and
    // contains NO file scan at all: the one documents pass happened in
    // the checkpoint job. A reintroduced .distinct() or a second
    // Bpe.vocab() call would resurface as a documents FileScan here
    // (round 6's triple-scan weak) long before it shows as a slow probe.
    val p = plan("q111_bpe_segment")
    val scans = p.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.isEmpty,
      s"q111 must not rescan any file:\n${scans.mkString("\n")}")
    assert(p.contains("ExistingRDD"),
      "q111 must read the checkpointed vocab")
  }

  test("q110: the registered probe's ADC scan stays codes-only") {
    // IvfPqSpec pins this on a locally-built index; the REGISTERED
    // query wraps the probe in the recall harness — assert the
    // contract survives the composition: at least one index scan whose
    // ReadSchema carries codes but no embedding (the ~128x I/O
    // reduction the compressed-domain stage exists for).
    val p = plan("q110_ivf_pq_ann")
    val readSchemas = p.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(l =>
      l.contains("codes") && !l.contains("embedding")),
      s"no codes-only scan in:\n${readSchemas.mkString("\n")}")
  }

  test("hot-set/vocab top-K selection is distributed, not a global window") {
    // orderBy().limit(K) plans as TakeOrderedAndProject — per-partition
    // top-K merged on the driver. A single-partition row_number window
    // over every distinct chunk/token would bottleneck one task at an
    // open vocabulary.
    Seq("q96_boilerplate_chunks", "q97_vocab_encode").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: expected a distributed TakeOrderedAndProject top-K")
    }
  }
}
