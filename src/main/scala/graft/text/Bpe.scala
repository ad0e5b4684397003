package graft.text

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING, in the formulation that
  * scales: the corpus contributes ONE pass (explode words -> count ->
  * the (word, freq) vocabulary table, a uniform-key shuffle exactly
  * like q97's); the merge loop then runs over that vocabulary — |V|
  * rows, corpus-size-independent. This is how reference BPE trainers
  * work (count over the word-frequency table, not the running text),
  * so a 100 TB corpus pays 100 TB exactly once, then k merges of
  * vocab-sized work.
  *
  * The merge loop itself runs DRIVER-LOCAL over the collected vocab
  * frame with incremental pair-count maintenance (a lazy-delete heap
  * keyed by (weighted count desc, left, right) — the classic in-memory
  * trainer loop), so training a real 30k–50k-merge vocabulary costs
  * one Spark job total, not 2 jobs per merge. Memory contract: the
  * driver holds the distinct-word vocabulary plus per-word symbol
  * arrays and the adjacent-pair index — tens of bytes per vocab word.
  * Web-scale corpora bound |V| with `minFreq` (drop hapax noise before
  * training — the standard trainer knob). `minFreq` is LOSSY: dropped
  * words take their pair-count contributions with them, which can
  * reorder or change the surviving merges (BpeSpec pins exactly this:
  * train(docs, 64) != train(docsWithout, 64)). It is a memory/noise
  * bound, not an order-preserving filter. The collect itself is
  * guarded: [[trainOnVocab]] counts the filtered vocab first and fails
  * with a message naming `minFreq` when it exceeds `maxVocab`, instead
  * of OOMing mid-collect.
  *
  * Determinism: merge selection orders by (weighted count desc, left,
  * right) with left/right compared as UTF-8 byte strings — the same
  * total order Spark's UTF8String (and DuckDB's binary collation)
  * uses — so the learned merge table is reproducible across runs,
  * partitionings, and vocab collect order (counts are integer sums;
  * every structure update is commutative). The q103 registry query
  * oracle-checks the pair-count core of a round; q109 oracle-checks
  * the full small-k merge table against a DuckDB round-unrolled
  * rewrite; BpeSpec pins the classic merge sequence and the
  * local-loop ≡ per-round-distributed equivalence.
  */
object Bpe {

  /** One learned merge: rank r replaced adjacent (left, right) with
    * left+right across the vocab, covering `count` weighted pairs. */
  final case class Merge(rank: Int, left: String, right: String,
      count: Long)

  /** (word, freq) vocabulary — the single corpus-scale pass. */
  def vocab(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(explode_outer(tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Character symbol arrays per vocab word — one element per CODE
    * POINT (java.util.regex `.` consumes a full surrogate pair, so an
    * astral emoji/CJK character stays one symbol; a code-unit split
    * would leak lone surrogates into the learned merge table). */
  private def symbols(v: DataFrame): DataFrame =
    v.withColumn("syms",
      regexp_extract_all(col("word"), lit("."), lit(0)))

  /** Greedy left-to-right single-merge rewrite of a symbol array:
    * every adjacent (a, b) becomes the fused symbol, re-fusable with a
    * following b on the next round — the standard BPE apply step,
    * expressed as one array fold (per-row, no shuffle). */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(coalesce(try_element_at(acc, lit(-1)) === a, lit(false)) &&
          x === b,
        concat(slice(acc, lit(1), greatest(size(acc) - 1, lit(0))),
          array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Freq-weighted adjacent-pair counts over a symbol frame — the
    * q103 statistic lifted to the vocab (weighted by word freq). */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .select(col("freq"), explode_outer(transform(
        slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
        (x, i) => struct(x.as("left"),
          element_at(col("syms"), i + 2).as("right")))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("wcount"))

  /** Driver-collect ceiling for [[trainOnVocab]]: ~50M vocab words ≈
    * a few GiB of driver heap for the trainer structures — past it the
    * caller must raise `minFreq`, not the cap. */
  val DefaultMaxVocab: Long = 50L * 1000 * 1000

  /** Learn `k` merges from a (doc_id, text) corpus: ONE vocab job
    * (the frame is `localCheckpoint`ed so the guard count and the
    * collect replay the materialized vocab, not the corpus scan),
    * then the driver-local loop of [[trainLocal]]. Returns the merge
    * table in rank order (possibly shorter than k if the vocab runs
    * out of repeated pairs — singleton pairs still merge; an empty
    * vocab stops). `minFreq` drops words rarer than the threshold
    * before training (bounds driver memory on web-scale vocabularies;
    * 1 = exact — see the lossiness note above). */
  def train(docs: DataFrame, k: Int, minFreq: Long = 1L,
      maxVocab: Long = DefaultMaxVocab): Seq[Merge] = {
    val v =
      if (minFreq <= 1L) vocab(docs)
      else vocab(docs).filter(col("freq") >= minFreq)
    trainOnVocab(v.localCheckpoint(), k, maxVocab)
  }

  /** [[train]] starting from an already-computed (word, freq) vocab
    * frame — the single-scan composition hook: callers that also
    * ENCODE against the same vocab (q111's train-then-apply) compute
    * `vocab(docs).localCheckpoint()` once, train here, and feed the
    * same frame to [[segmentCorpus]] with `assumeDistinctWords=true`,
    * so the corpus is scanned exactly once end-to-end. Pass a
    * checkpointed/cached frame — this method runs a count (the
    * [[DefaultMaxVocab]] OOM guard, failing loudly with the `minFreq`
    * remedy before the collect) and then the collect against it. */
  def trainOnVocab(v: DataFrame, k: Int,
      maxVocab: Long = DefaultMaxVocab): Seq[Merge] = {
    val n = v.count()
    require(n <= maxVocab,
      s"BPE vocab has $n words, above the driver-collect cap " +
        s"$maxVocab; raise minFreq to prune rare words (or raise " +
        "maxVocab if the driver heap genuinely fits the vocab)")
    trainLocal(
      v.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, k)
  }

  /** Retained per-round DISTRIBUTED formulation — 2 vocab-sized Spark
    * jobs per merge (pair-count + top-1, rewrite + checkpoint). Kept
    * as the cross-check reference for BpeSpec's local ≡ distributed
    * equivalence pin; [[train]] is the production path (same merge
    * table, ~k× fewer jobs). */
  private[graft] def trainIterative(docs: DataFrame, k: Int): Seq[Merge] = {
    var syms = symbols(vocab(docs)).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      val top = pairCounts(syms)
        .orderBy(col("wcount").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, ri, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(r, l, ri, c)
        syms = syms
          .withColumn("syms", mergeOnce(col("syms"), l, ri))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** UTF-8 byte order — Spark UTF8String / DuckDB binary-collation
    * comparison semantics, NOT java.lang.String's UTF-16 code-unit
    * order (they disagree between astral and U+E000..U+FFFF chars). */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Code-point split (the driver-side mirror of [[symbols]]). */
  private def codepoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Driver-side mirror of [[mergeOnce]]: greedy left-to-right,
    * non-overlapping, fused symbol re-fusable only on later rounds. */
  private def mergeWord(syms: Array[String], l: String, r: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out(out.length - 1) == l && syms(i) == r)
        out(out.length - 1) = l + r
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** The in-memory merge loop over a (word, freq) vocabulary —
    * incremental pair-count maintenance plus a lazy-delete heap, the
    * classic trainer structure: each merge touches only the words that
    * contain the selected pair (tracked by an inverted pair→words
    * index), and selection pops the heap until an entry's count
    * matches the live map (entries are re-pushed on every count
    * change, so the heap always holds one live entry per pair; counts
    * can both fall — neighbours of a merged occurrence — and RISE — a
    * fused symbol can collide with an existing symbol string, merging
    * two pair keys). Deterministic regardless of input order: all
    * updates are commutative integer sums and selection is the total
    * order (count desc, left, right) over UTF-8 bytes. */
  def trainLocal(vocabRows: Seq[(String, Long)], k: Int): Seq[Merge] = {
    import scala.collection.mutable
    type Pair = (String, String)
    val wordSyms = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    vocabRows.foreach { case (w, f) =>
      wordSyms += codepoints(w); freqs += f
    }
    val counts = mutable.HashMap.empty[Pair, Long]
    val where = mutable.HashMap.empty[Pair, mutable.Set[Int]]
    def pairBag(syms: Array[String]): mutable.HashMap[Pair, Long] = {
      val m = mutable.HashMap.empty[Pair, Long]
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        m.update(p, m.getOrElse(p, 0L) + 1L)
        j += 1
      }
      m
    }
    val heapOrd = new java.util.Comparator[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String))
          : Int = {
        val c = java.lang.Long.compare(y._1, x._1) // count DESC
        if (c != 0) c
        else {
          val l = utf8Compare(x._2, y._2)
          if (l != 0) l else utf8Compare(x._3, y._3)
        }
      }
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](heapOrd)
    for (wi <- wordSyms.indices)
      pairBag(wordSyms(wi)).foreach { case (p, mult) =>
        counts.update(p, counts.getOrElse(p, 0L) + mult * freqs(wi))
        where.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
    counts.foreach { case ((l, r), c) => heap.add((c, l, r)) }

    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < k && !heap.isEmpty) {
      val (c, l, r) = heap.poll()
      if (counts.get((l, r)).contains(c)) { // live entry
        merges += Merge(rank, l, r, c)
        val p = (l, r)
        val affected = where.getOrElse(p, mutable.Set.empty).toArray
        affected.foreach { wi =>
          val before = pairBag(wordSyms(wi))
          val after0 = mergeWord(wordSyms(wi), l, r)
          wordSyms(wi) = after0
          val after = pairBag(after0)
          (before.keySet ++ after.keySet).foreach { q =>
            val d = after.getOrElse(q, 0L) - before.getOrElse(q, 0L)
            if (d != 0L) {
              val nc = counts.getOrElse(q, 0L) + d * freqs(wi)
              if (nc <= 0L) { counts.remove(q); where.remove(q) }
              else {
                counts.update(q, nc)
                heap.add((nc, q._1, q._2))
              }
            }
            if (after.getOrElse(q, 0L) == 0L)
              where.get(q).foreach(_ -= wi)
            else if (before.getOrElse(q, 0L) == 0L)
              where.getOrElseUpdate(q, mutable.Set.empty) += wi
          }
        }
        // greedy rewrite leaves no (l, r) adjacency, so its count
        // drains to zero through the deltas above; drop any residue
        counts.remove(p)
        where.remove(p)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Segment words with a learned merge table: applies every merge in
    * rank order (the BPE encode step). Input needs a `word` column;
    * output adds `syms` (the subword sequence). Pure per-row column
    * work — but each merge adds one nested array fold to the
    * expression tree, so this form is for SMALL merge tables (the
    * oracle-checkable demo path). A production 30k–50k-merge vocab
    * segments via [[segmentCorpus]]. */
  def segment(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(symbols(words)) { (df, m) =>
      df.withColumn("syms", mergeOnce(col("syms"), m.left, m.right))
    }

  /** Apply a full merge table to one word, driver/executor-side — the
    * in-memory mirror of [[segment]]'s folds (same greedy left-to-
    * right semantics per rank), usable at real vocab size where a
    * 50k-deep column expression tree cannot exist. */
  def applyMerges(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(codepoints(word)) { (syms, m) =>
      // a word shorter than 2 symbols can never merge again; the fold
      // over the remaining ranks would be pure overhead at encode scale
      if (syms.length < 2) syms else mergeWord(syms, m.left, m.right)
    }.toSeq

  /** Corpus-scale BPE encode: segment a (doc_id?, word, ...) frame
    * with an arbitrarily large merge table. The standard production
    * shape: the DISTINCT words are encoded ONCE ([[applyMerges]] runs
    * per distinct word inside a mapPartitions over the deduplicated
    * vocab — vocab-sized work, not corpus-sized), then the (word,
    * syms) table joins back to the input on the word key. The join is
    * planner-chosen: a broadcast for bounded vocabs, a uniform-key
    * sort-merge join at web scale — either way the corpus pays one
    * pass and the 50k merge ranks never appear in any Spark plan.
    * Output: the input columns plus `syms`. Null handling: null-word
    * rows pass through with null `syms` (the encode table filters
    * nulls — `applyMerges(null, _)` would NPE — and the left join
    * keeps the rows). `assumeDistinctWords=true` skips the internal
    * `.distinct()` for inputs that are distinct by construction (a
    * groupBy-produced vocab frame) — at scale that distinct is a
    * full extra shuffle of the input lineage, and on an uncached
    * lineage it re-runs the corpus scan. */
  def segmentCorpus(words: DataFrame, merges: Seq[Merge],
      assumeDistinctWords: Boolean = false): DataFrame = {
    val spark = words.sparkSession
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val base = words.select(col("word")).filter(col("word").isNotNull)
    val distinct = if (assumeDistinctWords) base else base.distinct()
    val mergesB = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val encoded = distinct.mapPartitions { rows =>
      val ms = mergesB.value
      rows.map(r => Row(r.getString(0),
        applyMerges(r.getString(0), ms)))
    }(Encoders.row(
      StructType(Seq(StructField("word", StringType),
        StructField("syms", ArrayType(StringType))))))
    words.join(encoded, Seq("word"), "left")
  }
}
