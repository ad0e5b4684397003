package graft.text

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING, in the formulation that
  * scales: the corpus contributes ONE pass (explode words -> count ->
  * the (word, freq) vocabulary table, a uniform-key shuffle exactly
  * like q97's); every merge round after that operates on the
  * vocab frame — |V| rows, corpus-size-independent — counting
  * freq-weighted adjacent symbol pairs and rewriting symbol arrays.
  * This is how reference BPE trainers work (count over the word-
  * frequency table, not the running text), so a 100 TB corpus pays
  * 100 TB exactly once, then k merge rounds of vocab-sized work.
  *
  * Determinism: merge selection orders by (weighted count desc, left,
  * right) — total order, no RNG — so the learned merge table is
  * reproducible across runs and partitionings (counts are integer
  * sums). The q103 registry query oracle-checks the pair-count core
  * of a round; BpeSpec pins the classic merge sequence end-to-end.
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

  /** Learn `k` merges from a (doc_id, text) corpus. Returns the merge
    * table in rank order (possibly shorter than k if the vocab runs
    * out of repeated pairs — singleton pairs still merge; an empty
    * vocab stops). Each round is two vocab-sized jobs (count + top-1,
    * rewrite + checkpoint); the corpus is read exactly once. */
  def train(docs: DataFrame, k: Int): Seq[Merge] = {
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

  /** Segment words with a learned merge table: applies every merge in
    * rank order (the BPE encode step). Input needs a `word` column;
    * output adds `syms` (the subword sequence). Pure per-row column
    * work — at serving scale this is a scan-side transform. */
  def segment(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(symbols(words)) { (df, m) =>
      df.withColumn("syms", mergeOnce(col("syms"), m.left, m.right))
    }
}
