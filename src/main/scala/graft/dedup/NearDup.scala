package graft.dedup

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Library API for near-duplicate detection over a (doc_id, text)
  * corpus: MinHash signatures -> LSH band buckets -> candidate pairs ->
  * exact-Jaccard verification -> drop decision. The query registry
  * ([[graft.operators.DedupQueries]]) exposes the same stages with
  * DuckDB oracles; this object is the composable DataFrame surface.
  *
  * Scale shape: one md5 pass per token, integer mixes for signatures,
  * candidates from a band-key groupBy (pairs enumerated inside small
  * buckets — the O(n²) pair space never materializes), and only the
  * candidates pay the exact-Jaccard join back to shingle sets.
  */
object NearDup {

  val ShingleN = 3
  val Components = 12
  val RowsPerBand = 3
  val Bands: Int = Components / RowsPerBand

  /** (doc_id, band, band_key): one row per doc per LSH band. */
  def bands(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleN)
      .withColumn("th", tokenHashes(col("toks")))
      .withColumn("hs", shingleHashesOf(col("th"), ShingleN))
      .withColumn("sig", minhashSignature(col("hs"), Components))
      .select(col("doc_id"), explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band"),
          lshBand(col("sig"), b * RowsPerBand, RowsPerBand)
            .as("band_key"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.band_key").as("band_key"))

  /** Distinct (doc_a < doc_b) candidate pairs from shared band keys. */
  def candidatePairs(docs: DataFrame): DataFrame = {
    val ids = col("ids")
    bands(docs)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(ids) > 1)
      .select(explode(flatten(transform(ids, (a, i) =>
        transform(slice(ids, i + 2, size(ids)), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
  }

  /** Candidate pairs verified by exact shingle-set Jaccard >= min. */
  def verifiedPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(shinglesOf(col("toks"), ShingleN)).as("sset"))
    candidatePairs(docs)
      .join(sh.select(col("doc_id").as("doc_a"), col("sset").as("sset_a")),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sset").as("sset_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sset_a"), col("sset_b")))
          .cast("double") /
          size(array_union(col("sset_a"), col("sset_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Greedy keep-lowest near-dedup: drop every doc that is the higher
    * id of a verified pair. (Greedy, not connected-components: in a
    * chain a-b-c it keeps a and may keep c if (a,c) was no candidate —
    * the standard single-pass approximation; exact grouping would need
    * an iterative CC pass.) */
  def dropNearDuplicates(docs: DataFrame, minJaccard: Double): DataFrame = {
    val toDrop = verifiedPairs(docs, minJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(toDrop, Seq("doc_id"), "left_anti")
  }
}
