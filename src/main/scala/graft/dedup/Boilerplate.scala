package graft.dedup

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal: the "line-level dedup" of
  * C4/RefinedWeb-style pipelines — text units repeated across many
  * documents (headers, footers, nav text) are identified corpus-wide
  * and removed from every document, preserving the order of what
  * survives.
  *
  * The unit here is a non-overlapping `chunkTokens`-token chunk (the
  * corpus this library is exercised against has no newlines); on real
  * data swap the chunker for `split(text, '\n')` — everything
  * downstream is unit-agnostic.
  *
  * Scale shape (100 TB): one uniform md5-keyed shuffle with map-side
  * partial aggregation for the per-fingerprint document counts; the
  * hot set is `topK` rows BY CONSTRUCTION, so it always broadcasts;
  * reassembly is one doc_id-keyed shuffle with the order restored by
  * an in-group array sort (no window over corpus rows anywhere).
  */
object Boilerplate {

  /** (doc_id, clean_text, n_dropped) for every document with at least
    * one token: the `topK` most document-frequent chunks are removed
    * and the surviving chunks are rejoined in position order.
    * Deterministic: the hot ranking tie-breaks on chunk text. */
  def removeHotChunks(docs: DataFrame, chunkTokens: Int = 2,
      topK: Int = 20): DataFrame = {
    val w = chunkTokens
    // explode_OUTER + isNotNull, not a plain explode: a non-outer
    // Generate makes InferFiltersFromGenerate add size/notnull guards
    // on the generator child, and pushdown substitutes the full
    // tokenize expression into them — tripling the scan-side compute
    // (measured 2x end-to-end at 500k docs). Outer generates skip the
    // rule; the size(toks)>0 pre-filter already guarantees a non-empty
    // sequence, so no null-start rows exist and the isNotNull is a
    // no-op guard that only documents the contract.
    val chunks = graft.Tables.spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        explode_outer(sequence(lit(0), size(col("toks")) - 1, lit(w)))
          .as("start"),
        col("toks"))
      .filter(col("start").isNotNull)
      .select(col("doc_id"),
        expr(s"start div $w").cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(w)))
          .as("chunk"))
      .withColumn("fp", md5(col("chunk")))
    // top-K selection is DISTRIBUTED: orderBy().limit(K) plans as
    // TakeOrderedAndProject (per-partition top-K, merged on the
    // driver) — never a single-partition window over every distinct
    // chunk, which at an open vocabulary would bottleneck one task.
    // min(chunk) is the deterministic tie-break (fp determines chunk;
    // min is just the aggregate form of "the chunk").
    val hot = chunks.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"),
        min(col("chunk")).as("c"))
      .orderBy(col("nd").desc, col("c"))
      .limit(topK)
      .select(col("fp"), lit(1).as("hot"))
    chunks.join(broadcast(hot), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      // ordered reassembly without a window: collect the surviving
      // (chunk_id, chunk) structs (collect_list skips the nulls the
      // `when` leaves for hot chunks), sort by chunk_id, project text
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("hot").isNull,
            struct(col("chunk_id"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"),
        sum(when(col("hot") === 1, 1L).otherwise(0L)).as("n_dropped"))
  }
}
