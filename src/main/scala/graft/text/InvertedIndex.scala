package graft.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term → doc-id posting table for keyword search — the text analogue
  * of the ANN index family: pay one layout-time pass so that a keyword
  * query touches the posting slice for its terms plus the matching
  * documents, never the corpus text.
  *
  * Scale semantics: a keyword filter written as `contains(text, t)`
  * scans and decodes EVERY document's text — at 100 TB that is a full
  * corpus read per query. The posting table is (term, doc_id) rows
  * range-clustered and sorted by term, so a term-equality predicate
  * prunes whole row groups from the footer's string min/max and the
  * pushed filter decodes only the slice for that term (~doc-frequency
  * rows, not corpus rows). Search then intersects the (small) posting
  * slices by doc_id and LEFT SEMI joins the corpus on its key — the
  * probe side of that join is tiny, so the optimizer's Bloom/broadcast
  * machinery keeps the corpus-side cost to a key-column scan. Build
  * cost is one tokenize + explode pass and one range shuffle of
  * (term, id) pairs — both linear, both mergeable per corpus shard,
  * and the same shape at any scale.
  *
  * Tokenization is [[TextFunctions.tokens]] (lowercase, whitespace,
  * no empties) — the engine-wide convention the DuckDB oracle mirrors
  * with `string_split_regex`, so "contains term" means exactly
  * token-set membership in both engines.
  */
object InvertedIndex {

  /** Build the posting table at `path`: distinct (term, doc_id) pairs,
    * range-partitioned into `files` slices and sorted by (term,
    * doc_id). `array_distinct` before the explode keeps the table at
    * one row per (term, doc) regardless of term frequency; the sort
    * within each range slice maximizes footer min/max tightness and
    * run-length compression of the term column. */
  def build(docs: DataFrame, path: String, files: Int): Unit =
    docs.select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text"))))
          .as("term"))
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** Restore the term-range clustering of a posting table that has
    * accumulated unclustered appends (the streaming sink's per-batch
    * files span the whole term range, so their footer min/max prunes
    * nothing): same crash-safe rename swap as every other compactor
    * ([[graft.sinks.Maintenance.writeAndSwap]]), rewriting into
    * `files` term-range slices. Search results are identical before
    * and after — clustering only restores the row-group skip. */
  def recluster(s: SparkSession, path: String, files: Int): Unit =
    graft.sinks.Maintenance.writeAndSwap(s, path) { tmp =>
      s.read.parquet(path)
        .repartitionByRange(files, col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(tmp)
    }

  /** Doc-ids containing ALL of `terms` (conjunctive keyword search):
    * read the posting slices (one pushed `term IN (...)` predicate —
    * row groups outside the terms' ranges never decode), count
    * distinct matched terms per doc, keep docs matching all. The
    * result is at most min(doc-frequency) rows — the small side of
    * whatever join the caller does next. */
  def matchingIds(s: SparkSession, postingsPath: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "matchingIds: need at least one term")
    s.read.parquet(postingsPath)
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt")) // postings are distinct per (term, doc)
      .filter(col("nt") === terms.size)
      .select(col("doc_id"))
  }

  /** Full conjunctive search: corpus rows whose token set contains all
    * `terms`, fetched via the posting table + a key semi-join instead
    * of a corpus text scan. */
  def search(s: SparkSession, postingsPath: String, docs: DataFrame,
      terms: Seq[String]): DataFrame =
    docs.join(matchingIds(s, postingsPath, terms),
      Seq("doc_id"), "left_semi")
}
