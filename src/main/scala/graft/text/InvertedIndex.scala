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
    postingsOf(docs)
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** The posting projection — ONE definition, shared by [[build]] and
    * the streaming sink ([[graft.streaming.Streams
    * .keywordIndexSinkWriter]]), so every file of a posting table
    * carries the same tokenization and column order no matter which
    * path wrote it. */
  def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col("text"))))
        .as("term"))

  /** Build the SCORED posting table for ranked retrieval: one row per
    * (term, doc) carrying the term frequency and the document's token
    * length — the per-posting payload BM25-family scoring needs —
    * range-clustered by term like [[build]]. Corpus-level stats
    * (indexed-doc count, total token count — exact BIGINTs, so the
    * average doc length derives by ONE exact division at query time)
    * are written to a `_stats` side file: underscore-prefixed, so
    * every read of the main table ignores it, and ranked search never
    * pays a corpus-wide scan for two numbers. One tokenize pass + one
    * (term, doc) aggregate + the range layout shuffle. */
  def buildScored(docs: DataFrame, path: String, files: Int): Unit = {
    docs.withColumn("toks", TextFunctions.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)
    // derive the corpus stats from the JUST-WRITTEN postings (dl is
    // functionally dependent on doc_id, so one row per doc recovers
    // it exactly) — a columnar read of the small posting table, NOT a
    // second tokenize pass over the corpus text
    val s = docs.sparkSession
    s.read.parquet(path)
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/_stats")
  }

  /** BM25-shaped disjunctive ranked search over a [[buildScored]]
    * table: docs matching ANY of `terms`, scored
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with the
    * RATIONAL idf `(N-df+0.5)/(df+0.5)` — deliberately libm-free (no
    * ln), because the DuckDB oracle recomputes scores and transcendental
    * functions are the one place engines' doubles diverge; every input
    * here is an exact integer and both engines evaluate the identical
    * expression tree, so scores are bit-identical (the engine-wide
    * determinism convention — see q98's integer-ratio rarity). Rank
    * order matches ln-idf BM25 whenever one term dominates; the
    * rational idf spreads weights more aggressively across rare terms,
    * which is the side a retrieval pipeline prefers for filtering.
    *
    * Scale shape: the pushed `term IN` predicate reads only the query
    * terms' posting slices; per-term df comes from a window count over
    * those slices (never a corpus scan); N and total length come from
    * the `_stats` side file. Output is top-`k` by (rounded score desc,
    * doc_id) — a deterministic total order. The per-doc score sum is
    * order-insensitive for up to two matched terms (IEEE addition is
    * commutative); for 3+ query terms partial-agg order can shift the
    * last ulp, which the 6-decimal round absorbs. */
  def rankedSearch(s: SparkSession, postingsPath: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "rankedSearch: need at least one term")
    val st = s.read.parquet(s"$postingsPath/_stats").head()
    val (n, tot) = (st.getLong(0), st.getLong(1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val scored = s.read.parquet(postingsPath)
      .filter(col("term").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("sc",
        ((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) +
              lit(b) * (col("dl") * lit(n) / lit(tot))))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("sc")), 6).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Build the POSITIONAL posting table for phrase search: one row per
    * (term, doc) carrying the sorted token positions of every
    * occurrence — same term-range clustering as [[build]]. Positions
    * make the index answer ORDER-sensitive queries (exact phrases)
    * that the set-membership table cannot: "spark shuffle" as a
    * phrase, not as two co-occurring words. Cost over [[build]] is the
    * positions payload (one int per token occurrence — the corpus's
    * token count, spread across terms). */
  def buildPositional(docs: DataFrame, path: String, files: Int): Unit =
    docs.withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"), posexplode(col("toks")))
      .groupBy(col("col").as("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("doc_id"), col("term"), col("positions"))
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** Exact-phrase search over a [[buildPositional]] table: docs where
    * `phrase` appears as CONSECUTIVE tokens. Reads one posting slice
    * per distinct phrase term (pushed `term IN`), joins the slices on
    * doc_id (k-1 joins of doc-frequency-sized frames — never the
    * corpus), then verifies adjacency INSIDE the row with array
    * lambdas: a start position p matches iff term i sits at p+i for
    * every i. All builtin higher-order functions — codegen-friendly,
    * no UDF. The final semi-join fetches matching docs by key, so the
    * corpus text is never read (same contract as [[search]]). */
  def phraseSearch(s: SparkSession, postingsPath: String,
      docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: need at least one term")
    val slices = s.read.parquet(postingsPath)
      .filter(col("term").isin(phrase.distinct: _*))
    val perPos = phrase.zipWithIndex.map { case (t, i) =>
      slices.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = perPos.reduce(_.join(_, Seq("doc_id")))
    val starts = filter(col("p0"), p =>
      phrase.indices.drop(1).map(i =>
        array_contains(col(s"p$i"), p + i)).reduceOption(_ && _)
        .getOrElse(lit(true)))
    docs.join(joined.filter(size(starts) > 0).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
  }

  /** Restore the term-range clustering of a posting table that has
    * accumulated unclustered appends (the streaming sink's per-batch
    * files span the whole term range, so their footer min/max prunes
    * nothing): same crash-safe rename swap as every other compactor
    * ([[graft.sinks.Maintenance.writeAndSwap]]), rewriting into
    * `files` term-range slices. Search results are identical before
    * and after — clustering only restores the row-group skip. */
  def recluster(s: SparkSession, path: String, files: Int): Unit =
    graft.sinks.Maintenance.writeAndSwap(s, path) { tmp =>
      // a buildScored table's `_stats` side file survives the swap via
      // writeAndSwap's shared underscore-entry carry-over
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
    // dedup BEFORE counting: isin matches each posting row once, so a
    // caller-repeated term must not inflate the required match count
    // (Seq("a", "a") would otherwise demand nt == 2 of a table that
    // can only ever supply one 'a' row per doc — empty result, silently)
    val distinct = terms.distinct
    s.read.parquet(postingsPath)
      .filter(col("term").isin(distinct: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt")) // postings are distinct per (term, doc)
      .filter(col("nt") === distinct.size)
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
