package graft.text

import java.io.ByteArrayOutputStream

import graft.expressions.CmsAtLeast
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Exact corpus-wide frequent n-grams via the two-pass Count-Min
  * gate — frequent-pattern mining at the scale where the naive
  * `GROUP BY ngram` is the bottleneck.
  *
  * Why two passes: shingled text is MOSTLY UNIQUE keys, so the naive
  * group-by's map-side partial aggregation compresses almost nothing
  * and the shuffle carries the entire distinct-n-gram tail — at 100 TB
  * that tail is petabytes of strings nobody asked about (the query
  * wants the few hitters above a threshold). Pass 1 aggregates a
  * fixed-size mergeable Count-Min sketch of the n-gram stream (a
  * treeAggregate like `stat.bloomFilter`: only ~1 MB of counters ever
  * reaches the driver, shipped back once per task in the plan); pass 2
  * re-scans with the sketch probed INSIDE the scan stage
  * ([[CmsAtLeast]], whole-stage codegen), so only candidates — true
  * hitters plus an eps-bounded overcount tail — enter the shuffle and
  * the exact count. CMS never undercounts, so no true hitter is gated
  * out and the final answer is EXACT (oracle-checked by q123).
  *
  * The two scans are the honest price of the shuffle cut: scan+compute
  * is embarrassingly parallel and bandwidth-bound; the shuffle is the
  * coordinated, spill-prone stage worth 2x the read. Probes hash the
  * shingle to 64 bits (`xxhash64`) on BOTH sides, so the sketch's item
  * representation is identical by construction; a 64-bit hash
  * collision only merges two keys' counters — an overcount, killed by
  * the exact pass like any other.
  */
object HeavyHitters {

  /** Shingle stream (one row per n-gram occurrence) with its 64-bit
    * probe hash — shared shape of both passes. */
  private def shingleStream(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("toks", TextFunctions.tokens(col("text")))
      .select(explode(TextFunctions.shinglesOf(col("toks"), n))
        .as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))

  /** All word n-grams with exact count >= minCount, heaviest first
    * (ties broken by shingle for a deterministic total order), top
    * `k`. `eps` bounds the sketch's additive overcount at
    * eps * total-occurrences; smaller eps = bigger sketch = tighter
    * candidate gate (width ~ e/eps counters x ~ln(1/(1-confidence))
    * rows of 8-byte longs — 1e-4 is ~1 MB). */
  def hotShingles(docs: DataFrame, n: Int, minCount: Long, k: Int,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val stream = shingleStream(docs, n)
    val cms = stream.stat.countMinSketch("h", eps, confidence, 42)
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    stream.filter(candidateGate(col("h"), out.toByteArray, minCount))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("shingle"))
      .limit(k)
  }

  /** The pass-2 gate, exposed for the spec's selectivity pin. */
  def candidateGate(hashed: Column, cmsBytes: Array[Byte],
      minCount: Long): Column =
    GraftSqlBridge.column(CmsAtLeast(
      GraftSqlBridge.expression(hashed), cmsBytes, minCount))

  /** Pass-1 sketch over the n-gram stream, exposed for the spec. */
  def sketchBytes(docs: DataFrame, n: Int, eps: Double,
      confidence: Double): Array[Byte] = {
    val cms = shingleStream(docs, n).stat
      .countMinSketch("h", eps, confidence, 42)
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** The shingle stream with hash, exposed for the spec. */
  def stream(docs: DataFrame, n: Int): DataFrame = shingleStream(docs, n)
}
