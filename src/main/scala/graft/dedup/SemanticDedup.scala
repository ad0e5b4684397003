package graft.dedup

import graft.functions.VectorFunctions.{dotProduct, l2Norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-shaped semantic deduplication over an embedding column,
  * with CONTENT-derived blocking: sign-LSH hyperplane buckets replace
  * the label/cluster blocking of [[graft.operators.DedupQueries]] q45.
  * Registry query q116 is this API at (6 planes, theta 0.3, 1 table);
  * the deterministic hyperplanes embed identically in its DuckDB
  * oracle.
  *
  * Scale shape (100 TB): one narrow shuffle on `bucket` per table (the
  * anchor window), then an equi-join on bucket whose pairwise work is
  * bounded per bucket — never a global O(n²). `nPlanes` is the
  * per-table scale knob: buckets double per plane, so bucket
  * population (and per-bucket pair cost) halves — 6 planes for a
  * 10^3-row corpus, 12+ at 10^5, etc. The price is recall: a near-dup
  * pair straddling buckets is out of scope by construction — sign-LSH
  * collision probability for cosine similarity s is
  * p = (1 - arccos(s)/pi)^nPlanes per table.
  *
  * `nTables` buys that recall back by OR-amplification, exactly like
  * the MinHash band tables ([[NearDup]]) and SimHash bands: L
  * independent hyperplane sets, a row is flagged when dominated in ANY
  * table, so pair recall rises to 1 - (1 - p)^L at L× the bucketing
  * cost. MEASURED against the all-pairs oracle at sf0.1 (2,000 × 64-d
  * embeddings, theta 0.3, flagged-set recall — SemanticDedupSpec pins
  * floors): planes/tables 6/1 → 0.30, 8/1 → 0.13, 12/1 → 0.017,
  * 8/8 → 0.63. Flagging is precision-1 by construction at ANY config
  * (a flagged row IS dominated by an earlier doc — buckets only decide
  * which comparisons happen), so the knobs trade recall against
  * compute, never correctness of what is flagged.
  *
  * `anchorCap` bounds the degenerate corpus (every row identical ->
  * one bucket): each row compares against at most the cap earliest
  * rows of its bucket, the same fence [[NearDup.candidatePairs]] puts
  * on LSH band buckets.
  *
  * Determinism: fixed-seed LCG hyperplanes (table t uses
  * `seed + 1000·t`), left-to-right double accumulation in the dot
  * product ([[dotProduct]] compiles to the codegen'd FloatDotProduct),
  * ties broken by id. Corpus embeddings are assumed non-zero (a zero
  * vector's cosine is NaN, which never passes the threshold in Spark;
  * keep the oracle's semantics in mind if one can occur).
  */
object SemanticDedup {

  /** Deterministic integer hyperplanes (components in [-8, 7]) from a
    * fixed-seed LCG — reproducible in plain SQL, no RNG library drift. */
  def hyperplanes(nPlanes: Int, dim: Int,
      seed: Long = 42L): Seq[Seq[Double]] = {
    var s = seed
    Seq.fill(nPlanes)(Seq.fill(dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 16 - 8).toDouble
    })
  }

  /** Bucket id: bit j set iff `emb . plane_j > 0`. */
  def signBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dotProduct(emb, typedlit(p)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (vec_id, bucket, survivor): survivor=false iff cosine >= `theta`
    * to an EARLIER anchor sharing a bucket in ANY of the `nTables`
    * hyperplane tables (anchors are the first `anchorCap` ids of each
    * bucket; `bucket` in the output is always table 0's, the
    * single-table id q116's oracle reproduces). With one table and
    * anchorCap >= max bucket population this is exactly "dominated by
    * any earlier same-bucket doc" — q116's oracle-checked rule; the
    * cap only engages on degenerate skew. */
  def flagged(embs: DataFrame, idCol: String, embCol: String, dim: Int,
      nPlanes: Int, theta: Double, anchorCap: Int = 256,
      nTables: Int = 1): DataFrame = {
    require(nTables >= 1, "nTables must be at least 1")
    val base = embs
      .select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .withColumn("nrm", l2Norm(col("embedding")))
    def bucketed(table: Int): DataFrame =
      base.withColumn("bucket",
        signBucket(col("embedding"),
          hyperplanes(nPlanes, dim, seed = 42L + 1000L * table)).cast("int"))
    // table 0 is also the output's bucket column — build it once
    val b0 = bucketed(0)
    def dominatedIn(b: DataFrame): DataFrame = {
      val anchors = b
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("vec_id"))))
        .filter(col("rk") <= anchorCap)
        .select(col("bucket").as("a_bucket"), col("vec_id").as("a_id"),
          col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      b.join(anchors,
          col("a_bucket") === col("bucket") && col("a_id") < col("vec_id"))
        .filter(dotProduct(col("a_emb"), col("embedding"))
          / (col("a_nrm") * col("nrm")) >= theta)
        .select(col("vec_id"))
    }
    val dominated =
      (dominatedIn(b0) +: (1 until nTables).map(t => dominatedIn(bucketed(t))))
        .reduce(_ union _)
        .distinct()
        .withColumn("dom", lit(true))
    b0.join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("dom").isNull.as("survivor"))
  }

  /** The kept rows of `embs` under [[flagged]]'s rule. */
  def survivors(embs: DataFrame, idCol: String, embCol: String, dim: Int,
      nPlanes: Int, theta: Double, anchorCap: Int = 256,
      nTables: Int = 1): DataFrame =
    embs.join(
      flagged(embs, idCol, embCol, dim, nPlanes, theta, anchorCap, nTables)
        .filter(col("survivor")).select(col("vec_id").as(idCol)),
      Seq(idCol), "left_semi")
}
