package graft.dedup

import graft.functions.VectorFunctions.{dotProduct, l2Norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-shaped semantic deduplication over an embedding column,
  * with CONTENT-derived blocking: sign-LSH hyperplane buckets replace
  * the label/cluster blocking of [[graft.operators.DedupQueries]] q45.
  * Registry query q116 is this API at (6 planes, theta 0.3); the
  * deterministic hyperplanes embed identically in its DuckDB oracle.
  *
  * Scale shape (100 TB): one narrow shuffle on `bucket` (the anchor
  * window), then an equi-join on bucket whose pairwise work is bounded
  * per bucket — never a global O(n²). `nPlanes` is the scale knob:
  * buckets double per plane, so bucket population (and per-bucket pair
  * cost) halves — 6 planes for a 10^3-row corpus, 12+ at 10^5, etc.
  * The price is recall: a near-dup pair straddling buckets is out of
  * scope by construction (sign-LSH collision probability for cosine
  * similarity s is (1 - arccos(s)/pi)^nPlanes). `anchorCap` bounds the
  * degenerate corpus (every row identical -> one bucket): each row
  * compares against at most the cap earliest rows of its bucket, the
  * same fence [[NearDup.candidatePairs]] puts on LSH band buckets.
  *
  * Determinism: fixed-seed LCG hyperplanes, left-to-right double
  * accumulation in the dot product ([[dotProduct]] compiles to the
  * codegen'd FloatDotProduct), ties broken by id. Corpus embeddings
  * are assumed non-zero (a zero vector's cosine is NaN, which never
  * passes the threshold in Spark; keep the oracle's semantics in mind
  * if one can occur).
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
    * to an EARLIER same-bucket anchor (the first `anchorCap` ids of
    * the bucket). With anchorCap >= max bucket population this is
    * exactly "dominated by any earlier same-bucket doc" — q116's
    * oracle-checked rule; the cap only engages on degenerate skew. */
  def flagged(embs: DataFrame, idCol: String, embCol: String, dim: Int,
      nPlanes: Int, theta: Double, anchorCap: Int = 256): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val b = embs
      .select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .withColumn("bucket", signBucket(col("embedding"), planes).cast("int"))
      .withColumn("nrm", l2Norm(col("embedding")))
    val anchors = b
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("vec_id"))))
      .filter(col("rk") <= anchorCap)
      .select(col("bucket").as("a_bucket"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val dominated = b
      .join(anchors,
        col("a_bucket") === col("bucket") && col("a_id") < col("vec_id"))
      .filter(dotProduct(col("a_emb"), col("embedding"))
        / (col("a_nrm") * col("nrm")) >= theta)
      .select(col("vec_id")).distinct()
      .withColumn("dom", lit(true))
    b.join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("dom").isNull.as("survivor"))
  }

  /** The kept rows of `embs` under [[flagged]]'s rule. */
  def survivors(embs: DataFrame, idCol: String, embCol: String, dim: Int,
      nPlanes: Int, theta: Double, anchorCap: Int = 256): DataFrame =
    embs.join(
      flagged(embs, idCol, embCol, dim, nPlanes, theta, anchorCap)
        .filter(col("survivor")).select(col("vec_id").as(idCol)),
      Seq(idCol), "left_semi")
}
