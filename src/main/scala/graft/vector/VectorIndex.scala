package graft.vector

import graft.expressions.VectorExpressions.dotF
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) vector index: the build-once /
  * probe-many ANN layout (the Spark-native replacement for the
  * reference's Pinecone index, `/root/reference/consumer/consumer.py:58-67`).
  *
  * BUILD: assign every corpus vector to its nearest coarse centroid
  * (one broadcast pass over the corpus) and write the assignments
  * PARTITIONED BY bucket — each centroid's posting list is its own
  * parquet directory.
  *
  * PROBE: a query scores only its nProbe nearest centroids' partitions;
  * the bucket filter prunes at PLANNING time (PartitionFilters), so a
  * 100 TB index with 10k centroids reads ~nProbe/10k of the data per
  * query batch. Exactness degrades gracefully: nProbe = #centroids is
  * brute force.
  */
object VectorIndex {

  /** Coarse SEED centroids: deterministic sample of the corpus (stride
    * over vec_id). Use directly for a sampling-based index, or refine
    * with [[kmeansCentroids]] (Lloyd's) for better recall at fixed
    * nProbe. The stride filter runs fully parallel and pushes to
    * the scan; only the ~n selected rows pass through the
    * (single-partition, size-n) ranking window — never the corpus, so
    * the build has no global-order bottleneck at scale.
    * Returns (cent_id, c_emb, c_nrm). */
  def centroids(corpus: DataFrame, n: Int): DataFrame = {
    val total = corpus.count()
    // Stride over a HASH of vec_id, not the raw id: a corpus whose id
    // set shares a factor with the stride (e.g. an 80% base split
    // excluding ids ≡ 0 mod 5, stride a multiple of 5) has ZERO rows
    // at `vec_id % stride == 0` — the seed set silently empties and
    // every downstream build degenerates. xxhash64 is deterministic,
    // so seeds stay reproducible; stride targets 2n expected hits so
    // hash variance almost surely leaves ≥ n to pick from.
    val stride = math.max(total / math.max(2L * n, 1L), 1L)
    val sampled = corpus
      .filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(n)
    val w = Window.orderBy(col("vec_id")) // over <= n rows only
    sampled
      .withColumn("cent_id", (row_number().over(w) - 1).cast("int"))
      .select(col("cent_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"))
  }

  /** Nearest-centroid (cosine) assignment of every corpus vector:
    * (vec_id, embedding, nrm, bucket). One broadcast of the centroids,
    * one corpus pass, one per-vec_id window to pick the argmax. */
  private def assignBuckets(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus
      .withColumn("nrm", l2Norm(col("embedding")))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        when(col("nrm") === 0.0 || col("c_nrm") === 0.0, lit(-2.0))
          .otherwise(dotF(col("c_emb"), col("embedding"))
            / (col("c_nrm") * col("nrm"))).as("csim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cent_id").as("bucket"))
  }

  /** Lloyd's k-means refinement of the stride seeds: `iters` fixed
    * iterations of assign -> exact per-dimension mean -> recenter.
    * Empty clusters keep their previous centroid.
    *
    * The per-dimension means accumulate as DECIMAL sums over a
    * posexplode — decimal addition is exact, hence order-independent,
    * so the refined centroids are bit-identical across runs and
    * partitionings (float/double sums would depend on shuffle arrival
    * order). The explode shuffles (bucket, pos, x) — dim x corpus rows
    * — which is the deliberate price of a reproducible one-time build;
    * assignment passes stay one broadcast + one window each.
    * Returns (cent_id, c_emb, c_nrm), same schema as [[centroids]]. */
  def kmeansCentroids(corpus: DataFrame, n: Int, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    var cents = centroids(corpus, n).localCheckpoint()
    var it = 0
    while (it < iters) {
      val means = assignBuckets(corpus, cents)
        .select(col("bucket"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("bucket"), col("pos"))
        .agg(avg(col("x").cast(DecimalType(38, 12))).as("m"))
        .groupBy(col("bucket"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("bucket").as("cent_id"),
          transform(col("pm"), p => p.getField("m").cast("float")).as("m_emb"))
      cents = cents.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("m_emb"), col("c_emb")).as("c_emb"))
        .withColumn("c_nrm", l2Norm(col("c_emb")))
        .localCheckpoint()
      it += 1
    }
    cents
  }

  /** Assign each corpus vector to its nearest centroid (cosine) and
    * write the index partitioned by bucket. */
  def build(corpus: DataFrame, cents: DataFrame, path: String): Unit =
    assignBuckets(corpus, cents)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe: top-k cosine neighbors for each query, scanning only each
    * query's nProbe nearest buckets. Queries: (query_id, q_emb). */
  def probe(spark: SparkSession, indexPath: String, cents: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val q = queries
      .withColumn("q_nrm", l2Norm(col("q_emb")))
    // nProbe nearest centroids per query (tiny: queries x centroids)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probeBuckets = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cent_id"),
        when(col("q_nrm") === 0.0 || col("c_nrm") === 0.0, lit(-2.0))
          .otherwise(dotF(col("c_emb"), col("q_emb"))
            / (col("c_nrm") * col("q_nrm"))).as("csim"))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("cent_id").as("bucket"))
    // scan ONLY the probed buckets: the bucket IN (...) filter is a
    // partition filter -> planning-time pruning of the index dirs
    val buckets = probeBuckets.select("bucket").distinct()
      .collect().map(_.getInt(0))
    val index = spark.read.parquet(indexPath)
      .filter(col("bucket").isin(buckets.toSeq: _*))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    index.join(broadcast(probeBuckets), "bucket")
      .select(col("query_id"), col("vec_id"),
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0,
          lit(null).cast("double"))
          .otherwise(dotF(col("q_emb"), col("embedding"))
            / (col("q_nrm") * col("nrm"))).as("sim"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
  }
}
