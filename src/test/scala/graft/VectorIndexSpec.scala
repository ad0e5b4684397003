package graft

import graft.layout.Layout
import graft.vector.VectorIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private lazy val corpus = Tables.embeddings(spark, d)

  test("IVF build partitions the index by bucket; probe prunes partitions") {
    val tmp = Files.createTempDirectory("graft-ivf").toString
    val cents = VectorIndex.centroids(corpus, 8).cache()
    assert(cents.count() == 8)
    VectorIndex.build(corpus, cents, s"$tmp/index")
    // every corpus vector landed in exactly one bucket
    val idx = spark.read.parquet(s"$tmp/index")
    assert(idx.count() == corpus.count())
    assert(idx.select("bucket").distinct().count() <= 8)
    // probing with nProbe=2 scans only the probed buckets' partitions
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val res = VectorIndex.probe(spark, s"$tmp/index", cents, queries,
      k = 5, nProbe = 2)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // self-hit: each query's own vector is in its probed partition set
    // (its own bucket is its nearest centroid's bucket by construction),
    // so rank-1 is itself with sim ~ 1
    val top = rows.filter(_.getInt(1) == 1)
    assert(top.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9))
    // pruning is visible in the scan: PartitionFilters on bucket
    val scan = spark.read.parquet(s"$tmp/index")
      .filter(col("bucket").isin(0, 1))
    assert(Layout.scanFilters(scan).contains("PartitionFilters: ["))
  }

  private def recallAtK(cents: org.apache.spark.sql.DataFrame,
      nProbe: Int, k: Int): Double = {
    import graft.functions.VectorFunctions._
    val tmp = Files.createTempDirectory("graft-ivf-recall").toString
    VectorIndex.build(corpus, cents, s"$tmp/index")
    val queries = corpus.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ivf = VectorIndex.probe(spark, s"$tmp/index", cents, queries,
      k = k, nProbe = nProbe)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    val brute = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("k-means centroids: recall at fixed nProbe beats the stride seeds") {
    val seeds = VectorIndex.centroids(corpus, 8).cache()
    val refined = VectorIndex.kmeansCentroids(corpus, 8, iters = 2)
    val strideRecall = recallAtK(seeds, nProbe = 2, k = 10)
    val kmeansRecall = recallAtK(refined, nProbe = 2, k = 10)
    info(f"stride recall@10=$strideRecall%.3f kmeans recall@10=$kmeansRecall%.3f")
    assert(kmeansRecall >= strideRecall)
    // collapse guard, not a tuning target: 500 vectors / 8 buckets /
    // nProbe 2 puts seed-dependent recall in the 0.45-0.55 band
    // (hash-stride seeds: 0.475); a degenerate build reads ~0.0-0.2
    assert(kmeansRecall >= 0.45)
  }

  test("k-means build is deterministic across runs") {
    val a = VectorIndex.kmeansCentroids(corpus, 8, iters = 2)
      .orderBy("cent_id").collect().map(_.getSeq[Float](1)).toSeq
    val b = VectorIndex.kmeansCentroids(corpus, 8, iters = 2)
      .orderBy("cent_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(a === b)
  }

  test("probe with nProbe = #centroids equals brute force") {
    val tmp = Files.createTempDirectory("graft-ivf2").toString
    val cents = VectorIndex.centroids(corpus, 4).cache()
    VectorIndex.build(corpus, cents, s"$tmp/index")
    val queries = corpus.filter(col("vec_id") === 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ivf = VectorIndex.probe(spark, s"$tmp/index", cents, queries,
      k = 10, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = {
      val q = queries
      import graft.functions.VectorFunctions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      corpus.crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    }
    assert(ivf == brute)
  }
}
