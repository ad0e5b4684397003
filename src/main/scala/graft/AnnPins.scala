package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: regenerate the pinned sf0.01 ANN retrieval lists embedded
  * in the q100/q110 oracle SQL (VectorQueries.PINS_Q100/PINS_Q110).
  * The indexes are deterministic (spec-pinned bit-identical rebuilds),
  * so these change ONLY when the index/probe algorithms or knobs
  * change — paste the printed lists over the constants when they do.
  * Run: `sbt "runMain graft.AnnPins"`. */
object AnnPins {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val corpus = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

    def pins(df: org.apache.spark.sql.DataFrame): String =
      df.select(col("query_id"), col("vec_id"))
        .orderBy("query_id", "vec_id").collect()
        .map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(",")

    // Force FRESH builds: pins must be printed from THIS code's
    // artifacts, never a cached /tmp build — otherwise regenerated pins
    // after an algorithm edit could keep correctness green without the
    // new code ever running (the marker's AlgoVersion already guards
    // the common case; deleting makes pin generation unconditional).
    def rmTree(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) f.listFiles.foreach(rmTree)
      f.delete()
    }
    Seq(graft.operators.VectorQueries.q110IndexPath(d),
        graft.operators.VectorQueries.q100CodebooksPath(d),
        graft.operators.VectorQueries.q117IndexPath(d),
        graft.operators.VectorQueries.q170IndexPath(d),
        graft.operators.VectorQueries.q173IndexPath(d))
      .flatMap(p => Seq(p, s"$p.params", s"$p.codebooks", s"$p.centroids",
        s"$p.tombstones"))
      .foreach(p => rmTree(new java.io.File(p)))
    // the pinned lists are only valid for this algorithm version — the
    // same constant every artifact cache marker carries
    println("AnnAlgoVersion = " + graft.vector.AnnVersion.AlgoVersion)

    val m = 8
    val (cb, trained) =
      graft.operators.VectorQueries.ensureQ100Codebooks(spark, d)
    assert(trained, "q100 codebooks must be freshly trained for pins")
    val codes = graft.vector.PQ.encode(corpus, cb, m)
    println("PINS_Q100 = " + pins(graft.vector.PQ.searchRerank(
      codes, cb, queries, corpus, m, shortlist = 100, topK = 10)))

    val (cents, built) =
      graft.operators.VectorQueries.ensureQ110Index(spark, d)
    assert(built, "q110 index must be freshly built for pins")
    println("PINS_Q110 = " + pins(graft.vector.IvfPq.probe(
      spark, graft.operators.VectorQueries.q110IndexPath(d), cents,
      queries, m = 8, topK = 10, nProbe = 6, shortlist = 100)))

    // q117: base-built + delta-appended index (fresh — the artifact
    // dirs were deleted above, so build AND append both run here)
    val (cents117, ran117) =
      graft.operators.VectorQueries.ensureQ117Index(spark, d)
    assert(ran117, "q117 index must be freshly built+appended for pins")
    println("PINS_Q117 = " + pins(graft.vector.IvfPq.probe(
      spark, graft.operators.VectorQueries.q117IndexPath(d), cents117,
      queries, m = 8, topK = 10, nProbe = 6, shortlist = 100)))

    // q171: adaptive multi-probe over q110's persisted IVF-PQ index
    // (fresh from the build above)
    println("PINS_Q171 = " + pins(graft.vector.IvfPq.probeAdaptive(
      spark, graft.operators.VectorQueries.q110IndexPath(d), cents,
      queries, m = 8, topK = 10, shortlist = 150,
      slack = graft.operators.VectorQueries.Q170_SLACK,
      minProbe = graft.operators.VectorQueries.Q170_MIN_PROBE)))

    // q173: the delete-propagation index — full-corpus build, then
    // every vec_id % 10 == 3 tombstoned; pins are the post-delete
    // adaptive retrieval (and must contain no deleted id)
    val (cents173, ran173) =
      graft.operators.VectorQueries.ensureQ173Index(spark, d)
    assert(ran173, "q173 index must be freshly built+deleted for pins")
    val p173 = graft.vector.IvfPq.probeAdaptive(
      spark, graft.operators.VectorQueries.q173IndexPath(d), cents173,
      queries, m = 8, topK = 10, shortlist = 150,
      slack = graft.operators.VectorQueries.Q170_SLACK,
      minProbe = graft.operators.VectorQueries.Q170_MIN_PROBE)
    assert(p173.filter(col("vec_id") % 10 === 3).count() == 0,
      "deleted ids must never appear in q173 pins")
    println("PINS_Q173 = " + pins(p173))

    // q170: the serving-grade config (k-means++ centroids + adaptive
    // multi-probe), with its MEASURED COST printed beside the pins —
    // the (slack, minProbe) operating point's recall is pinned in
    // VectorIndexSpec; this records what the recall is bought at.
    val (cents170, built170) =
      graft.operators.VectorQueries.ensureQ170Index(spark, d)
    assert(built170, "q170 index must be freshly built for pins")
    def servingProbe() = graft.vector.VectorIndex.probeAdaptive(
      spark, graft.operators.VectorQueries.q170IndexPath(d), cents170,
      queries, k = 10,
      slack = graft.operators.VectorQueries.Q170_SLACK,
      minProbe = graft.operators.VectorQueries.Q170_MIN_PROBE)
    println("PINS_Q170 = " + pins(servingProbe()))

    // q175: the PRUNED two-level probe over q170's fresh index (its
    // level-1 quantizer derives deterministically from the persisted
    // centroids)
    val (sc175, map175) = graft.vector.VectorIndex
      .superCentroids(cents170, 3)
    println("PINS_Q175 = " + pins(
      graft.vector.VectorIndex.probeAdaptive2(spark,
        graft.operators.VectorQueries.q170IndexPath(d), cents170,
        sc175, map175, queries, k = 10,
        slack = graft.operators.VectorQueries.Q170_SLACK,
        minProbe = graft.operators.VectorQueries.Q170_MIN_PROBE,
        l1Slack = 1.0, l1MinProbe = 1)))
    val nCent = cents170.count()
    val nQ = queries.count()
    val t0 = System.nanoTime()
    servingProbe().collect()
    val servingSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.vector.VectorIndex.probe(spark,
      graft.operators.VectorQueries.q170IndexPath(d), cents170,
      queries, k = 10, nProbe = 2).collect()
    val fixedSec = (System.nanoTime() - t1) / 1e9
    println(f"Q170 serving cost: adaptive(slack=" +
      f"${graft.operators.VectorQueries.Q170_SLACK}, minProbe=" +
      f"${graft.operators.VectorQueries.Q170_MIN_PROBE}) " +
      f"$servingSec%.2f s vs fixed nProbe=2 $fixedSec%.2f s over " +
      f"$nQ queries x $nCent buckets (recall pin: VectorIndexSpec)")
    spark.stop()
  }
}
