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

    val m = 8
    val cb = graft.vector.PQ.trainCodebooks(corpus, m, 16, iters = 2)
    val codes = graft.vector.PQ.encode(corpus, cb, m)
    println("PINS_Q100 = " + pins(graft.vector.PQ.searchRerank(
      codes, cb, queries, corpus, m, shortlist = 100, topK = 10)))

    val (cents, _) = graft.operators.VectorQueries.ensureQ110Index(spark, d)
    println("PINS_Q110 = " + pins(graft.vector.IvfPq.probe(
      spark, graft.operators.VectorQueries.q110IndexPath(d), cents,
      queries, m = 8, topK = 10, nProbe = 6, shortlist = 100)))
    spark.stop()
  }
}
