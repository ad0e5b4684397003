package graft

import graft.text.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CMS gate is an approximation that must never reach the answer:
  * exactness parity against the ungated group-by, the never-undercount
  * contract that parity rests on, and the selectivity the gate exists
  * for (on a synthetic skewed corpus — the organic test corpus is
  * near-uniform, so skew is constructed here).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gated heavy hitters == exact ungated group-by (sf0.001, low threshold)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = HeavyHitters.hotShingles(docs, n = 3, minCount = 3, k = 30)
      .as[(String, Long)].collect().toSeq
    val want = HeavyHitters.stream(docs, 3)
      .groupBy("shingle").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .orderBy(col("n").desc, col("shingle")).limit(30)
      .as[(String, Long)].collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("CMS estimates never undercount (the contract exactness rests on)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val bytes = HeavyHitters.sketchBytes(docs, 3, 1e-4, 0.99)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = HeavyHitters.stream(docs, 3)
      .groupBy("h").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (h, n) =>
      assert(cms.estimateCount(h) >= n, s"undercount for hash $h")
    }
  }

  test("the gate keeps the unique tail out of the shuffle on a skewed corpus") {
    // 2000 unique-text docs (the tail) + 50 copies of one hot doc
    val tail = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("unique "), col("id").cast("string"), lit(" text "),
        (col("id") * 7).cast("string"), lit(" tok "),
        (col("id") * 13).cast("string")).as("text"))
    val hot = spark.range(50).select((col("id") + 10000).as("doc_id"),
      lit("the hot boilerplate banner line").as("text"))
    val docs = tail.unionByName(hot)
    val bytes = HeavyHitters.sketchBytes(docs, 3, 1e-4, 0.99)
    val stream = HeavyHitters.stream(docs, 3)
    val total = stream.count()
    val gated = stream
      .filter(HeavyHitters.candidateGate(col("h"), bytes, 40L)).count()
    // ~6k tail shingles, ~150 hot occurrences: the gate must pass the
    // hot shingles and drop (at least) the vast majority of the tail
    assert(gated >= 150, s"gate dropped true hitters: $gated")
    assert(gated <= total / 10, s"gate too loose: $gated of $total")
    // and the final answer off this corpus is the exact one
    val res = HeavyHitters.hotShingles(docs, 3, minCount = 40, k = 10)
      .as[(String, Long)].collect().toSeq
    // all three hot 3-grams tie at 50, so the shingle tiebreak orders
    // them alphabetically
    assert(res == Seq(("boilerplate banner line", 50L),
      ("hot boilerplate banner", 50L), ("the hot boilerplate", 50L)))
  }
}
