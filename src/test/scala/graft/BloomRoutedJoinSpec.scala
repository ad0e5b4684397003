package graft

import graft.layout.RuntimeFilters
import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[graft.operators.Joins.bloomRoutedAntiJoin]] — the
  * routed incremental-dedup anti-join (q120). Invariants:
  *  - result ≡ the plain left-anti join, for healthy AND undersized
  *    (false-positive-heavy) filters, with null and duplicate keys;
  *  - the routed plan never shuffles the corpus (broadcast semi +
  *    broadcast anti — only the bounded confirmed-set distinct
  *    exchanges);
  *  - the fast path is real: with a healthy filter, most fresh rows
  *    bypass the join (suspect set ≈ dups + fpp tail).
  */
class BloomRoutedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def routedVsPlain(incoming: DataFrame, corpus: DataFrame,
      bloom: Array[Byte]): (Seq[String], Seq[String]) = {
    val routed = Joins.bloomRoutedAntiJoin(incoming, corpus, "k", bloom)
      .collect().map(_.mkString("|")).sorted.toSeq
    val plain = incoming.join(corpus.select("k"), Seq("k"), "left_anti")
      .collect().map(_.mkString("|")).sorted.toSeq
    (routed, plain)
  }

  test("routed anti-join equals the plain anti-join (healthy filter)") {
    val corpus = (0L until 500L).map(i => s"key$i").toDF("k")
    val incoming = ((300L until 600L).map(i => s"key$i") ++
      Seq(null.asInstanceOf[String], null.asInstanceOf[String]) ++
      (300L until 310L).map(i => s"key$i")) // duplicate incoming rows
      .toDF("k").withColumn("payload", md5(coalesce(col("k"), lit("n"))))
    val bloom = RuntimeFilters.bloomBytes(corpus, "k", 500L, 0.01)
    val (routed, plain) = routedVsPlain(incoming, corpus, bloom)
    assert(routed == plain)
    // null-key incoming rows survive (null never equals), both paths
    assert(plain.count(_.startsWith("null|")) == 2)
    // and the survivors are exactly the 100 fresh keys + 2 nulls
    assert(plain.size == 102)
  }

  test("an undersized filter only moves rows to the exact path") {
    val corpus = (0L until 500L).map(i => s"key$i").toDF("k")
    val incoming = (300L until 600L).map(i => s"key$i")
      .toDF("k").withColumn("payload", md5(col("k")))
    // capacity 10 for 500 keys: fpp is enormous — nearly everything
    // probes positive and takes the exact anti-join; the ANSWER must
    // not move
    val tiny = RuntimeFilters.bloomBytes(corpus, "k", 10L, 0.5)
    val (routed, plain) = routedVsPlain(incoming, corpus, tiny)
    assert(routed == plain)
  }

  test("the corpus never shuffles; the fast path carries the fresh rows") {
    val corpus = (0L until 2000L).map(i => s"key$i").toDF("k")
    val incoming = (1900L until 2900L).map(i => s"key$i")
      .toDF("k").withColumn("payload", md5(col("k")))
    val bloom = RuntimeFilters.bloomBytes(corpus, "k", 2000L, 0.01)
    val routed = Joins.bloomRoutedAntiJoin(incoming, corpus, "k", bloom)
    val plan = routed.queryExecution.executedPlan.toString
    // both joins are broadcast (semi builds the suspect keys, anti
    // builds the confirmed set) — the corpus side appears under NO
    // hash exchange; the only exchange allowed is the bounded
    // confirmed-set distinct
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, plan.take(3000))
    // fast-path share: 900 of 1000 incoming keys are fresh; at fpp
    // 0.01 the suspect set is ~100 dups + a few false positives, so
    // the bypass carries >85% of the batch
    val suspects = incoming.filter(
      RuntimeFilters.mightContain(col("k"), bloom)).count()
    assert(suspects >= 100 && suspects <= 150, s"suspects=$suspects")
    assert(routed.count() == 900)
  }
}
