package graft

import graft.dedup.SemanticDedup
import graft.functions.VectorFunctions.{dotProduct, l2Norm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured recall of the sign-LSH semantic dedup against the
  * ALL-PAIRS oracle — the same evidence standard every other
  * approximate path in the repo carries (PQSpec 0.34/0.88, IvfPqSpec
  * recall floors, SimHash pigeonhole proof): the scaladoc's collision
  * probability formula p = (1 - arccos(s)/pi)^k is a claim; this spec
  * is the measurement.
  *
  * Ground truth at sf0.1 (2,000 × 64-d embeddings, theta 0.3): a row
  * is truly dominated iff ANY earlier row has cosine >= theta — the
  * unblocked quadratic rule the LSH buckets approximate. 1,871 of
  * 2,000 rows are dominated at this threshold (the synthetic
  * embeddings are diffuse: nothing clears 0.85, so 0.3 is the one
  * measurable threshold, the same one q116's oracle checks).
  *
  * Floors are measured-minus-slack (measured 2026-08-14: 6/1 0.304,
  * 8/1 0.134, 12/1 0.017, 8 planes × 8 tables 0.630). The shape, not
  * just the values, is asserted: recall falls as planes rise (finer
  * buckets, fewer comparisons) and rises with OR-amplified tables —
  * the two knobs a 100 TB deployment trades against compute.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.1"
  private val theta = 0.3

  private lazy val embs = Tables.embeddings(spark, d)
    .select(col("vec_id"), col("embedding"))
    .localCheckpoint()

  /** vec_ids truly dominated by ANY earlier row at cosine >= theta. */
  private lazy val truth: Set[Long] = {
    val e = embs.withColumn("nrm", l2Norm(col("embedding")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(dotProduct(col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")) >= theta)
      .select(col("b.vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  private def flaggedSet(planes: Int, tables: Int): Set[Long] =
    SemanticDedup.flagged(embs, "vec_id", "embedding", 64,
        planes, theta, anchorCap = 4096, nTables = tables)
      .filter(!col("survivor"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  test("recall floors vs the all-pairs oracle; flagging is precision-1") {
    assert(truth.size > 1500, s"degenerate oracle: ${truth.size} dominated")
    val configs = Seq(
      // (planes, tables, recall floor)
      (6, 1, 0.25), (8, 1, 0.10), (12, 1, 0.012), (8, 8, 0.55))
    val recalls = configs.map { case (planes, tables, floor) =>
      val f = flaggedSet(planes, tables)
      // precision 1 by construction: buckets decide which comparisons
      // HAPPEN; every flagged row was verified against a real earlier
      // dominator, so a false flag is impossible at any config
      assert((f -- truth).isEmpty,
        s"planes=$planes tables=$tables flagged rows outside truth: " +
          s"${(f -- truth).take(5)}")
      val recall = f.intersect(truth).size.toDouble / truth.size
      info(f"planes=$planes%2d tables=$tables recall=$recall%.3f " +
        f"(floor $floor)")
      assert(recall >= floor,
        f"planes=$planes tables=$tables recall=$recall%.3f < $floor")
      ((planes, tables), recall)
    }.toMap
    // the knob directions must hold, not just the absolute floors:
    // finer buckets lose recall; OR-amplification wins it back
    assert(recalls((6, 1)) > recalls((8, 1)))
    assert(recalls((8, 1)) > recalls((12, 1)))
    assert(recalls((8, 8)) > 2 * recalls((8, 1)),
      "8 OR-amplified tables must far exceed one")
  }

  test("nTables=1 is exactly the q116 single-table rule") {
    // the multi-table refactor must be invisible at the oracle-checked
    // config: same flagged set, same table-0 bucket ids
    val one = SemanticDedup.flagged(embs, "vec_id", "embedding", 64,
        6, theta, anchorCap = 4096)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val explicit = SemanticDedup.flagged(embs, "vec_id", "embedding", 64,
        6, theta, anchorCap = 4096, nTables = 1)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(one.toSeq === explicit.toSeq)
  }
}
