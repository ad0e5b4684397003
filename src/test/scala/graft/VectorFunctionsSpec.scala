package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    ("a", Seq(1.0f, 2.0f, 3.0f)),
    ("b", Seq(1.0f, 2.0f, 3.0f)),
    ("c", Seq(-1.0f, -2.0f, -3.0f)),
    ("o", Seq(3.0f, -1.5f, 0.0f)), // orthogonal to a
    ("z", Seq(0.0f, 0.0f, 0.0f)))

  private lazy val pairSims: Map[(String, String), Option[Double]] = {
    val df = vecs.toDF("id", "v")
    df.as("x").crossJoin(df.as("y"))
      .select(col("x.id").as("i"), col("y.id").as("j"),
        cosine(col("x.v"), col("y.v")).as("sim"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
  }

  test("cosine: self-similarity is 1") {
    assert(math.abs(pairSims(("a", "a")).get - 1.0) < 1e-12)
  }
  test("cosine: identical vectors score 1, opposite score -1") {
    assert(math.abs(pairSims(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(pairSims(("a", "c")).get + 1.0) < 1e-12)
  }
  test("cosine: symmetric") {
    for ((i, j) <- Seq(("a", "o"), ("a", "c"), ("o", "c")))
      assert(pairSims((i, j)) == pairSims((j, i)))
  }
  test("cosine: orthogonal vectors score 0") {
    assert(math.abs(pairSims(("a", "o")).get) < 1e-12)
  }
  test("cosine: zero-norm vector yields null, not NaN") {
    assert(pairSims(("a", "z")).isEmpty)
    assert(pairSims(("z", "z")).isEmpty)
  }

  test("featurize: deterministic unit vector; empty text is all zeros") {
    val df = Seq("spark engine spark", "spark engine spark", "")
      .toDF("text").select(featurize(col("text"), 8).as("v"))
    val rows = df.collect().map(_.getAs[collection.Seq[Double]]("v"))
    assert(rows(0) == rows(1))
    assert(math.abs(rows(0).map(x => x * x).sum - 1.0) < 1e-9)
    assert(rows(2).forall(_ == 0.0))
    assert(rows(0).length == 8)
  }

  test("featurizeInto matches the Column form and drops scratch columns") {
    val in = Seq(("d1", "alpha beta gamma alpha")).toDF("id", "text")
    val staged = featurizeInto(in, "text", "vec", 8)
    assert(staged.columns.toSeq == Seq("id", "text", "vec"))
    val a = staged.select("vec").collect()(0).getAs[collection.Seq[Double]](0)
    val b = in.select(featurize(col("text"), 8)).collect()(0)
      .getAs[collection.Seq[Double]](0)
    assert(a == b)
  }

  test("native dot product is bit-identical to the composed fold") {
    val df = vecs.toDF("id", "v")
    val rows = df.as("x").crossJoin(df.as("y"))
      .select(dotProduct(col("x.v"), col("y.v")).as("fast"),
        dotProductComposed(col("x.v"), col("y.v")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // double-array inputs take the getDouble path
    val dd = Seq((Seq(0.1, 0.2), Seq(0.3, 0.4))).toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("fast"),
        dotProductComposed(col("a"), col("b")).as("ref")).collect()(0)
    assert(dd.getDouble(0) == dd.getDouble(1))
  }

  test("l2DistanceSq: zero for identical, positive otherwise") {
    val df = vecs.toDF("id", "v")
    val d = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.id") === "a" && col("y.id").isin("b", "o"))
      .select(col("y.id"), l2DistanceSq(col("x.v"), col("y.v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d("b") == 0.0)
    assert(d("o") > 0.0)
  }

  test("native l2 distance is bit-identical to the composed fold") {
    // values chosen to be inexact in binary so a float-vs-double
    // arithmetic divergence or a re-associated fold would flip bits
    val fvecs = Seq(
      ("p", Seq(0.1f, 0.2f, 0.30000001f, -7.7f)),
      ("q", Seq(1.1f, -0.2f, 3.3f, 0.001f)),
      ("r", Seq(-2.5f, 0.7f, 1e-8f, 123.456f)))
    val df = fvecs.toDF("id", "v")
    val rows = df.as("x").crossJoin(df.as("y"))
      .select(l2DistanceSq(col("x.v"), col("y.v")).as("fast"),
        l2DistanceSqComposed(col("x.v"), col("y.v")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // double-array inputs take the getDouble path
    val dd = Seq((Seq(0.1, 0.2, -0.3), Seq(0.3, 0.4, 7.7)))
      .toDF("a", "b")
      .select(l2DistanceSq(col("a"), col("b")).as("fast"),
        l2DistanceSqComposed(col("a"), col("b")).as("ref")).collect()(0)
    assert(java.lang.Double.doubleToLongBits(dd.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(dd.getDouble(1)))
  }

  test("raw float l2 fold (PQ.l2sq semantics) is bit-identical to " +
    "the composed float fold") {
    // WITHOUT the double cast the composed fold's per-element
    // subtract/multiply run in FLOAT — the codegen expression must
    // reproduce exactly that (PQ assignment/re-rank distances ride it;
    // a last-ULP drift would flip window tiebreaks and the ANN pins)
    val fvecs = Seq(
      ("p", Seq(0.1f, 0.2f, 0.30000001f, -7.7f)),
      ("q", Seq(1.1f, -0.2f, 3.3f, 0.001f)),
      ("r", Seq(-2.5f, 0.7f, 1e-8f, 123.456f)))
    val df = fvecs.toDF("id", "v")
    val composedFloat = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    val rows = df.as("x").crossJoin(df.as("y"))
      .select(graft.expressions.VectorExpressions
          .l2sqF(col("x.v"), col("y.v")).as("fast"),
        composedFloat(col("x.v"), col("y.v")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native ADC lookup matches the composed element_at fold on " +
    "in-range codes; invalid subscripts yield null") {
    val m = 3
    val dts = Seq(Seq(0.5, 1.5), Seq(2.25, 3.125), Seq(4.0, 0.625))
    // in-range codes: bit-identical to the composed fold
    val valid = Seq((Seq(0, 1, 1), dts), (Seq(1, 0, 0), dts))
      .toDF("codes", "dts")
    val composed = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + element_at(element_at(col("dts"),
        j.cast("int") + 1), element_at(col("codes"), j.cast("int") + 1) + 1))
    valid.select(
      graft.expressions.VectorExpressions
        .adcF(col("codes"), col("dts"), m).as("fast"),
      composed.as("ref")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // out-of-range code (2 >= k=2): NULL, never a wrong sum (codes are
    // in range by construction in every PQ path; the composed
    // element_at form would raise Spark 4's ANSI invalid-index error —
    // a graceful null is the deliberate divergence here)
    val oob = Seq((Seq(0, 2, 1), dts)).toDF("codes", "dts")
      .select(graft.expressions.VectorExpressions
        .adcF(col("codes"), col("dts"), m).as("fast")).collect()(0)
    assert(oob.isNullAt(0))
  }
}
