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
}
