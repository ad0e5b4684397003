package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokens lowercases, splits on whitespace, and guards empty text") {
    assert(one[collection.Seq[String]](tokens(col("text")), "Hello  World\tfoo") ==
      Seq("hello", "world", "foo"))
    assert(one[collection.Seq[String]](tokens(col("text")), "") == Seq.empty)
    assert(one[collection.Seq[String]](tokens(col("text")), "   ") == Seq.empty)
  }

  test("shinglesOf builds n-grams and yields empty below n tokens") {
    val df = Seq("a b c d").toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(shinglesOf(col("toks"), 3).as("sh"))
    assert(df.collect()(0).getAs[collection.Seq[String]]("sh") ==
      Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(shinglesOf(col("toks"), 3).as("sh"))
    assert(short.collect()(0).getAs[collection.Seq[String]]("sh").isEmpty)
  }

  test("minhash signature is deterministic, k-long, and permutation-sensitive") {
    def sig(text: String): collection.Seq[Long] =
      Seq(text).toDF("text")
        .select(tokens(col("text")).as("toks"))
        .withColumn("th", tokenHashes(col("toks")))
        .withColumn("hs", shingleHashesOf(col("th"), 3))
        .select(minhashSignature(col("hs"), 12).as("sig"))
        .collect()(0).getAs[collection.Seq[Long]]("sig")
    val a = sig("the quick brown fox jumps over the lazy dog")
    assert(a.length == 12)
    assert(a == sig("the quick brown fox jumps over the lazy dog"))
    // token order matters (shingle windows are position-weighted)
    assert(a != sig("dog lazy the over jumps fox brown quick the"))
    // identical docs share every component; near-identical share most
    val b = sig("the quick brown fox jumps over the lazy cat")
    assert(a.zip(b).count { case (x, y) => x == y } >= 4)
  }

  test("simhash of identical docs has hamming 0; disjoint docs differ") {
    val df = Seq(
      ("a", "spark query engine"),
      ("b", "spark query engine"),
      ("c", "entirely different words here")).toDF("id", "text")
      .select(col("id"), tokens(col("text")).as("toks"))
      .withColumn("th", tokenHashes(col("toks")))
      .select(col("id"), simhashOf(col("th"), 16).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    val d = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.id") === "a" && col("y.id") === "b")
      .select(hammingDistance(col("x.sh"), col("y.sh"), 16).as("h"))
      .collect()(0).getAs[Long]("h")
    assert(d == 0L)
  }

  test("fingerprint normalizes whitespace and case") {
    val fps = Seq("Hello   World", "hello world", "HELLO\tWORLD", "other")
      .toDF("text").select(fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(0) != fps(3))
  }

  test("quality score is in [0,1] and 0-token text scores low") {
    val scores = Seq(
      ("long", ("word " * 120).trim + " the of and in is on for to a an"),
      ("empty", ""),
      ("punct", "!!! ??? ### $$$ %%%"))
      .toDF("id", "text")
      .select(col("id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("id"), qualityScoreOf(col("text"), col("toks")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    scores.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(scores("long") > scores("empty"))
    assert(scores("long") > scores("punct"))
  }

  test("unicode text: tokens split correctly, lengths count characters") {
    assert(one[collection.Seq[String]](tokens(col("text")),
      "Héllo wörld münchen") // NBSP is not \s: stays inside a token
      == Seq("héllo wörld", "münchen"))
    assert(one[collection.Seq[String]](tokens(col("text")),
      "日本語 テスト") == Seq("日本語", "テスト"))
    val mtl = Seq("日本語 テスト").toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(meanTokenLengthOf(col("toks")).as("m"))
      .collect()(0).getDouble(0)
    assert(mtl == 3.0) // characters, not bytes
  }

  test("tokens handles leading/trailing tabs and newlines (no empties)") {
    assert(one[collection.Seq[String]](tokens(col("text")), "\tfoo bar\n")
      == Seq("foo", "bar"))
    assert(one[collection.Seq[String]](tokens(col("text")), "\n\t ")
      == Seq.empty)
  }

  test("subwordCount counts runs + punctuation, 0 for empty") {
    assert(one[Long](subwordCount(col("text")), "don't stop!") == 5L)
    assert(one[Long](subwordCount(col("text")), "") == 0L)
    assert(one[Long](subwordCount(col("text")), "   ") == 0L)
  }

  test("native text expressions COMPILE under codegen (no silent fallback)") {
    // Regression pin: a doGenCode template emitting a line that BEGINS
    // with '|' (a wrapped '||') loses the operator to a downstream
    // stripMargin and janino rejects the projection — Spark then falls
    // back to interpreted eval SILENTLY, costing the codegen the
    // expressions exist for. CODEGEN_ONLY turns that fallback into a
    // hard failure; whole-stage codegen is disabled so the exact
    // GenerateUnsafeProjection path that mis-parsed is the one built.
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWsc = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val rows = Seq("Hello, wide WORLD 42!", "naïve — café", "")
        .toDF("text")
        .select(
          qualityScoreOf(col("text"), tokens(col("text"))).as("q"),
          subwordCount(col("text")).as("sw"))
        .collect()
      assert(rows.length == 3)
      assert(rows.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
      assert(rows.map(_.getLong(1)).toSeq == Seq(6L, 6L, 0L))
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
      prevWsc.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        v => spark.conf.set("spark.sql.codegen.wholeStage", v))
    }
  }
}
