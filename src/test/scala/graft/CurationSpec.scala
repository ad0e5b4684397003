package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the curation operators (q101-q106) on tiny literal
  * frames — the fast layer under the DuckDB-oracle gate. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val out = v1.as("a")
      .join(v2.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("a.doc_id").isNull, "added")
          .when(col("b.doc_id").isNull, "removed")
          .when(col("a.fp") =!= col("b.fp"), "changed")
          .otherwise("unchanged").as("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("adjacent pair fan-out counts BPE candidates; short docs drop out") {
    val docs = Seq("a b a b c", "a b", "x", "").toDF("text")
    val toks = col("toks")
    val pairs = docs.select(tokens(col("text")).as("toks"))
      .select(explode_outer(transform(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        (x, i) => concat_ws(" ", x, element_at(toks, i + 2))))
        .as("pair"))
      .filter(col("pair").isNotNull)
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b a b c": pairs (a b), (b a), (a b), (b c); "a b": (a b)
    assert(pairs == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("url canonicalization collapses case/port/tracking variants") {
    val urls = Seq(
      "HTTPS://Host1.Example.COM:443/p2/?utm_source=s9&id=3#frag",
      "https://host1.example.com/p2?id=3",
      "https://host2.example.com/p2?id=3").toDF("url")
    val canon = urls.select(concat(lit("https://"),
      lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1)),
      rtrim(regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        "/"),
      lit("?id="), regexp_extract(col("url"), "[?&]id=([0-9]+)", 1))
      .as("canonical"))
      .as[String].collect()
    assert(canon(0) == canon(1), "messy and clean forms must collapse")
    assert(canon(0) == "https://host1.example.com/p2?id=3")
    assert(canon(2) == "https://host2.example.com/p2?id=3")
    assert(canon(0) != canon(2), "distinct hosts must stay distinct")
  }

  test("upsert merge emits insert/update/noop/keep per key") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val batch = Seq((2L, "b2"), (3L, "c"), (9L, "new")).toDF("doc_id", "text")
    val out = corpus.as("c")
      .join(batch.as("b"), col("c.doc_id") === col("b.doc_id"), "full_outer")
      .select(coalesce(col("b.doc_id"), col("c.doc_id")).as("doc_id"),
        when(col("c.doc_id").isNull, "insert")
          .when(col("b.doc_id").isNull, "keep")
          .when(fingerprint(col("b.text")) =!= fingerprint(col("c.text")),
            "update")
          .otherwise("noop").as("action"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "keep", 2L -> "update", 3L -> "noop",
      9L -> "insert"))
  }

  test("temperature resample quota flattens toward uniform and is capped") {
    // big source damped hard, small source kept nearly whole
    for ((n, expected) <- Seq(10000L -> 400L, 100L -> 40L, 9L -> 9L)) {
      val quota = math.min(n, math.floor(math.sqrt(n.toDouble) * 4).toLong)
      assert(quota == expected, s"n=$n")
      assert(quota <= n)
    }
  }

  test("repeated-span detection finds cross-doc 8-gram repeats only") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared tail1 only"),
      (2L, s"head2 $shared"),
      (3L, "totally different words that never repeat anywhere else ok"))
      .toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("th", tokenHashes(col("toks")))
      .select(col("doc_id"),
        explode_outer(shingleHashesOf(col("th"), 8)).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") > 1)
      .collect()
    // exactly one 8-gram (the shared span) occurs in two docs
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_docs") == 2L)
    assert(out.head.getAs[Long]("n_occ") == 2L)
  }

  test("percentile trim drops exactly the tail outliers") {
    val counts = ((1 to 98).map(_ => 50L) ++ Seq(1L, 100000L))
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tokens")
    val stats = counts.agg(
      expr("percentile(n_tokens, 0.01)").as("lo"),
      expr("percentile(n_tokens, 0.99)").as("hi"))
    val kept = counts.crossJoin(broadcast(stats))
      .filter(col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .count()
    assert(kept == 98L, "the two planted outliers must be trimmed")
  }
}
