package graft

import graft.functions.TextFunctions
import graft.layout.Layout
import graft.text.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The inverted index is a layout artifact, so it gets the layout
  * family's evidence standard: exact parity with the scan it replaces
  * (an index must never change the answer), plus plan pins that the
  * index path actually avoids the corpus text read it exists to avoid.
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def brute(terms: Seq[String]) = {
    val docs = Tables.documents(spark, d)
      .withColumn("toks", TextFunctions.tokens(col("text")))
    terms.foldLeft(docs)((df, t) =>
        df.filter(array_contains(col("toks"), t)))
      .select("doc_id")
  }

  test("index search returns exactly the text-scan answer (1 term and 2 terms)") {
    val tmp = Files.createTempDirectory("graft-invidx").toString
    val docs = Tables.documents(spark, d)
    InvertedIndex.build(docs, s"$tmp/postings", 8)
    for (terms <- Seq(Seq("dup"), Seq("dup", "vector"), Seq("query"))) {
      val got = InvertedIndex.search(spark, s"$tmp/postings", docs, terms)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val want = brute(terms).as[Long].collect().sorted.toSeq
      assert(got == want && want.nonEmpty, s"terms=$terms")
    }
    // a term not in the corpus matches nothing (and doesn't error)
    assert(InvertedIndex.search(spark, s"$tmp/postings", docs,
      Seq("zzz-not-a-term")).count() == 0)
  }

  test("q122's plan pushes the term predicate and never reads the text column") {
    val q = graft.operators.LayoutQueries.all
      .find(_.name == "q122_inverted_keyword_search").get
    val df = q.run(spark, d)
    val filters = Layout.scanFilters(df)
    assert(filters.contains("PushedFilters") && filters.contains("term"),
      filters)
    // column pruning: neither scan in the index path decodes `text` —
    // the whole point of the index at corpus scale
    val plan = df.queryExecution.executedPlan.toString
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!reads.contains("text"), reads)
    // and the answer is the brute-force scan's
    assert(df.select("doc_id").as[Long].collect().toSeq ==
      brute(Seq("dup", "vector")).as[Long].collect().sorted.toSeq)
  }

  test("postings are one row per (term, doc) and matchingIds intersects correctly") {
    val tmp = Files.createTempDirectory("graft-invidx2").toString
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "alpha gamma beta"))
      .toDF("doc_id", "text")
    InvertedIndex.build(docs, s"$tmp/p", 2)
    val p = spark.read.parquet(s"$tmp/p")
    // term frequency never inflates the posting list
    assert(p.count() == p.distinct().count() && p.count() == 7)
    assert(InvertedIndex.matchingIds(spark, s"$tmp/p",
      Seq("alpha", "beta")).as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      InvertedIndex.matchingIds(spark, s"$tmp/p", Nil)
    }
  }
}
