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

  test("scored postings: tf sums to dl per doc; ranked search matches a from-text recompute") {
    val tmp = Files.createTempDirectory("graft-invidx3").toString
    val docs = Tables.documents(spark, d)
    InvertedIndex.buildScored(docs, s"$tmp/scored", 8)
    val p = spark.read.parquet(s"$tmp/scored")
    // per-doc term frequencies are a partition of the doc's tokens
    val bad = p.groupBy("doc_id", "dl").agg(sum("tf").as("tfsum"))
      .filter(col("tfsum") =!= col("dl")).count()
    assert(bad == 0)
    // _stats carries exact corpus integers and the main read skips it
    val st = spark.read.parquet(s"$tmp/scored/_stats").head()
    assert(st.getLong(0) == docs.count() &&
      st.getLong(1) == p.groupBy("doc_id", "dl").count()
        .agg(sum("dl")).head().getLong(0))
    assert(!p.columns.contains("n_docs"))

    // ranked search == the same BM25 formula recomputed straight from
    // the text (the index must never change the ranking)
    val terms = Seq("dup", "vector")
    val got = InvertedIndex.rankedSearch(spark, s"$tmp/scored", terms, 15)
      .as[(Long, Double)].collect().toSeq
    val toked = docs
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .withColumn("dl", size(col("toks")).cast("long"))
    val n = toked.count()
    val tot = toked.agg(sum("dl")).head().getLong(0)
    val perTerm = terms.map { t =>
      toked.select(col("doc_id"), col("dl"),
        size(filter(col("toks"), x => x === t)).cast("long").as("tf"))
        .filter(col("tf") > 0)
    }
    val want = perTerm.map { tp =>
        val df = tp.count()
        tp.withColumn("sc",
          ((lit(n) - lit(df) + lit(0.5)) / (lit(df) + lit(0.5))) *
            ((col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) * (lit(0.25) +
                lit(0.75) * (col("dl") * lit(n) / lit(tot))))))
          .select("doc_id", "sc")
      }.reduce(_ unionByName _)
      .groupBy("doc_id").agg(round(sum("sc"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(15)
      .as[(Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // the scores genuinely discriminate (not a constant column)
    assert(got.head._2 > got.last._2)
  }

  test("recluster preserves the _stats side file of a scored table") {
    val tmp = Files.createTempDirectory("graft-invidx4").toString
    val docs = Tables.documents(spark, d)
    InvertedIndex.buildScored(docs, s"$tmp/scored", 8)
    val before = spark.read.parquet(s"$tmp/scored/_stats").head()
    val rankedBefore = InvertedIndex
      .rankedSearch(spark, s"$tmp/scored", Seq("dup", "vector"), 15)
      .as[(Long, Double)].collect().toSeq
    InvertedIndex.recluster(spark, s"$tmp/scored", 4)
    val after = spark.read.parquet(s"$tmp/scored/_stats").head()
    assert(before.getLong(0) == after.getLong(0) &&
      before.getLong(1) == after.getLong(1))
    assert(new java.io.File(s"$tmp/scored").listFiles()
      .count(_.getName.endsWith(".parquet")) === 4)
    // ranking identical across the swap
    assert(InvertedIndex
      .rankedSearch(spark, s"$tmp/scored", Seq("dup", "vector"), 15)
      .as[(Long, Double)].collect().toSeq == rankedBefore)
  }

  test("phrase search: positional adjacency, not co-occurrence; parity with a text scan") {
    val tmp = Files.createTempDirectory("graft-invidx5").toString
    // doc 1 has the exact phrase; doc 2 has the words out of order;
    // doc 3 has them non-adjacent; doc 4 repeats a term (start
    // positions must line up per-occurrence, not per-term)
    val docs = Seq(
      (1L, "x alpha beta gamma y"),
      (2L, "gamma beta alpha"),
      (3L, "alpha x beta y gamma"),
      (4L, "alpha alpha beta gamma"),
      (5L, "alpha beta"))
      .toDF("doc_id", "text")
    InvertedIndex.buildPositional(docs, s"$tmp/p", 2)
    def hits(phrase: Seq[String]) =
      InvertedIndex.phraseSearch(spark, s"$tmp/p", docs, phrase)
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(hits(Seq("alpha", "beta", "gamma")) == Seq(1L, 4L))
    assert(hits(Seq("beta", "alpha")) == Seq(2L))
    assert(hits(Seq("alpha", "alpha")) == Seq(4L))
    assert(hits(Seq("alpha")) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(hits(Seq("alpha", "zzz")).isEmpty)

    // corpus parity: index phrase hits == padded-string containment
    // scan (the oracle's formulation) on real documents
    val d01 = Tables.documents(spark, d)
    InvertedIndex.buildPositional(d01, s"$tmp/real", 4)
    val phrase = Seq("big", "order", "scan")
    val got = InvertedIndex.phraseSearch(spark, s"$tmp/real", d01, phrase)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = d01.withColumn("joined",
        concat(lit(" "), concat_ws(" ",
          graft.functions.TextFunctions.tokens(col("text"))), lit(" ")))
      .filter(col("joined").contains(" " + phrase.mkString(" ") + " "))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
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
    // a caller-repeated term must not inflate the required match
    // count (isin can only match each posting row once)
    assert(InvertedIndex.matchingIds(spark, s"$tmp/p",
      Seq("alpha", "alpha")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      InvertedIndex.matchingIds(spark, s"$tmp/p", Nil)
    }
  }
}
