package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer: the classic word-frequency fixture must learn the
  * known merge sequence, deterministically; segmentation must apply
  * the merges greedily left-to-right. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The Sennrich-style fixture: low x5, lower x2, newest x6,
    * widest x3 — (e,s) with weight 9 merges first, then (es,t) 9. */
  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("learns the classic merge sequence with deterministic ties") {
    val merges = Bpe.train(corpus, 4)
    assert(merges.map(m => (m.left, m.right, m.count)).take(2) == Seq(
      ("e", "s", 9L), ("es", "t", 9L)))
    // rank 2: est+end? No end-marker in this formulation — remaining
    // top pairs all weigh 9 ("w","est" from newest+... no: newest =
    // n,e,w,est / widest = w,i,d,est; "lo" appears 7x (low 5 + lower
    // 2). Candidates at 9: none — (w,est) is 6, (d,est) 3; so rank 2
    // is ("l","o") at 7, then ("lo","w") at 7.
    assert(merges(2).left == "l" && merges(2).right == "o"
      && merges(2).count == 7L)
    assert(merges(3).left == "lo" && merges(3).right == "w"
      && merges(3).count == 7L)
    // determinism: retraining yields the identical table
    assert(Bpe.train(corpus, 4) == merges)
  }

  test("segment applies merges greedily, re-fusable across rounds") {
    val merges = Bpe.train(corpus, 4)
    val seg = Bpe.segment(
      Seq(("newest", 1L), ("low", 1L), ("slowest", 1L))
        .toDF("word", "freq"), merges)
      .select(col("word"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("newest") == Seq("n", "e", "w", "est"))
    assert(seg("low") == Seq("low"))
    // unseen word: known merges apply where present, rest stays chars
    assert(seg("slowest") == Seq("s", "low", "est"))
  }

  test("symbols are codepoints: astral chars never split into surrogates") {
    val seg = Bpe.segment(Seq(("a🙂b", 1L)).toDF("word", "freq"), Seq())
      .select("syms").collect()(0).getSeq[String](0)
    assert(seg == Seq("a", "🙂", "b"))
  }

  test("merge handles overlapping pairs left-to-right (aaa -> aa,a)") {
    val merges = Seq(Bpe.Merge(0, "a", "a", 0L))
    val seg = Bpe.segment(Seq(("aaa", 1L)).toDF("word", "freq"), merges)
      .select("syms").collect()(0).getSeq[String](0)
    assert(seg == Seq("aa", "a"))
  }
}
