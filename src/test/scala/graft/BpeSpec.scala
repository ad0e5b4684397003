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

  /** A deterministic messy corpus: overlapping runs (aaaa), fused-
    * symbol collisions (ab next to existing 'ab'-ish words), ties, and
    * an astral char — the cases where the driver-local loop could
    * diverge from the per-round distributed reference. */
  private def messyCorpus = {
    val words = Seq.fill(7)("aaaa") ++ Seq.fill(5)("abab") ++
      Seq.fill(5)("aab") ++ Seq.fill(4)("banana") ++
      Seq.fill(3)("bandana") ++ Seq.fill(3)("🙂ab🙂ab") ++
      Seq.fill(2)("tie1") ++ Seq.fill(2)("tie2") ++ Seq("zqx")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("driver-local loop ≡ per-round distributed reference, to exhaustion") {
    // k beyond exhaustion on both fixtures: every rank, pair, and
    // count must agree, including the stopping point
    val kBig = 64
    assert(Bpe.train(corpus, kBig) == Bpe.trainIterative(corpus, kBig))
    assert(Bpe.train(messyCorpus, kBig) ==
      Bpe.trainIterative(messyCorpus, kBig))
  }

  test("segmentCorpus (vocab-join encode) ≡ segment (column folds)") {
    import spark.implicits._
    val merges = Bpe.train(messyCorpus, 16)
    val words = Seq(("aaaa", 1L), ("abab", 2L), ("banana", 3L),
      ("🙂ab🙂ab", 1L), ("unseen", 1L), ("zqx", 1L))
      .toDF("word", "freq")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaFolds = collect(Bpe.segment(words, merges))
    val viaJoin = collect(Bpe.segmentCorpus(words, merges))
    assert(viaJoin === viaFolds)
    // non-word columns survive the join
    assert(Bpe.segmentCorpus(words, merges).columns.toSet ===
      Set("word", "freq", "syms"))
    // applyMerges is the same fold, driver-side
    words.collect().map(_.getString(0)).foreach { w =>
      assert(Bpe.applyMerges(w, merges) === viaFolds(w), s"word $w")
    }
  }

  test("segmentCorpus passes null-word rows through with null syms") {
    import spark.implicits._
    val merges = Bpe.train(corpus, 4)
    val words = Seq((Some("newest"), 1L), (None: Option[String], 7L))
      .toDF("word", "freq")
    val rows = Bpe.segmentCorpus(words, merges)
      .select("word", "freq", "syms").collect()
    assert(rows.length == 2)
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 7L && nullRow.isNullAt(2))
    assert(rows.find(!_.isNullAt(0)).get.getSeq[String](2) ==
      Seq("n", "e", "w", "est"))
  }

  test("trainOnVocab fails loudly above the driver-collect cap") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, 4, maxVocab = 2L)
    }
    assert(e.getMessage.contains("minFreq"),
      s"cap failure must name the minFreq remedy: ${e.getMessage}")
    // at the default cap the same corpus trains fine
    assert(Bpe.train(docs, 4).nonEmpty)
  }

  test("segmentCorpus carries a 256-merge table where column folds cannot") {
    import spark.implicits._
    val words = (0 until 400).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"seg$i".getBytes("UTF-8"))
      md.map(b => ('a' + ((b & 0xff) % 16)).toChar).mkString
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 256)
    assert(merges.length == 256)
    val seg = Bpe.segmentCorpus(
      words.distinct.map(w => (w, 1L)).toDF("word", "freq"), merges)
    // every word round-trips: concatenated subwords rebuild the word
    val bad = seg.collect().filter(r =>
      r.getSeq[String](r.fieldIndex("syms")).mkString != r.getString(0))
    assert(bad.isEmpty, s"${bad.length} words did not round-trip")
  }

  test("minFreq drops sub-threshold words before training") {
    import spark.implicits._
    // "rare" appears once; at minFreq=2 training must behave exactly
    // as if the word never existed (its pair contributions vanish)
    val words = Seq.fill(5)("low") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest") ++ Seq("rareqz")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val without = Seq.fill(5)("low") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest")
    val docsWithout = Seq((1L, without.mkString(" ")))
      .toDF("doc_id", "text")
    assert(Bpe.train(docs, 8, minFreq = 2L) ==
      Bpe.train(docsWithout, 8))
    // default is exact: run to exhaustion and the rare word's
    // singleton pairs surface in the table
    assert(Bpe.train(docs, 64) != Bpe.train(docsWithout, 64))
  }

  test("training k=256 merges costs ~one Spark job, not 2 per merge") {
    // 400 distinct deterministic words -> far more than 256 available
    // merges (singleton pairs still merge)
    val words = (0 until 400).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bpe$i".getBytes("UTF-8"))
      md.map(b => ('a' + ((b & 0xff) % 16)).toChar).mkString
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
    val merges = Bpe.train(docs, 256)
    assert(merges.length == 256)
    // listener-backed status store is async; poll until stable
    def jobsNow = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).length
    var last = -1; var cur = jobsNow; var spins = 0
    while (cur != last && spins < 40) {
      last = cur; Thread.sleep(100); cur = jobsNow; spins += 1
    }
    val ran = cur - before.length
    assert(ran <= 20,
      s"train(k=256) ran $ran Spark jobs — the merge loop must not " +
        "schedule per-merge jobs")
  }
}
