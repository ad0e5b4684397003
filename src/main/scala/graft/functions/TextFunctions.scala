package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (tokenize, shingle, MinHash, SimHash, fingerprint, quality scores).
  *
  * The reference's only text ops are whitespace splits and word counts
  * (`/root/reference/llama-chatbot/main.py:211-212`,
  * `/root/reference/llama-chatbot/eval.py:16-30`); the dedup/fingerprint
  * family generalizes them for corpus-scale pipelines. Everything here is
  * a pure Column expression (no UDFs): per-row, codegen-friendly, and
  * shuffle-free — the expensive parts of dedup (the candidate join) live
  * in [[graft.operators.Dedup]], not here.
  *
  * Hash choice: md5 (not Spark's murmur3 `hash`) because the driver's
  * correctness oracle re-computes these in DuckDB, and md5 is the one
  * cross-engine-stable hash both engines share. Min-hash signatures
  * therefore take the MIN over hex *strings* — lexicographic min over a
  * uniform hash is exactly as valid as numeric min, and avoids any
  * hex->int conversion disagreements.
  */
object TextFunctions {

  /** Lowercase whitespace tokenization; "" -> empty array. */
  def tokens(text: Column): Column = {
    val t = split(lower(trim(text)), "\\s+")
    when(length(trim(text)) === 0, array().cast("array<string>")).otherwise(t)
  }

  /** Word n-gram shingles as space-joined strings. Docs with fewer than
    * n tokens yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(t) - (n - 1)), i =>
        concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** One MinHash component: min over shingles of md5(shingle # seed).
    * Null when the shingle set is empty. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(s, lit("#" + seed)))))

  /** k-component MinHash signature as array<string>. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = shingles(text, n)
    array((0 until k).map(i => minhash(sh, i)): _*)
  }

  /** LSH band key: md5 over a contiguous slice of the signature.
    * Docs sharing any band key are near-dup candidates. */
  def lshBand(signature: Column, bandStart: Int, rowsPerBand: Int): Column =
    md5(concat_ws("|", slice(signature, bandStart + 1, rowsPerBand)))

  /** SimHash fingerprint over `bits` bits (<= 32).
    *
    * bit_j(token) = bit j of the first 8 hex chars of md5(token);
    * fingerprint bit j is set iff sum over tokens of (2*bit_j - 1) > 0.
    * Pure integer arithmetic -> cross-engine reproducible.
    */
  def simhash(text: Column, bits: Int): Column = {
    require(bits <= 32, "simhash supports at most 32 bits")
    val hashes = transform(tokens(text), t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast(LongType))
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      abs(shiftright(a, j) % 2 - shiftright(b, j) % 2)
    }.reduce(_ + _)

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text (the exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Whitespace token count (`len(str(x).split())`,
    * `/root/reference/llama-chatbot/main.py:211`). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword token estimate: alphanumeric runs plus individual
    * punctuation characters, counted as matches (not a split, so empty /
    * whitespace-only text naturally counts 0). The pattern is RE2-safe
    * (no lookahead) so the DuckDB oracle can mirror it verbatim. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"),
      lit(0))).cast(LongType)

  private val stopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** Stopword ratio in [0,1]: fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, x => x.isInCollection(stopwords))).cast(DoubleType) /
        size(t).cast(DoubleType))
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType) /
        size(t).cast(DoubleType))
  }

  /** Punctuation character ratio over total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
        .cast(DoubleType) / length(text).cast(DoubleType))

  /** Composite quality score in [0,1]: borrows the reference's
    * weighted-sum-then-clamp scoring pattern
    * (`/root/reference/llama-chatbot/main.py:195-215`) applied to
    * corpus-quality features with 0.6 (length) / 0.2 (stopword) /
    * 0.2 (punctuation) weights. */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(tokenCount(text).cast(DoubleType) / 100.0, lit(1.0))
    val stopScore   = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    least(lit(1.0), greatest(lit(0.0),
      lengthScore * 0.6 + stopScore * 0.2 + punctPenalty * 0.2))
  }

  /** Rolling-hash document fingerprint over token 4-grams: min over
    * positional shingles of md5 — a content-defined signature stable
    * under small edits far from the minimum. */
  def rollingFingerprint(text: Column): Column =
    array_min(transform(shingles(text, 4), s => md5(s)))
}
