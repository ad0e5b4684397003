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
  * in [[graft.operators.DedupQueries]], not here.
  *
  * PERFORMANCE CONTRACT: functions suffixed `Of` take *materialized*
  * array columns (build them with `withColumn` first). Passing a raw
  * expression instead of an attribute would re-evaluate it inside every
  * lambda iteration — e.g. re-splitting the document once per shingle,
  * turning a linear scan into O(tokens²) per row. Catalyst's
  * CollapseProject keeps a multiply-referenced non-cheap alias in its
  * own projection, so the staged form evaluates each array exactly once.
  *
  * Hash choice: md5 (not Spark's murmur3 `hash`) because the driver's
  * correctness oracle re-computes these in DuckDB, and md5 is the one
  * cross-engine-stable hash both engines share. md5 is also the
  * expensive part, so it runs ONCE per token ([[tokenHashes]]); shingle
  * hashes are position-weighted window sums over the token hashes, and
  * the k MinHash components are cheap integer mixes (a_i*h + b_i) mod p
  * — pure 64-bit arithmetic, identical in any engine.
  */
object TextFunctions {

  /** Lowercase whitespace tokenization with Python `str.split()`
    * semantics: no empty tokens, ever. A plain split would emit ""
    * around leading/trailing whitespace (`trim` strips only spaces, not
    * tabs/newlines), so empties are filtered — which also makes empty /
    * whitespace-only text yield the empty array with no special guard. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles as space-joined strings, from a materialized
    * tokens column. Rows with fewer than n tokens yield an empty array. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", slice(toks, i, lit(n)))))

  /** Modulus of the hash-mix family: smallest prime > 2^32. */
  val MinhashP = 4294967311L

  private def md5Long(s: String, chars: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(chars), 16)
  }

  /** Deterministic (a, b) mix constants for MinHash component i, derived
    * from md5 hex so any engine can embed them as plain literals. `a` is
    * 29 bits (odd), `b` 32 bits, so a*h + b stays well under 2^63. */
  def minhashParams(i: Int): (Long, Long) =
    ((md5Long(s"minhash-a-$i", 7) << 1) | 1L, md5Long(s"minhash-b-$i", 8))

  /** Position weight for slot j of a shingle window (29 bits, odd). */
  def shingleWeight(j: Int): Long = (md5Long(s"shingle-w-$j", 7) << 1) | 1L

  /** Per-token 32-bit hashes from a materialized tokens column: ONE md5
    * per token — the only expensive hashing pass in the whole MinHash /
    * SimHash pipeline. 32 bits, NOT wider: the MinHash mixes multiply
    * these by 29-bit constants ((a*h + b) mod p stays under 2^63). */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast(LongType))

  /** Per-token 60-bit hashes (15 md5 hex chars) for the SimHash path:
    * the fingerprint can only carry as many useful bits as its input
    * hashes, and the standard near-dup configuration (64-bit simhash,
    * Hamming <= 3, 4 bands) needs a wide fingerprint so band values
    * don't cluster on shared vocabulary. 60 = the widest multiple of 4
    * that a signed 64-bit CAST accepts in every engine (16 hex chars
    * can exceed 2^63-1). NOT for the MinHash mixes — see
    * [[tokenHashes]]'s overflow bound. */
  def tokenHashesWide(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))

  /** Fused native tokenize+hash straight from RAW TEXT: one byte pass
    * (no regex split, no token array, no hex round-trip) — value-
    * identical to `tokenHashes(tokens(text))`
    * ([[graft.expressions.TokenHashes]], equivalence property-tested).
    * Use on every path where the token STRINGS aren't otherwise
    * needed: the whole MinHash/SimHash family qualifies. */
  def tokenHashesOfText(text: Column): Column =
    graft.expressions.TextExpressions.tokenHashesF(text, wide = false)

  /** [[tokenHashesOfText]], 60-bit variant — value-identical to
    * `tokenHashesWide(tokens(text))` (the SimHash input). */
  def tokenHashesWideOfText(text: Column): Column =
    graft.expressions.TextExpressions.tokenHashesF(text, wide = true)

  /** Numeric n-gram shingle hashes from a materialized token-hash
    * column: sh_i = (sum_j w_j * th_{i+j} mod p) mod p. Position weights
    * keep the window order-sensitive; per-term mod keeps every
    * intermediate below 2^62 (no 64-bit overflow in any engine). */
  def shingleHashesOf(th: Column, n: Int): Column = {
    val ws = (0 until n).map(shingleWeight)
    when(size(th) < n, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(1), size(th) - (n - 1)), i =>
        (0 until n).map(j => (element_at(th, i + j) * ws(j)) % MinhashP)
          .reduce(_ + _) % MinhashP))
  }

  /** One MinHash component over materialized shingle hashes: min over
    * shingles of (a_i * h + b_i) mod p. Null when the set is empty. */
  def minhashComponent(hashes: Column, i: Int): Column = {
    val (a, b) = minhashParams(i)
    array_min(transform(hashes, h => (h * a + b) % MinhashP))
  }

  /** k-component MinHash signature as array<long>, over a materialized
    * shingle-hash column. */
  def minhashSignature(hashes: Column, k: Int): Column =
    array((0 until k).map(i => minhashComponent(hashes, i)): _*)

  /** LSH band key: md5 over a contiguous slice of the signature.
    * Docs sharing any band key are near-dup candidates. */
  def lshBand(signature: Column, bandStart: Int, rowsPerBand: Int): Column =
    md5(concat_ws("|",
      transform(slice(signature, bandStart + 1, rowsPerBand),
        _.cast("string"))))

  /** SimHash fingerprint over `bits` bits (<= 32) from a materialized
    * token-hash column: fingerprint bit j is set iff the sum over tokens
    * of (2*bit_j(h) - 1) is positive. ONE pass over the hashes builds
    * all per-bit vote counters (an array accumulator), then the bits
    * fold into the fingerprint. Pure integer arithmetic. */
  def simhashOf(th: Column, bits: Int): Column =
    graft.expressions.TextExpressions.simHashF(th, bits)

  /** Hamming distance between two simhash fingerprints: native
    * popcount of the XOR (`bits` kept for API clarity; the fingerprints
    * only occupy the low `bits` anyway). */
  def hammingDistance(a: Column, b: Column, bits: Int): Column =
    bit_count(a.bitwiseXOR(b)).cast(LongType)

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text (the exact-dedup key). Single pass — safe on a raw column. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Whitespace token count (`len(str(x).split())`,
    * `/root/reference/llama-chatbot/main.py:211`). */
  def tokenCountOf(toks: Column): Column = size(toks).cast(LongType)

  /** BPE-ish subword token estimate: alphanumeric runs plus individual
    * punctuation characters, counted as matches (not a split, so empty /
    * whitespace-only text naturally counts 0). The pattern is RE2-safe
    * (no lookahead) so the DuckDB oracle can mirror it verbatim. */
  def subwordCount(text: Column): Column =
    graft.expressions.TextExpressions.subwordCountF(text)

  private val stopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** Stopword ratio in [0,1]: fraction of tokens that are stopwords. */
  def stopwordRatioOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, x => x.isInCollection(stopwords))).cast(DoubleType) /
        size(toks).cast(DoubleType))

  /** Mean token length in characters. */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType) /
        size(toks).cast(DoubleType))

  /** Punctuation character ratio over total characters. The numerator
    * is the native [[graft.expressions.PunctCount]] byte loop —
    * value-identical to the regex form
    * `length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))`
    * (the DuckDB oracle keeps that formulation) at a fraction of the
    * cost: the regex rebuild dominated the 500k-doc quality scan. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      graft.expressions.TextExpressions.punctCountF(text)
        .cast(DoubleType) / length(text).cast(DoubleType))

  /** Composite quality score in [0,1]: borrows the reference's
    * weighted-sum-then-clamp scoring pattern
    * (`/root/reference/llama-chatbot/main.py:195-215`) applied to
    * corpus-quality features with 0.6 (length) / 0.2 (stopword) /
    * 0.2 (punctuation) weights. */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val lengthScore = least(tokenCountOf(toks).cast(DoubleType) / 100.0, lit(1.0))
    val stopScore   = least(stopwordRatioOf(toks) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    least(lit(1.0), greatest(lit(0.0),
      lengthScore * 0.6 + stopScore * 0.2 + punctPenalty * 0.2))
  }

  /** Rolling-hash document fingerprint over token 4-grams: min over
    * positional shingles of md5 — a content-defined signature stable
    * under small edits far from the minimum. */
  def rollingFingerprintOf(toks: Column): Column =
    array_min(transform(shinglesOf(toks, 4), s => md5(s)))
}
