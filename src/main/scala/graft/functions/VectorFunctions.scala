package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector similarity primitives over `ArrayType(FloatType|DoubleType)`
  * columns.
  *
  * The reference delegates all vector math to Pinecone (cosine-metric
  * index, `/root/reference/consumer/consumer.py:58-67`) and pgvector
  * (`/root/reference/chatbot_pg/main.py:30-41`). Here the same semantics
  * are pure Catalyst column expressions built from higher-order functions
  * (`zip_with` + `aggregate`), so they stay inside whole-stage codegen,
  * need no UDF serialization, and distribute trivially: a cosine score is
  * a per-row scalar — no shuffle, no state.
  *
  * All arithmetic is forced to Double (left-to-right fold) so results are
  * reproducible across engines — the DuckDB oracle mirrors the same
  * fold order via `list_inner_product(CAST(... AS DOUBLE[]), ...)`.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> element-wise. */
  def asDouble(a: Column): Column = transform(a, _.cast(DoubleType))

  /** Dot product of two float/double array columns: the native codegen
    * expression ([[graft.expressions.FloatDotProduct]]) — one primitive
    * loop, no zipped intermediate array. Bit-identical to the composed
    * `aggregate(zip_with(...))` Double fold it replaced. */
  def dotProduct(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotF(a, b)

  /** The composed-builtins dot product (kept as the reference
    * implementation; [[dotProduct]] is the fast path). */
  def dotProductComposed(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dotProduct(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(d / (na * nb))
  }

  /** Squared Euclidean distance: the native codegen expression
    * ([[graft.expressions.FloatL2DistSq]]) over double-cast inputs —
    * bit-identical to the composed `aggregate(zip_with(...))` Double
    * fold it replaced (the cast-first shape forces DOUBLE per-element
    * arithmetic like the composed form's `asDouble`; the cast here is
    * the codegen'd column Cast, not the interpreted `transform`). */
  def l2DistanceSq(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.l2sqF(
      a.cast("array<double>"), b.cast("array<double>"))

  /** The composed-builtins squared L2 (kept as the reference
    * implementation; [[l2DistanceSq]] is the fast path). */
  def l2DistanceSqComposed(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic text -> fixed-dim float vector (embedding stand-in).
    *
    * Replaces the reference's OpenAI/MiniLM embedding calls
    * (`/root/reference/consumer/consumer.py:33,61`,
    * `/root/reference/chatbot_pg/main.py:30`) with a hashing-TF
    * featurizer: token -> md5 -> bucket in [0, dim), counts
    * L2-normalized. Pure column expressions — deterministic, codegen'd,
    * and reproducible in any engine with md5.
    */
  def featurize(text: Column, dim: Int): Column = {
    // TextFunctions.tokens guards empty/whitespace text -> empty array ->
    // all-zero vector, which cosine() maps to null (not a spurious unit
    // vector from md5("")).
    val toks = TextFunctions.tokens(text)
    // bucket(token) = first 8 hex chars of md5 as int, mod dim — md5
    // runs ONCE per token; counts built in ONE aggregate pass over the
    // bucket array (no per-bucket rescans).
    val buckets = bucketsOf(toks, dim)
    val counts = countsOf(buckets, dim)
    val norm = sqrt(aggregate(counts, lit(0.0), (acc, x) => acc + x * x))
    when(norm === 0.0, counts)
      .otherwise(transform(counts, x => x / norm))
  }

  private def bucketsOf(toks: Column, dim: Int): Column =
    transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long") % dim)

  private def countsOf(buckets: Column, dim: Int): Column =
    aggregate(buckets, array_repeat(lit(0.0), dim), (acc, b) =>
      transform(acc, (x, i) => when(i.cast("long") === b, x + 1.0)
        .otherwise(x)))

  /** Staged [[featurize]] for wide scans: each intermediate (tokens,
    * buckets, counts, norm) is a materialized column, so every pass runs
    * exactly once per row regardless of how many expressions consume it
    * (the Column form re-evaluates `counts` for the norm and the
    * normalize branches). Drops its scratch columns before returning. */
  def featurizeInto(df: DataFrame, textCol: String, outCol: String,
      dim: Int): DataFrame =
    df.withColumn("__ftoks", TextFunctions.tokens(col(textCol)))
      .withColumn("__fbuckets", bucketsOf(col("__ftoks"), dim))
      .withColumn("__fcounts", countsOf(col("__fbuckets"), dim))
      .withColumn("__fnorm",
        sqrt(aggregate(col("__fcounts"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(outCol,
        when(col("__fnorm") === 0.0, col("__fcounts"))
          .otherwise(transform(col("__fcounts"), x => x / col("__fnorm"))))
      .drop("__ftoks", "__fbuckets", "__fcounts", "__fnorm")

  /** Stage per-vector int8 affine quantization columns onto `df`:
    * `evCol` (array<double>) -> `mn`, `mx`, `scale`, `qv` (codes
    * 0..255 by round-to-nearest; constant vectors quantize to 0).
    * Each stage is a separate withColumn so the min/max/scale are
    * computed once per ROW, never re-evaluated inside the transform
    * lambda. Shared by q70 and the error-bound property test, so the
    * tested math IS the shipped math. */
  def withInt8Quantization(df: DataFrame, evCol: String = "ev"): DataFrame =
    df.withColumn("mn", array_min(col(evCol)))
      .withColumn("mx", array_max(col(evCol)))
      .withColumn("scale", (col("mx") - col("mn")) / 255.0)
      .withColumn("qv", transform(col(evCol), x =>
        when(col("scale") === 0.0, lit(0L))
          .otherwise(round((x - col("mn")) / col("scale")).cast("long"))))
}
