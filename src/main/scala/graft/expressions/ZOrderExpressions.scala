package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd two-column Morton (Z-order) interleave — the sort key of a
  * multi-dimensional clustered layout.
  *
  * Scale semantics: range-sorting a table by ONE column (the zone-map
  * layout, [[graft.layout.Layout.writeRangeSorted]]) gives min/max
  * row-group skipping on that column and NOTHING on any other — a
  * predicate on the second hot column still decodes every row group.
  * Sorting by the interleaved Z-value instead makes each file cover a
  * near-square tile of the 2-D (a, b) key space: with N files, each
  * file spans ~1/sqrt(N) of EACH column's range, so selective
  * predicates on EITHER column skip most row groups from footer stats
  * alone. That trade (perfect 1/N skipping on one axis → ~1/sqrt(N) on
  * both) is the standard warehouse answer to two-hot-column fact
  * tables — the technique behind Delta/Databricks `ZORDER BY` — and at
  * 100 TB it is the difference between a full scan and a few-percent
  * scan for whichever of the two predicates a query brings.
  *
  * Mechanics: each input is affinely scaled into a 16-bit grid cell
  * using the column's [min, max] (computed once by the caller — one
  * cheap agg over the table being laid out), then the two 16-bit words
  * are bit-interleaved into a 32-bit Z-value (a in the even bits, b in
  * the odd). Values outside [min, max] clamp to the grid edge, so
  * appending out-of-range rows degrades skipping gracefully instead of
  * failing. The scale step uses double arithmetic: exact monotonicity
  * within a 65535-cell grid is not required for layout quality, and
  * doubles cannot overflow where 64-bit integer scaling would (e.g.
  * timestamp-micros spans). The Z-value is layout-only — callers drop
  * it before writing, so it never reaches an answer and needs no
  * cross-engine oracle mirror.
  *
  * Null handling: standard null-intolerance (null in → null out);
  * layout callers coalesce or filter nulls first.
  */
case class ZOrderValue(left: Expression, right: Expression,
    aMin: Long, aMax: Long, bMin: Long, bMax: Long)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_value expects two bigint/int inputs, got ${l.simpleString}, ${r.simpleString}")
    }

  /** Spread the low 16 bits of `v` into the even bit positions of a
    * 32-bit word (the standard mask-shift Morton spread). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  private def cell(v: Long, min: Long, max: Long): Long =
    if (max <= min) 0L
    else {
      // subtract in DOUBLE, not long: a span wider than Long range
      // (min near Long.Min, max near Long.Max) would wrap (v - min)
      // and (max - min) and collapse every row into garbage tiles —
      // doubles lose low-bit precision there, which only blurs tile
      // edges, never corrupts them
      val c = ((v.toDouble - min.toDouble) /
        (max.toDouble - min.toDouble) * 65535.0).toLong
      if (c < 0L) 0L else if (c > 65535L) 65535L else c
    }

  def zval(a: Long, b: Long): Long =
    spread(cell(a, aMin, aMax)) | (spread(cell(b, bMin, bMax)) << 1)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a match { case i: Int => i.toLong; case l: Long => l }
    val bv = b match { case i: Int => i.toLong; case l: Long => l }
    zval(av, bv)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zorder", this,
      classOf[ZOrderValue].getName)
    defineCodeGen(ctx, ev,
      (a, b) => s"$ref.zval((long) $a, (long) $b)")
  }

  override def prettyName: String = "zorder_value"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrderValue =
    copy(left = newLeft, right = newRight)
}
