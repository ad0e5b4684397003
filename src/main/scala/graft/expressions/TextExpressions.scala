package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the SimHash hot loop: per-bit sign
  * votes over a token-hash array folded into a `bits`-wide fingerprint,
  * as ONE codegen'd primitive double loop.
  *
  * Semantics exactly match the HOF formulation it replaces (one
  * `aggregate` per bit of `acc + ((h >> j) & 1) * 2 - 1`, bit j set iff
  * its vote sum is positive) and the DuckDB oracle mirror
  * (`list_sum(list_transform(hs, h -> ((h >> j) % 2) * 2 - 1)) > 0`) —
  * pure integer arithmetic, so bit-identical across engines. The HOF
  * version evaluates interpreted (higher-order functions are
  * CodegenFallback) with per-element boxing: on a 5k-doc corpus the
  * swap cut fingerprinting from seconds to tens of milliseconds.
  *
  * Null elements count as hash 0 (a -1 vote on every bit); token-hash
  * arrays never contain nulls by construction. A null array yields
  * null (UnaryExpression null-intolerance).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 32, "simhash supports 1..32 bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"simhash expects array<bigint> input, got ${t.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $a.numElements();
         |long[] $votes = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $votes[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |long $sh = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $sh |= 1L << $j;
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "simhash"
}

object TextExpressions {
  /** Column wrapper: codegen'd SimHash fingerprint over token hashes. */
  def simHashF(th: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHash(GraftSqlBridge.expression(th), bits))
}
