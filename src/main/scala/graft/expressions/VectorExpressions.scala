package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot loop (SURVEY.md §4,
  * "custom needed #1"): a dot product over two numeric array columns as
  * ONE codegen'd primitive loop — no zipped intermediate array, no
  * lambda-variable boxing, stays inside whole-stage codegen.
  *
  * Semantics exactly match the composed form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc + x)`
  * with per-element Double casts: left-to-right accumulation in Double,
  * so results are bit-identical to [[graft.functions.VectorFunctions
  * .dotProduct]] and remain reproducible in the DuckDB oracle
  * (`list_inner_product` over DOUBLE[] folds the same way).
  *
  * Scale note: in the brute-force KNN inner loop this is the dominant
  * per-pair cost at any scale factor — (queries × corpus × dim)
  * multiply-adds. The codegen loop reads the parquet-decoded arrays
  * in place; on a 1000-executor cluster the same expression vectorizes
  * per partition with zero extra allocation per pair.
  *
  * Element null handling: inputs are embedding vectors (non-null
  * elements by construction); null ELEMENTS are treated as 0.0, while a
  * null ARRAY on either side yields null (standard BinaryExpression
  * null-intolerance). Arrays of different lengths fold over the shorter
  * prefix (embedding dims are fixed per table).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(e: Expression): Option[DataType] = e.dataType match {
      case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
      case _ => None
    }
    if (elem(left).isDefined && elem(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else lt match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = if (y.isNullAt(i)) 0.0 else rt match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
         |  double yv = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
         |  $acc += xv * yv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object VectorExpressions {
  /** Column wrapper: codegen'd dot product (Double accumulation). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatDotProduct(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b)))
}
