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

/** Squared L2 distance over two numeric array columns as ONE codegen'd
  * primitive loop — the [[FloatDotProduct]] treatment applied to the
  * OTHER vector hot loop (guide §4: the composed
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` is an
  * interpreted higher-order fold that allocates a zipped intermediate
  * array per pair — per (query × candidate) in the IVF-PQ coarse
  * stage, the exact re-rank, and every recall-vs-exact brute-force
  * branch).
  *
  * Bit-exactness contract (the ANN pins and PQ recall floors depend
  * on it): the composed form computes each element's `(x-y)*(x-y)` in
  * the ARRAY'S OWN element type — FLOAT subtract/multiply for
  * array<float> inputs — and only the accumulation is Double (the
  * fold's zero is `0.0d`, so each squared term casts to double as it
  * is added). This loop reproduces exactly that: float arithmetic per
  * element when BOTH sides are float, double otherwise, left-to-right
  * Double accumulation. Null elements are treated as 0.0 and length
  * mismatch folds the shorter prefix, per [[FloatDotProduct]]'s
  * embedding-vector contract (non-null, fixed dim by construction).
  */
case class FloatL2DistSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_dist_sq expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  private def bothFloat: Boolean =
    elemType(left) == FloatType && elemType(right) == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (bothFloat) {
      while (i < n) {
        val xv = if (x.isNullAt(i)) 0.0f else x.getFloat(i)
        val yv = if (y.isNullAt(i)) 0.0f else y.getFloat(i)
        val d = xv - yv
        acc += (d * d).toDouble
        i += 1
      }
    } else {
      val lt = elemType(left)
      val rt = elemType(right)
      while (i < n) {
        val xv = if (x.isNullAt(i)) 0.0 else lt match {
          case FloatType => x.getFloat(i).toDouble
          case _ => x.getDouble(i)
        }
        val yv = if (y.isNullAt(i)) 0.0 else rt match {
          case FloatType => y.getFloat(i).toDouble
          case _ => y.getDouble(i)
        }
        val d = xv - yv
        acc += d * d
        i += 1
      }
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
      val body =
        if (bothFloat)
          s"""float xv = $a.isNullAt($i) ? 0.0f : $a.getFloat($i);
             |  float yv = $b.isNullAt($i) ? 0.0f : $b.getFloat($i);
             |  float d = xv - yv;
             |  $acc += (double) (d * d);""".stripMargin
        else
          s"""double xv = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
             |  double yv = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
             |  double d = xv - yv;
             |  $acc += d * d;""".stripMargin
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $body
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_dist_sq"
}

/** Asymmetric-distance (ADC) lookup as ONE codegen'd loop: for a
  * PQ-coded row and a staged per-query distance-table column
  * (`dts`: m arrays of k subspace distances), sums
  * `dts[j][codes[j]]` over the m subspaces. Replaces the composed
  * `aggregate(sequence(0, m-1), 0.0, (acc, j) => acc +
  * element_at(element_at(dts, j+1), element_at(codes, j+1) + 1))`,
  * which allocated the sequence array and walked three interpreted
  * `element_at`s PER CANDIDATE — this is the per-candidate hot loop
  * of the IVF-PQ ADC stage ("stage 2 bounds arithmetic").
  *
  * Exactly `m` terms fold left-to-right in Double, like the composed
  * form. Codes are in range by construction in every PQ path (encode
  * emits 0..k-1 against length-k tables); if an invalid subscript or
  * null entry ever appears, the sum is NULL — never a wrong value
  * (the composed form would raise Spark 4's ANSI invalid-index error
  * instead; unreachable either way). */
case class AdcLookup(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_lookup expects (array<int>, array<array<double>>), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dts = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (j >= codes.numElements() || codes.isNullAt(j) ||
        j >= dts.numElements() || dts.isNullAt(j)) return null
      val cid = codes.getInt(j)
      val sub = dts.getArray(j)
      if (cid < 0 || cid >= sub.numElements() || sub.isNullAt(cid))
        return null
      acc += sub.getDouble(cid)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (codes, dts) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val cid = ctx.freshName("cid")
      val sub = ctx.freshName("sub")
      s"""
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $j = 0; $j < $m && !$bad; $j++) {
         |  if ($j >= $codes.numElements() || $codes.isNullAt($j) ||
         |      $j >= $dts.numElements() || $dts.isNullAt($j)) {
         |    $bad = true;
         |  } else {
         |    int $cid = $codes.getInt($j);
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub =
         |      $dts.getArray($j);
         |    if ($cid < 0 || $cid >= $sub.numElements() ||
         |        $sub.isNullAt($cid)) {
         |      $bad = true;
         |    } else {
         |      $acc += $sub.getDouble($cid);
         |    }
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_lookup"
}

object VectorExpressions {
  /** Column wrapper: codegen'd dot product (Double accumulation). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatDotProduct(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b)))

  /** Column wrapper: codegen'd squared L2 distance (Double
    * accumulation; float per-element arithmetic on float inputs —
    * bit-identical to the composed fold it replaces). */
  def l2sqF(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatL2DistSq(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b)))

  /** Column wrapper: codegen'd ADC table-lookup sum over m subspaces. */
  def adcF(codes: Column, dts: Column, m: Int): Column =
    GraftSqlBridge.column(
      AdcLookup(GraftSqlBridge.expression(codes),
        GraftSqlBridge.expression(dts), m))
}
