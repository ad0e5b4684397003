package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * big-side half of a runtime row-level join filter (the technique the
  * reference gets for free from its warehouse's join pruning; here it
  * is explicit so callers control WHERE the cut happens).
  *
  * Scale semantics: a selective equi-join ships every big-side row to
  * the shuffle before the join can drop it. Probing a Bloom filter of
  * the small side's keys INSIDE the big side's scan stage drops
  * non-joining rows before they are ever serialized — at 100 TB, a
  * 1%-selective dim cut turns a 100 TB shuffle into ~1 TB plus an
  * `fpp`-bounded false-positive tail. The probe is pure compute inside
  * whole-stage codegen (no per-row allocation; the filter deserializes
  * once per task via the plan's reference array), and the exact join
  * that follows removes the false positives, so composed results are
  * EXACTLY the plain join's (which is what the q113 oracle checks).
  *
  * May-contain contract: never a false negative (a true join row is
  * never dropped), false positives at rate <= fpp pass through to the
  * exact join. Mirrors the put-side convention of
  * `Dataset.stat.bloomFilter` (integral keys put as long, strings as
  * UTF-8 bytes); a null key yields null (standard null-intolerance),
  * matching equi-join semantics where null never joins.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint/int/string input, got ${t.simpleString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContainLong(v: Long): Boolean = bloom.mightContainLong(v)
  def mightContainUtf8(s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => mightContainLong(v.asInstanceOf[Long])
    case IntegerType => mightContainLong(v.asInstanceOf[Int].toLong)
    case StringType => mightContainUtf8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainUtf8($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
    }
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
