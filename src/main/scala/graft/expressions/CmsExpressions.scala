package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd frequency probe against a pre-built Count-Min sketch —
  * the candidate gate of the two-pass exact heavy-hitter
  * ([[graft.text.HeavyHitters]]).
  *
  * Scale semantics: an exact `GROUP BY ngram HAVING count >= T` over a
  * shingled corpus shuffles (nearly) every distinct n-gram, because
  * map-side partial aggregation compresses nothing when keys are
  * mostly unique — at 100 TB that long tail IS the shuffle. A
  * Count-Min sketch of the n-gram stream is a fixed-size mergeable
  * aggregate (counters sum; order- and partition-independent); probing
  * it inside the scan stage drops every n-gram whose estimate is
  * already below the threshold BEFORE it is shuffled, leaving only the
  * candidates (true heavy hitters + an eps-bounded overcount tail) for
  * the exact count.
  *
  * One-sided-error contract: CMS estimates NEVER undercount
  * (`estimate >= true count`, always), so a true heavy hitter can
  * never be gated out — the candidate set is a strict superset and the
  * exact pass-2 count makes the final answer EXACT, which is what the
  * q123 oracle checks. Overcounts (hash collisions in the sketch, or
  * two keys sharing the probed 64-bit hash) only let extra candidates
  * through to die in the exact count. Probes take the pre-hashed
  * 64-bit key (the same `xxhash64` both build and probe use), so the
  * sketch's item representation is identical on both sides by
  * construction. Null key yields null (standard null-intolerance).
  */
case class CmsAtLeast(child: Expression, cmsBytes: Array[Byte],
    threshold: Long) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_at_least expects a bigint key (pre-hash the item), got ${t.simpleString}")
  }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  def atLeast(v: Long): Boolean = cms.estimateCount(v) >= threshold

  override protected def nullSafeEval(v: Any): Any =
    atLeast(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsAtLeast].getName)
    defineCodeGen(ctx, ev, c => s"$ref.atLeast((long) $c)")
  }

  override def prettyName: String = "cms_at_least"

  override protected def withNewChildInternal(
      newChild: Expression): CmsAtLeast = copy(child = newChild)
}
