package graft.plans

import graft.sinks.ManifestTable
import graft.sources.ManifestFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregates over `graft-manifest` tables: a
  * whole-table, filterless `COUNT(*)` / `MIN(col)` / `MAX(col)`
  * aggregate is answered from the MANIFEST — the per-dir exact row
  * counts and min/max stats recorded at commit time — and rewritten
  * into a [[LocalRelation]], so the query plans as a LocalTableScan
  * touching ZERO data files. This is the Iceberg/Delta
  * metadata-only-query shape (Spark's own `OptimizeMetadataOnlyQuery`
  * does it for partition columns): at 100 TB, `SELECT COUNT(*)` is a
  * table health check an operator runs constantly — it must cost one
  * manifest read, not a full scan. The reference's users get the same
  * from Snowflake's metadata layer for free; this rule is that layer.
  *
  * Soundness gates — the rule REWRITES only when the metadata answer
  * is provably the scan answer, otherwise it stands down and the plan
  * scans as before (fallback is always correct, never the rule):
  *
  *  - grouping must be empty and every aggregate must be a
  *    non-distinct, unfiltered, Complete COUNT(non-null literal) /
  *    MIN(bare column) / MAX(bare column) — any other expression
  *    (count(col) skips nulls the metadata can't see, a cast could
  *    change type semantics) disqualifies the whole aggregate;
  *  - nothing but attribute-pruning Projects may sit between the
  *    Aggregate and the relation — a Filter means the count is no
  *    longer the table's (this rule runs Pre-CBO, after pushdown
  *    shapes settle, so a residual Filter is visible right here);
  *  - COUNT needs EVERY entry's exact `rows` (a pre-upgrade entry
  *    without a recorded count disables it — the next rewrite of that
  *    dir modernizes it);
  *  - MIN/MAX on an integral column needs the recorded long bound on
  *    every entry that can hold rows (an entry with `rows = 0`
  *    contributes nothing and needs nothing). A dir whose stats are
  *    absent — never statted, or ALL-NULL in that column (statsOf
  *    records nothing then, indistinguishable here) — disqualifies:
  *    conservative, since recorded bounds ignore nulls exactly like
  *    SQL MIN/MAX, but absence can't prove which case it is;
  *  - MIN/MAX on a string column combines the recorded per-dir bounds
  *    in [[UTF8String]] BINARY order — the ordering Spark's own
  *    Min/Max on default-collation strings uses, so the driver-side
  *    fold is bit-exact with the scan for ANY string (the ASCII guard
  *    that range-compare pruning needs does not apply to an exact
  *    fold in the same order). Non-default collations never match the
  *    [[StringType]] singleton and fall through.
  *
  * The entries come from the relation's [[ManifestFileIndex]], which
  * pins its snapshot at construction — the metadata answer and the
  * scan it replaces describe the same immutable version by
  * construction. */
object ManifestMetadataAggs extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: Aggregate if a.groupingExpressions.isEmpty =>
      rewrite(a).getOrElse(a)
  }

  /** The ManifestFileIndex under `p`, provided nothing but
    * attribute-only Projects sits in between. */
  private def indexOf(p: LogicalPlan): Option[ManifestFileIndex] =
    p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestFileIndex => Some(m)
          case _ => None
        }
        case _ => None
      }
      case pr: Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        indexOf(pr.child)
      case _ => None
    }

  /** Some(LocalRelation) iff EVERY output aggregate is answerable
    * from the manifest. Inside, Some(null) means "the answer is SQL
    * NULL" (min of an empty table); None means "not answerable". */
  private def rewrite(a: Aggregate): Option[LogicalPlan] =
    indexOf(a.child).flatMap { idx =>
      val entries = idx.snapshotEntries
      lazy val total: Option[Any] =
        if (entries.forall(_.rows.isDefined))
          Some(entries.map(_.rows.get).sum)
        else None
      val vals: Seq[Option[Any]] = a.aggregateExpressions.map {
        case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          fn match {
            case Count(Seq(l: Literal)) if l.value != null => total
            case Min(attr: AttributeReference) =>
              minMax(entries, attr.name, attr.dataType, isMin = true)
            case Max(attr: AttributeReference) =>
              minMax(entries, attr.name, attr.dataType, isMin = false)
            case _ => None
          }
        case _ => None
      }
      if (vals.forall(_.isDefined))
        Some(LocalRelation(a.output,
          Seq(InternalRow.fromSeq(vals.map(_.get)))))
      else None
    }

  private def minMax(entries: Seq[ManifestTable.Entry], c: String,
      dt: DataType, isMin: Boolean): Option[Any] = {
    // an entry with an exact zero row count holds nothing and needs no
    // stats; every OTHER entry must carry the recorded bound
    val live = entries.filterNot(_.rows.contains(0L))
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val bounds = live.map(e =>
          (if (isMin) e.statMin else e.statMax).get(c))
        if (!bounds.forall(_.isDefined)) None
        else if (bounds.isEmpty) Some(null) // empty table: SQL NULL
        else {
          val v = if (isMin) bounds.flatten.min else bounds.flatten.max
          // recorded bounds are widening casts of the column — casting
          // back to the column's own integral type is exact
          Some(dt match {
            case ByteType => v.toByte
            case ShortType => v.toShort
            case IntegerType => v.toInt
            case _ => v
          })
        }
      case StringType => // the default-collation singleton only
        val bounds = live.map(e =>
          (if (isMin) e.strMin else e.strMax).get(c))
        if (!bounds.forall(_.isDefined)) None
        else if (bounds.isEmpty) Some(null)
        else Some(bounds.flatten
          .map(UTF8String.fromString)
          .reduce((x, y) =>
            if ((x.compareTo(y) <= 0) == isMin) x else y))
      case _ => None
    }
  }
}
