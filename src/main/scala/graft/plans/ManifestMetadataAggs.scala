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
  * whole-table, filterless `COUNT(*)` / `MIN(col)` / `MAX(col)` /
  * `SUM(integral col)` aggregate is answered from the MANIFEST —
  * the per-dir exact row counts, min/max stats, and decimal-exact
  * column sums recorded at commit time — and rewritten
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
  *    COUNT(bare column) / MIN(bare column) / MAX(bare column) — any
  *    other expression (a cast could change type semantics)
  *    disqualifies the whole aggregate;
  *  - nothing but attribute-pruning Projects may sit between the
  *    Aggregate and the relation — a Filter means the count is no
  *    longer the table's (this rule runs Pre-CBO, after pushdown
  *    shapes settle, so a residual Filter is visible right here);
  *  - COUNT(*) needs EVERY entry's exact `rows` (a pre-upgrade entry
  *    without a recorded count disables it — the next rewrite of that
  *    dir modernizes it); COUNT(col) — the null-skipping form —
  *    additionally needs the recorded per-dir NULL COUNT on every
  *    entry that can hold rows, and answers Σ(rows − nulls);
  *  - MIN/MAX on an integral column needs the recorded long bound on
  *    every entry that can hold rows (an entry with `rows = 0`
  *    contributes nothing and needs nothing, and an entry whose
  *    recorded null count EQUALS its row count is provably all-null
  *    in that column — it contributes nothing either). A dir whose
  *    stats are absent and not provably all-null disqualifies:
  *    conservative, since recorded bounds ignore nulls exactly like
  *    SQL MIN/MAX, but absence alone can't prove which case it is;
  *  - MIN/MAX on a string column combines the recorded per-dir bounds
  *    in [[UTF8String]] BINARY order — the ordering Spark's own
  *    Min/Max on default-collation strings uses, so the driver-side
  *    fold is bit-exact with the scan for ANY string (the ASCII guard
  *    that range-compare pruning needs does not apply to an exact
  *    fold in the same order). Non-default collations never match the
  *    [[StringType]] singleton and fall through.
  *
  * The GROUPED form — `GROUP BY g` where the manifest proves every
  * non-empty dir holds exactly ONE group (recorded min == max with
  * zero nulls, or all-null: the one-commit-per-language layout, or
  * any clustered rewrite on `g`) — rewrites the same way, one
  * LocalRelation row per group ([[rewriteGrouped]]): the GROUP BY an
  * operator runs hourly over a group-routed 100 TB table costs one
  * manifest read. A single mixed dir disqualifies the whole rewrite.
  *
  * The entries come from the relation's [[ManifestFileIndex]], which
  * pins its snapshot at construction — the metadata answer and the
  * scan it replaces describe the same immutable version by
  * construction. */
object ManifestMetadataAggs extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: Aggregate if a.groupingExpressions.isEmpty =>
      rewrite(a).getOrElse(a)
    case a: Aggregate
        if a.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) =>
      rewriteGrouped(a).getOrElse(a)
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

  /** One aggregate function's metadata answer over `entries` —
    * shared by the whole-table and grouped rewrites (a group is just
    * a subset of entries). Some(null) means "the answer is SQL NULL"
    * (min over no rows); None means "not answerable". */
  private def aggValue(fn: Any,
      entries: Seq[ManifestTable.Entry]): Option[Any] = fn match {
    case Count(Seq(l: Literal)) if l.value != null =>
      if (entries.forall(_.rows.isDefined))
        Some(entries.map(_.rows.get).sum)
      else None
    case Count(Seq(attr: AttributeReference)) =>
      // null-skipping count: Σ per-dir (rows − recorded nulls)
      val live = entries.filterNot(_.rows.contains(0L))
      if (live.forall(e => e.rows.isDefined &&
          e.nullCnt.contains(attr.name)))
        Some(live.map(e => e.rows.get - e.nullCnt(attr.name)).sum)
      else None
    case Min(attr: AttributeReference) =>
      minMax(entries, attr.name, attr.dataType, isMin = true)
    case Max(attr: AttributeReference) =>
      minMax(entries, attr.name, attr.dataType, isMin = false)
    case s: org.apache.spark.sql.catalyst.expressions.aggregate.Sum =>
      s.child match {
        case attr: AttributeReference if (attr.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }) =>
          // exact per-dir decimal sums fold in arbitrary precision;
          // zero-row and provably-all-null dirs contribute nothing
          // (SQL SUM skips nulls), every other dir must have a
          // recorded sum. A total past Long range disqualifies — the
          // scan's own overflow behavior (ANSI error / legacy wrap)
          // then governs, never a silently different number.
          val live = entries.filterNot(e => e.rows.contains(0L) ||
            e.rows.exists(r => e.nullCnt.get(attr.name).contains(r)))
          if (!live.forall(_.sums.contains(attr.name))) None
          else if (live.isEmpty) Some(null) // SUM over no rows: NULL
          else {
            val total = live.map(e => BigInt(e.sums(attr.name))).sum
            if (total.isValidLong) Some(total.toLong) else None
          }
        case _ => None
      }
    case _ => None
  }

  /** Some(LocalRelation) iff EVERY output aggregate is answerable
    * from the manifest. */
  /** Pending deletion vectors make every recorded row/null count and
    * bound describe PHYSICAL file content, not the logical table —
    * the rule stands down until a rewrite materializes them. (Belt
    * and braces: the dv resolution rewrite already replaces such
    * relations with a join shape [[indexOf]] cannot match.) */
  private def exactIndexOf(p: LogicalPlan): Option[ManifestFileIndex] =
    indexOf(p).filterNot(_.snapshotEntries.exists(_.dv.nonEmpty))

  private def rewrite(a: Aggregate): Option[LogicalPlan] =
    exactIndexOf(a.child).flatMap { idx =>
      val entries = idx.snapshotEntries
      val vals: Seq[Option[Any]] = a.aggregateExpressions.map {
        case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          aggValue(fn, entries)
        case _ => None
      }
      if (vals.forall(_.isDefined))
        Some(LocalRelation(a.output,
          Seq(InternalRow.fromSeq(vals.map(_.get)))))
      else None
    }

  /** The GROUPED twin: `GROUP BY g` where the manifest proves every
    * dir is SINGLE-GROUP in `g` — the layout a group-routed ingest or
    * a clustered rewrite naturally produces (one commit per language,
    * say) — is answered per group from the same per-dir metadata. A
    * dir is single-group in `g` when its recorded null count says
    * either NO row is null AND the recorded min equals the max (all
    * rows hold that one value; byte-equality of the recorded bounds
    * needs no ASCII guard — equal bounds under ANY total order mean
    * all values equal), or EVERY row is null (the dir belongs to the
    * SQL NULL group). A mixed dir — some nulls, or min < max — holds
    * more than one group and disqualifies the whole rewrite: the
    * metadata records totals per dir, not per group. Zero-row dirs
    * belong to no group; a dir without recorded rows or null counts
    * can't be classified and disqualifies. Aggregates per group are
    * then exactly the whole-table fold over that group's dirs
    * ([[aggValue]]), and a grouping column in the output projects the
    * group key itself. An empty table yields the zero-row
    * LocalRelation — exactly SQL's empty GROUP BY. */
  private def rewriteGrouped(a: Aggregate): Option[LogicalPlan] =
    exactIndexOf(a.child).flatMap { idx =>
      val groupAttrs = a.groupingExpressions
        .map(_.asInstanceOf[AttributeReference])
      val all = idx.snapshotEntries
      val entries = all.filterNot(_.rows.contains(0L))
      // Some(key) per dir per grouping attr, or None = unclassifiable
      val keyed: Seq[Option[(Seq[Option[Any]], ManifestTable.Entry)]] =
        entries.map { e =>
          val ks = groupAttrs.map(g => groupKeyOf(e, g))
          if (ks.forall(_.isDefined)) Some((ks.map(_.get), e)) else None
        }
      if (!all.forall(_.rows.isDefined) || !keyed.forall(_.isDefined))
        None
      else {
        val groups = keyed.flatten.groupBy(_._1).toSeq.map {
          case (k, es) => (k, es.map(_._2))
        }
        val rows = groups.map { case (key, es) =>
          val vals: Seq[Option[Any]] = a.aggregateExpressions.map {
            case attr: AttributeReference =>
              groupAttrs.zipWithIndex
                .collectFirst { case (g, i) if g.semanticEquals(attr) =>
                  key(i).orNull }
            case Alias(attr: AttributeReference, _) =>
              groupAttrs.zipWithIndex
                .collectFirst { case (g, i) if g.semanticEquals(attr) =>
                  key(i).orNull }
            case Alias(AggregateExpression(fn, Complete, false, None, _),
                _) =>
              aggValue(fn, es)
            case _ => None
          }
          if (vals.forall(_.isDefined))
            Some(InternalRow.fromSeq(vals.map(v => internal(v.get))))
          else None
        }
        if (rows.forall(_.isDefined))
          Some(LocalRelation(a.output, rows.map(_.get)))
        else None
      }
    }

  /** This dir's single group key in `g`: Some(Some(v)) = every row
    * holds `v`, Some(None) = every row is NULL, None = mixed or
    * unprovable (disqualifies). Requires the recorded null count —
    * min == max alone cannot rule out nulls hiding next to the one
    * value (bounds skip nulls). */
  private def groupKeyOf(e: ManifestTable.Entry,
      g: AttributeReference): Option[Option[Any]] = {
    val nulls = e.nullCnt.get(g.name)
    if (nulls.isEmpty) return None
    if (e.rows.exists(r => nulls.contains(r))) return Some(None)
    if (!nulls.contains(0L)) return None // mixed null/value dir
    g.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (e.statMin.get(g.name), e.statMax.get(g.name)) match {
          case (Some(mn), Some(mx)) if mn == mx =>
            Some(Some(g.dataType match {
              case ByteType => mn.toByte
              case ShortType => mn.toShort
              case IntegerType => mn.toInt
              case _ => mn
            }))
          case _ => None
        }
      case StringType => // the default-collation singleton only
        (e.strMin.get(g.name), e.strMax.get(g.name)) match {
          case (Some(mn), Some(mx)) if mn == mx => Some(Some(mn))
          case _ => None
        }
      case _ => None
    }
  }

  /** Driver values → InternalRow representation (strings become
    * [[UTF8String]]; null and numerics pass through). */
  private def internal(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case x => x
  }

  private def minMax(entries: Seq[ManifestTable.Entry], c: String,
      dt: DataType, isMin: Boolean): Option[Any] = {
    // an entry with an exact zero row count holds nothing, and one
    // whose recorded null count equals its row count is provably
    // all-null in this column — neither contributes to MIN/MAX
    // (recorded bounds skip nulls exactly like SQL's), so neither
    // needs a bound; every OTHER entry must carry one
    val live = entries.filterNot(e => e.rows.contains(0L) ||
      e.rows.exists(r => e.nullCnt.get(c).contains(r)))
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
