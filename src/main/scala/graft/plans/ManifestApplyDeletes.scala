package graft.plans

import graft.sources.ManifestFileIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.StructType

/** Merge-on-read deletes for the `graft-manifest` SQL surface: a
  * snapshot with pending deletion vectors ([[graft.sinks.ManifestTable
  * .deleteKeys]]) cannot be served by a bare file scan — a file-level
  * index can prune FILES but not anti-join a tombstone's key set. So
  * this POST-HOC resolution rule (injected by [[graft.GraftExtensions]])
  * rewrites any such relation into the plan the programmatic read path
  * builds: the snapshot's dirs grouped by their tombstone SET, one
  * sub-relation per group ([[ManifestFileIndex]]'s subset constructor,
  * `applyDeletes = false` — the termination guarantee), each group
  * anti-joined against its broadcast tombstone key sets, unioned, and
  * re-aliased to the original relation's attribute ids so the parent
  * plan never notices the substitution. This is the same layering
  * Delta uses for its deletion vectors pre-DSv2: the table format owns
  * a resolution rewrite, everything downstream is ordinary Catalyst.
  *
  * Scale shape: filters still push into every sub-relation's
  * ManifestFileIndex (predicate pushdown crosses a left-anti join's
  * LEFT side), so dir pruning and parquet row-group skipping survive;
  * the added cost is one broadcast anti-join per tombstone over an
  * update-batch-sized key set — the read tax merge-on-read trades for
  * not rewriting data files at delete time. Clean tables (no pending
  * dv) never match and pay nothing.
  *
  * Post-hoc placement matters: the main resolution batch has already
  * converted DML statements on manifest views into Graft commands
  * ([[ManifestSqlRules]]), so this rule only ever sees pure READ
  * relations — it can never rewrite a DML target out from under the
  * insert-interception that prevents raw-file writes. (DML whose
  * TARGET view captured a dv-rewritten plan is still recognized via
  * [[ManifestSqlRules]]'s sub-index fallback.) */
object ManifestApplyDeletes extends Rule[LogicalPlan] {

  /** Marks the ROOT node of a dv rewrite with its table path. DML
    * targeting a view that captured the rewrite is recognized by this
    * tag and nothing else ([[ManifestSqlRules]]): a user-authored
    * plan that merely CONTAINS the rewrite's sub-relations (a
    * filtered view, a self-join projected back to the table's
    * columns) carries no root tag and falls through to Spark's own
    * not-a-writable-table rejection — before the tag, such a plan
    * could pass a schema-shape check and route a whole-table DELETE
    * that ignored the view's predicate. Tags survive `makeCopy` /
    * transform plumbing, so the marker outlives analyzer bookkeeping
    * but never attaches to any node this rule didn't build. */
  val DvRewriteTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[String](
      "graft.dvRewriteOf")

  /** Past this many DISTINCT tombstone sets the union below stops
    * being a read tax and starts being a plan-width problem (one
    * sub-relation per set) — the operator signal to run
    * [[graft.sinks.ManifestTable.rewriteDeletes]], surfaced as a
    * warning because the read itself stays correct at any width. */
  val GroupWarnThreshold = 16

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestFileIndex if m.applyDeletes &&
              m.snapshotEntries.exists(_.dv.nonEmpty) =>
            rewrite(l, h, m)
          case _ => l
        }
        case _ => l
      }
    }

  private def rewrite(l: LogicalRelation, h: HadoopFsRelation,
      m: ManifestFileIndex): LogicalPlan = {
    val spark = SparkSession.active
    // group dirs by tombstone set — dv scoping is PER DIR (a key
    // re-inserted after its delete lives in a fresh dir with no
    // tombstone and must survive), so each group applies exactly its
    // own tombstones before the union
    val groups = m.snapshotEntries.groupBy(_.dv).toSeq.sortBy(_._2.head.dir)
    if (groups.size > GroupWarnThreshold) logWarning(
      s"graft-manifest read of ${m.tablePath}: ${groups.size} distinct " +
        "pending deletion-vector sets — this plan unions one " +
        "sub-scan per set; run ManifestTable.rewriteDeletes to " +
        "materialize the tombstones and restore a single-scan plan")
    val frames = groups.map { case (dv, es) =>
      val sub = new ManifestFileIndex(spark, m.tablePath, m.version, es)
      val rel = HadoopFsRelation(sub, StructType(Nil), h.dataSchema,
        None, h.fileFormat, h.options)(spark)
      val df = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        LogicalRelation(rel))
      dv.toSeq.sortBy(_._1).foldLeft(df) { case (d, (tomb, kc)) =>
        d.join(broadcast(spark.read
          .parquet(s"${m.tablePath}/deletes/$tomb").select(col(kc))),
          Seq(kc), "left_anti")
      }
    }
    val analyzed = frames.reduce(_ unionByName _).queryExecution.analyzed
    // re-alias to the original relation's exprIds: parent operators
    // keep resolving against the attributes they were analyzed with
    val byName = analyzed.output.map(a => a.name -> a).toMap
    val root = Project(l.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), analyzed)
    root.setTagValue(DvRewriteTag, m.tablePath)
    root
  }
}
