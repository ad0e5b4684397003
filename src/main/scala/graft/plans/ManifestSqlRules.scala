package graft.plans

import graft.sinks.ManifestTable
import graft.sources.ManifestFileIndex
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** SQL DML on the `graft-manifest` table format: `INSERT INTO` /
  * `INSERT OVERWRITE`; `DELETE FROM … WHERE <range | string points |
  * composite point | none>`; the `UPDATE … SET …` family over the
  * same WHERE grammar; and the FULL ordered-clause `MERGE INTO` —
  * whole-row upsert, column-wise patch, conditioned UPDATE/DELETE
  * clauses, conditioned INSERT *, NOT MATCHED BY SOURCE, composite
  * ON keys — the write surface the reference's users actually type
  * (their one table is mutated in SQL: INSERT in
  * /root/reference/processor.py:55-62, the rest delegated to the
  * warehouse).
  *
  * Mechanism: an injected RESOLUTION rule (via [[graft.GraftExtensions]])
  * that recognizes the DML plan shapes whose target resolves to
  * a `graft-manifest` relation ([[ManifestFileIndex]] behind a
  * [[HadoopFsRelation]]) and replaces them with runnable commands
  * routing to the [[ManifestTable]] primitives (append/overwrite/
  * deleteRange/deleteKeys/update family/merge/mergeUpdate/
  * mergeClauses). The rule
  * must fire at resolution time: left alone, Spark would either plan
  * the insert as a RAW file write into the relation's root path —
  * unreferenced by any manifest, silent data loss — or reject
  * DELETE/MERGE as v2-only. Running in the main resolution batch
  * (before the built-in post-hoc `DataSourceAnalysis`) guarantees the
  * interception wins.
  *
  * Deliberately STRICT: every supported statement maps exactly onto a
  * manifest primitive whose semantics are oracle-checked; anything
  * else fails loudly at analysis (an approximated DELETE predicate
  * would delete the wrong rows — the one failure a DML surface must
  * never have). */
object ManifestSqlRules extends Rule[LogicalPlan] {

  /** The DML target, unwrapped to its manifest table path + schema —
    * matches however many alias/view layers resolution stacked on. */
  private object ManifestTarget {
    def unapply(plan: LogicalPlan): Option[(String, StructType)] =
      plan match {
        case SubqueryAlias(_, child) => unapply(child)
        case v: View => unapply(v.child) // temp-view DML targets resolve through a View node
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location match {
            case idx: ManifestFileIndex => Some((idx.tablePath, l.schema))
            case _ => None
          }
          case _ => None
        }
        case p => dvRewritten(p)
      }

    /** A view can capture the DELETION-VECTOR rewrite of a manifest
      * relation ([[ManifestApplyDeletes]] replaces the LogicalRelation
      * at the view's analysis time) — recognized by the rewrite's own
      * ROOT TAG ([[ManifestApplyDeletes.DvRewriteTag]]) and nothing
      * weaker: the DML target, once alias/view layers are unwrapped,
      * must BE the tagged rewrite root. A user-authored plan that
      * merely contains the rewrite's sub-relations — a view capturing
      * `read(t).filter(...)`, a self-join projected back to the
      * table's columns — has the rewrite buried under its own
      * operators, so the root carries no tag and the statement falls
      * through to Spark's own not-a-writable-table rejection instead
      * of misrouting to a whole-table command that would ignore the
      * view's predicate. The path/schema cross-checks stay as
      * belt-and-braces: the tag's path must be the plan's single
      * manifest path and the output must be the persisted schema. */
    private def dvRewritten(p: LogicalPlan): Option[(String, StructType)] =
      p.getTagValue(ManifestApplyDeletes.DvRewriteTag).flatMap { tagged =>
        val paths = p.collect {
          case l: LogicalRelation => l.relation match {
            case h: HadoopFsRelation => h.location match {
              case m: ManifestFileIndex if !m.applyDeletes =>
                Seq(m.tablePath)
              case _ => Seq.empty[String]
            }
            case _ => Seq.empty[String]
          }
        }.flatten.distinct
        paths match {
          case Seq(path) if path == tagged =>
            val spark = SparkSession.active
            val ok = ManifestTable.latestVersion(spark, path)
              .flatMap(v => ManifestTable.schemaOf(spark, path, v))
              .exists(_.fieldNames.toSeq == p.schema.fieldNames.toSeq)
            if (ok) Some((path, p.schema)) else None
          case _ => None
        }
      }
  }

  /** Column name behind an (possibly unresolved, possibly
    * widening-cast) reference. Narrowing casts are value-changing and
    * never stripped — for DML that means REJECTION downstream, not a
    * silent skip. */
  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    // an UNRESOLVED cast child cannot report a dataType (it throws in
    // Spark 4, it does not return NullType) — contribute nothing now;
    // a later fixed-point pass sees it resolved, or the strict
    // downstream checks reject the statement with their own message
    case c: Cast if c.child.resolved =>
      val w = Seq(c.child.dataType, c.dataType).map {
        case org.apache.spark.sql.types.ByteType => Some(1)
        case org.apache.spark.sql.types.ShortType => Some(2)
        case org.apache.spark.sql.types.IntegerType => Some(4)
        case org.apache.spark.sql.types.LongType => Some(8)
        case _ => None
      }
      w match {
        case Seq(Some(a), Some(b)) if b >= a => nameOf(c.child)
        case _ => None
      }
    case _ => None
  }

  /** The exact long value of an integral CONSTANT operand — a bare
    * literal, or the foldable cast type coercion wrapped around it
    * (evaluating the fold gives precisely the value the comparison
    * would run against, so this is exact, never approximate; a null
    * fold result — e.g. overflow — yields None and the statement is
    * rejected). */
  private def longLit(e: Expression): Option[Long] = e match {
    case k if k.resolved && k.foldable &&
        (k.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          case _ => false
        }) =>
      Option(k.eval()).map {
        case v: java.lang.Byte => v.toLong
        case v: java.lang.Short => v.toLong
        case v: java.lang.Integer => v.toLong
        case v: java.lang.Long => v.longValue()
      }
    case Literal(v: Byte, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => Some(v)
    case _ => None
  }

  /** The EXACT closed range a DELETE/UPDATE condition denotes on one
    * integral column, or a loud error. Supported: conjunctions of >=,
    * >, <=, <, =, BETWEEN (parsed as >= AND <=) on a single column with
    * integral literals; strict bounds normalize by ±1 (exact on
    * integers). `None` = the condition denotes an EMPTY range (a
    * no-op, e.g. `id > Long.MaxValue`). Anything else —
    * OR, a second column, non-integral literals, functions — is
    * rejected via the TYPED [[UnsupportedWhereShape]] so the
    * dispatcher reroutes exactly the not-a-range shapes to the
    * general predicate path and nothing else: a genuine defect in
    * this extractor (an unexpected NPE) must surface, not be
    * silently absorbed as "fall through to generalWhere". */
  /** The range extractor's "not a range" signal (and its only
    * intended escape): the DELETE/UPDATE dispatcher catches exactly
    * this type to fall through to the general predicate path;
    * everything else propagates. */
  private final class UnsupportedWhereShape(msg: String)
    extends RuntimeException(msg)

  private def deleteRangeOf(cond: Expression, stmt: String = "DELETE")
      : Option[(String, Long, Long)] = {
    var colName: Option[String] = None
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def bind(c: String): Unit = colName match {
      case Some(prev) if prev != c => fail(
        s"predicate spans columns '$prev' and '$c'")
      case _ => colName = Some(c)
    }
    def fail(why: String): Nothing = throw new UnsupportedWhereShape(
      s"graft-manifest $stmt: unsupported WHERE shape ($why) — " +
        "supported: a conjunction of range/point comparisons " +
        "(>=, >, <=, <, =, BETWEEN) on ONE integral column with " +
        s"integral literals, or no WHERE (whole-table $stmt). " +
        "Anything else must go through the programmatic API, where " +
        "the semantics are explicit.")
    // either operand may be the column (the other must fold to an
    // integral constant — type coercion wraps literals in foldable
    // casts, handled by longLit); `colLeft`/`colRight` give the range
    // for each orientation
    def cmp(a: Expression, b: Expression, colLeft: Long => (Long, Long),
        colRight: Long => (Long, Long)): Unit =
      (nameOf(a).zip(longLit(b)), nameOf(b).zip(longLit(a))) match {
        case (Some((c, v)), _) =>
          bind(c)
          val (l1, h1) = colLeft(v)
          lo = math.max(lo, l1); hi = math.min(hi, h1)
        case (_, Some((c, v))) =>
          bind(c)
          val (l1, h1) = colRight(v)
          lo = math.max(lo, l1); hi = math.min(hi, h1)
        case _ => fail(s"not a column-vs-integral-constant comparison: " +
          s"${a.sql} vs ${b.sql}")
      }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, b) => cmp(a, b,
        v => (v, Long.MaxValue), v => (Long.MinValue, v))
      case GreaterThan(a, b) => cmp(a, b,
        v => if (v == Long.MaxValue) (1L, 0L) // strict past the domain: empty
          else (v + 1, Long.MaxValue),
        v => if (v == Long.MinValue) (1L, 0L)
          else (Long.MinValue, v - 1))
      case LessThanOrEqual(a, b) => cmp(a, b,
        v => (Long.MinValue, v), v => (v, Long.MaxValue))
      case LessThan(a, b) => cmp(a, b,
        v => if (v == Long.MinValue) (1L, 0L)
          else (Long.MinValue, v - 1),
        v => if (v == Long.MaxValue) (1L, 0L)
          else (v + 1, Long.MaxValue))
      case EqualTo(a, b) => cmp(a, b, v => (v, v), v => (v, v))
      case b: Between => // its own node until replaced: >= AND <=
        walk(GreaterThanOrEqual(b.input, b.lower))
        walk(LessThanOrEqual(b.input, b.upper))
      case other => fail(s"node ${other.getClass.getSimpleName}")
    }
    walk(cond)
    val c = colName.getOrElse(fail("no column bound"))
    if (lo > hi) None else Some((c, lo, hi))
  }

  /** A DELETE condition that is a STRING key point or set:
    * `k = '<lit>'` or `k IN ('<lit>', …)` with string literals only.
    * NULL literals contribute nothing (SQL: `k IN (NULL)` is never
    * TRUE for any row) — an all-NULL list yields `Some((col, Nil))`,
    * which the caller turns into a no-op. Anything mixed falls
    * through to the range extractor's strict rejection. */
  private object StringKeyDelete {
    private def strLit(e: Expression): Option[Option[String]] = e match {
      case l: Literal
          if l.dataType == org.apache.spark.sql.types.StringType =>
        Some(Option(l.value).map(_.toString))
      case _ => None
    }
    def unapply(cond: Expression): Option[(String, Seq[String])] =
      cond match {
        case EqualTo(a, b) =>
          nameOf(a).zip(strLit(b)).orElse(nameOf(b).zip(strLit(a)))
            .map { case (c, v) => (c, v.toSeq) }
        case In(a, list) if list.nonEmpty &&
            list.forall(strLit(_).isDefined) =>
          nameOf(a).map(c => (c, list.flatMap(strLit(_).get)))
        case _ => None
      }
  }

  /** A DELETE condition that is an INTEGRAL key point SET:
    * `k IN (<integral literals>)`, two or more values — the
    * scattered-key shape (`WHERE id IN (3, 17, 94233)`) where a
    * copy-on-write range delete would rewrite every dir holding one
    * key; routed MERGE-ON-READ like the string twin
    * ([[StringKeyDelete]]): one tombstone write, Bloom/stat-pruned,
    * zero data files rewritten. Single equality stays on the range
    * fast path (a point range [v,v] — whole expired dirs drop
    * metadata-only). NULL literals contribute nothing (`k IN (NULL)`
    * is never TRUE). */
  private object IntKeyDelete {
    private def intLit(e: Expression): Option[Option[Long]] = e match {
      case l: Literal if l.value == null => e.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => Some(None)
        case _ => None
      }
      case other => longLit(other).map(Some(_))
    }
    def unapply(cond: Expression): Option[(String, Seq[Long])] =
      cond match {
        case In(a, list) if list.size >= 2 &&
            list.forall(intLit(_).isDefined) =>
          nameOf(a).map(c => (c, list.flatMap(intLit(_).get)))
        case _ => None
      }
  }

  /** A DELETE/UPDATE condition that is a conjunction of POINT
    * EQUALITIES on TWO OR MORE distinct columns — the composite
    * business-key address (`WHERE cve_id = '…' AND source = '…'`).
    * Each conjunct binds one column to one string or integral
    * literal; the whole condition denotes exactly ONE key tuple.
    * Routed onto the ordered-clause merge engine (copy-on-write,
    * conjunctive composite dir pruning). Single-column shapes fall
    * through to the existing range/point paths. */
  private object CompositePointKeys {
    def unapply(cond: Expression)
        : Option[Seq[(String, Either[Long, String])]] = {
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      def strLit(e: Expression): Option[String] = e match {
        case l: Literal
            if l.dataType == org.apache.spark.sql.types.StringType =>
          Option(l.value).map(_.toString)
        case _ => None
      }
      val pairs = conjuncts(cond).map {
        case EqualTo(a, b) =>
          def bind(x: Expression, y: Expression)
              : Option[(String, Either[Long, String])] =
            nameOf(x).flatMap(c =>
              strLit(y).map(s =>
                  c -> (scala.Right(s): Either[Long, String]))
                .orElse(longLit(y).map(v =>
                  c -> (scala.Left(v): Either[Long, String]))))
          bind(a, b).orElse(bind(b, a))
        case _ => None
      }
      val got = pairs.flatten
      if (got.length == pairs.length && got.length >= 2 &&
          got.map(_._1).distinct.length == got.length) Some(got)
      else None
    }
  }

  /** Rebuild a RESOLVED assignment-value expression as a Column that
    * re-resolves BY NAME against the rewrite engine's own frames:
    * every [[AttributeReference]] is renamed through `rename` (which
    * encodes which side — target columns keep their name, merge
    * source columns take the `_src_` alias [[ManifestTable
    * .mergeUpdate]] publishes) and swapped for an unresolved
    * attribute. Returns None — rejection, never approximation — for
    * an attribute `rename` cannot place, a subquery (the rewrite
    * frame cannot host one), or a non-deterministic expression
    * (re-evaluated per touched dir, it would update different rows
    * to different values than the statement ran once would). */
  /** Inline Spark 4's analysis-time common-subexpression shapes so
    * the by-name rebuild and the pruning extractors see PLAIN trees:
    * `BETWEEN` resolves into `With(CommonExpressionDef …)` (to avoid
    * double evaluation), whose node refuses unresolved children —
    * the rebuild's UnresolvedAttributes would crash its transform.
    * Inlining re-duplicates the (deterministic) common expression,
    * exactly what the predicate means; Between still present as its
    * own node expands to its >= AND <= definition, which the
    * conjunct extractors can also bound. */
  private def inlineWith(e0: Expression): Expression = e0.transformUp {
    case w: With =>
      val byId = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: CommonExpressionRef => byId.getOrElse(r.id, r)
      }
    case b: Between =>
      And(GreaterThanOrEqual(b.input, b.lower),
        LessThanOrEqual(b.input, b.upper))
  }

  private def rebuildSetValue(e1: Expression,
      rename: AttributeReference => Option[String])
      : Option[org.apache.spark.sql.Column] = {
    val e = inlineWith(e1)
    var ok = true
    val t = e.transform {
      case a: AttributeReference =>
        rename(a) match {
          case Some(n) => UnresolvedAttribute.quoted(n)
          case None => ok = false; a
        }
    }
    if (!ok || !e.deterministic || e.exists(_.isInstanceOf[SubqueryExpression]))
      None
    else Some(org.apache.spark.sql.GraftSqlBridge.column(t))
  }

  /** A SET target's column path: a plain attribute is one segment, a
    * GetStructField chain is the dotted nested path. None for
    * anything else (array indexing, functions — not assignable). */
  private def keyPathOf(e: Expression): Option[Seq[String]] = e match {
    case a: AttributeReference => Some(Seq(a.name))
    case g: GetStructField =>
      keyPathOf(g.child).map(_ :+ g.extractFieldName)
    case _ => None
  }

  /** Fold NESTED SET targets onto their top-level column through
    * Column.withField — the leaf replaces IN PLACE, siblings ride
    * untouched, a NULL parent struct stays NULL (withField's own
    * semantics). `plainOf` renders the non-nested assignments;
    * `rebuilt` renders a value in the caller's reference scope. */
  private def foldNestedSets(schema: StructType,
      assigns: Seq[Assignment],
      rebuilt: (Assignment, String) => org.apache.spark.sql.Column,
      plainOf: Seq[Assignment] => Seq[(String, org.apache.spark.sql.Column)])
      : Seq[(String, org.apache.spark.sql.Column)] = {
    val (nested, plain) = assigns.partition(a => keyPathOf(a.key)
      .exists(_.length > 1))
    val nestedSets = nested
      .map(a => (keyPathOf(a.key).get, a))
      .groupBy(_._1.head).toSeq.sortBy(_._1)
      .map { case (head, as) =>
        val v = as.foldLeft(col(head): org.apache.spark.sql.Column) {
          case (acc, (p, a)) =>
            val dotted = p.mkString(".")
            val leaf = ManifestTable.nestedTypeOf(schema, dotted)
              .getOrElse(sys.error(
                s"graft-manifest: SET target '$dotted' does not " +
                  "resolve through the table's structs"))
            acc.withField(p.tail.mkString("."),
              rebuilt(a, dotted).cast(leaf))
        }
        (head, v)
      }
    plainOf(plain) ++ nestedSets
  }

  /** An ARBITRARY deterministic, subquery-free WHERE, classified for
    * the general DELETE/UPDATE path ([[ManifestTable.deleteWhere]] /
    * [[ManifestTable.updateWhere]]): returns the predicate rebuilt as
    * a by-name Column (the rewrite frame re-resolves it) plus its
    * resolved top-level conjuncts (the dir-pruning probe's input —
    * the same extractors the scan's FileIndex runs on pushed
    * filters). Loud on the two shapes row-level DML must never
    * guess at: a non-deterministic predicate (re-evaluated per
    * touched dir, it would delete different rows than the statement
    * run once would) and a subquery (the rewrite frame cannot host
    * one — route it through the programmatic API with the subquery
    * materialized). */
  private def generalWhere(cond0: Expression, stmt: String)
      : (org.apache.spark.sql.Column, Seq[Expression]) = {
    // inlined FIRST so the conjunct extractors can bound a BETWEEN's
    // expanded >= AND <= too, not just the Column rebuild
    val cond = inlineWith(cond0)
    val c = rebuildSetValue(cond, ar => Some(ar.name)).getOrElse(
      sys.error(s"graft-manifest $stmt: unsupported WHERE " +
        s"(${cond.sql}) — non-deterministic functions and " +
        "subqueries must go through the programmatic API (evaluate " +
        "the subquery first, then deleteKeys/deleteWhere)"))
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    (c, conjuncts(cond))
  }

  /** The inlined-set size past which a subquery-predicate DML will
    * not materialize the set as LITERALS: a point-set with millions
    * of keys is a join, not a literal list — inlining would build an
    * expression the optimizer chokes on and a driver heap full of
    * literals. Past the cap, the canonical shape — `DELETE WHERE col
    * IN (SELECT …)` as the whole condition — AUTO-ROUTES through the
    * DataFrame-valued merge-on-read delete ([[ManifestTable
    * .deleteKeys]]: the key set stays distributed end-to-end — prune
    * pass, tombstone write — and zero data files rewrite), exactly
    * what a warehouse plans for that statement; every other over-cap
    * shape stays loud with the MERGE remedy. Both knobs are session
    * confs: `spark.graft.dml.maxInlineSubqueryKeys` (the cap) and
    * `spark.graft.dml.subqueryJoinRoute=false` to retain the
    * always-loud contract. */
  private def maxInlineSubqueryKeys: Int =
    SparkSession.active.conf
      .get("spark.graft.dml.maxInlineSubqueryKeys", "100000").toInt

  private def subqueryJoinRouteEnabled: Boolean =
    SparkSession.active.conf
      .get("spark.graft.dml.subqueryJoinRoute", "true").toBoolean

  /** Typed control signal: an IN-subquery's key set exceeded the
    * inline cap. Carries the statement's own REFRESHED subplan (the
    * snapshot discipline already applied) so the DELETE dispatcher
    * can re-route it join-based; everywhere else it propagates and
    * `loud` is the user-facing refusal. */
  private[plans] final case class SubqueryBeyondInlineCap(
      keyValue: Expression, sub: LogicalPlan, loud: String)
    extends RuntimeException(loud)

  /** PEEL an over-cap condition of the shape `col IN (SELECT …) AND
    * <deterministic residual>` (conjuncts in any order): exactly one
    * single-column IN-subquery on a plain attribute, every other
    * conjunct subquery-free and deterministic. Returns the key
    * attribute, the residual (conjoined), and its prune conjuncts —
    * the frame-keyed routes then run the membership as a key-frame
    * join and the residual VERBATIM inside the staged rewrite. Any
    * other arrangement (two IN-subqueries, a residual with its own
    * subquery, OR-joined membership, NOT IN) returns None and the
    * caller rethrows the loud MERGE remedy. */
  private def peelSubqueryResidual(cond: Expression, stmt: String)
      : Option[(Seq[String],
        org.apache.spark.sql.Column, Seq[Expression])] = {
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    val cs = conj(cond)
    val (ins, rest) = cs.partition {
      case InSubquery(vs, _)
          if vs.forall(_.isInstanceOf[AttributeReference]) => true
      case _ => false
    }
    ins match {
      case Seq(InSubquery(vs, _))
          if rest.nonEmpty && rest.forall(r =>
            !hasSubquery(r) && r.deterministic) =>
        scala.util.Try(
          generalWhere(rest.reduce(And), stmt)).toOption
          .map { case (rc, rconj) =>
            (vs.map(_.asInstanceOf[AttributeReference].name),
              rc, rconj) }
      case _ => None
    }
  }

  /** Materialize every UNCORRELATED subquery inside a DML WHERE at
    * rule time — `DELETE FROM t WHERE id IN (SELECT …)`,
    * `UPDATE … WHERE EXISTS (…)`, `WHERE ts < (SELECT max(ts) …)` —
    * by RUNNING the subplan now and splicing its result back as
    * literals: an IN-subquery becomes `In(col, values)` (so a string
    * point set then routes MERGE-ON-READ through the existing
    * [[StringKeyDelete]] → deleteKeys classification, zero data files
    * rewritten; an integral range through deleteRange; anything else
    * through the general predicate path — the materialized condition
    * re-enters the SAME classifier as a hand-written one), EXISTS
    * becomes a boolean literal, and a scalar subquery becomes its
    * value (`ts < (SELECT max…)` then hits the retention-delete
    * range fast path). Evaluation at rule time is exact for DML: the
    * statement is a single-shot command, so "the subquery as of
    * analysis" and "as of execution" are the same read — and the
    * subplan sees the manifest relation's own snapshot like any
    * query. CORRELATED subqueries stay loud: per-row re-evaluation
    * cannot ride the staged-rewrite engine. NULL semantics survive
    * the splice: list nulls stay in the literal list (three-valued
    * IN), an empty scalar result splices a typed NULL. */
  /** Re-point every UN-PINNED manifest relation inside a DML
    * subquery's plan at the table's CURRENT snapshot, preserving
    * attribute ids (LogicalRelation.copy(output) — the
    * [[ManifestCatalogRules]] bridging move). Why: a temp view (or
    * any path-loaded frame) pins the snapshot current at LOAD time —
    * correct for reads, but a DML whose TARGET acts on the latest
    * snapshot must not evaluate its own subquery against an older
    * one: `DELETE … WHERE id NOT IN (SELECT id FROM same_view …)`
    * would otherwise delete rows the statement's own SELECT can see.
    * Relations pinned BY INTENT (versionAsOf/timestampAsOf/tagAsOf
    * reader options ride HadoopFsRelation.options) stay pinned —
    * time travel in a subquery is legitimate and means what it says.
    * A schema that evolved since the view registered is loud. */
  private def refreshManifestRelations(plan: LogicalPlan,
      stmt: String): LogicalPlan = {
    val spark = SparkSession.active
    val pinKeys = Seq("versionAsOf", "timestampAsOf", "tagAsOf")
    plan.transformUp {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: ManifestFileIndex
              if !pinKeys.exists(h.options.contains) &&
                !ManifestTable.latestVersion(spark, idx.tablePath)
                  .contains(idx.version) =>
            val fresh = spark.read.format("graft-manifest")
              .load(idx.tablePath).queryExecution.analyzed
            require(fresh.output.map(a => (a.name, a.dataType)) ==
                l.output.map(a => (a.name, a.dataType)),
              s"graft-manifest $stmt: the subquery reads a view of " +
                s"${idx.tablePath} whose schema has since evolved — " +
                "re-register the view (or address the table by " +
                "catalog name) and re-run")
            fresh match {
              case fl: LogicalRelation =>
                fl.copy(output = l.output.toIndexedSeq)
              case p if p.getTagValue(
                  ManifestApplyDeletes.DvRewriteTag).isDefined =>
                Project(p.output.zip(l.output).map { case (a, o) =>
                  Alias(a, o.name)(exprId = o.exprId)
                }, p)
              case other => sys.error(s"graft-manifest $stmt: the " +
                s"refreshed read of ${idx.tablePath} planned as " +
                s"${other.nodeName} — cannot re-identify")
            }
          case _ => l
        }
        case _ => l
      }
    }
  }

  private def materializeSubqueries(cond: Expression,
      stmt: String): Expression = {
    val spark = SparkSession.active
    def requireUncorrelated(outer: Seq[Expression], what: String): Unit =
      require(outer.isEmpty,
        s"graft-manifest $stmt: CORRELATED $what subqueries are not " +
          "supported — a per-row subquery cannot ride the staged " +
          "rewrite; use MERGE INTO (the join form) or the " +
          "programmatic API")
    def overflowMsg(what: String): String =
      s"graft-manifest $stmt: the $what subquery returned more than " +
        s"$maxInlineSubqueryKeys distinct values — at that scale the " +
        "statement is a join, not a point set; use MERGE INTO or the " +
        "programmatic API"
    cond.transformUp {
      case InSubquery(values, lq: ListQuery) =>
        requireUncorrelated(lq.outerAttrs, "IN")
        // COMPOSITE-key membership (`(a, b) IN (SELECT …)`): there is
        // no literal-inline form worth building (a tuple-literal In
        // defeats every point-set fast path), and no merge-on-read
        // either (tombstones are single-key) — the statement is a
        // join at ANY size, so it routes the tuple-frame path
        // directly via the typed signal. Plain key columns only;
        // the knob restores the loud refusal.
        if (values.size > 1) {
          require(subqueryJoinRouteEnabled &&
            values.forall(_.isInstanceOf[AttributeReference]),
            s"graft-manifest $stmt: multi-column IN subqueries are " +
              "supported only as the frame-keyed route on plain key " +
              "columns (spark.graft.dml.subqueryJoinRoute) — use " +
              "MERGE INTO with a composite ON key otherwise")
          throw SubqueryBeyondInlineCap(values.head,
            refreshManifestRelations(lq.plan, stmt),
            s"graft-manifest $stmt: composite-key IN subqueries " +
              "route frame-keyed only — this shape could not be " +
              "routed; use MERGE INTO with a composite ON key")
        }
        require(values.size == 1 && lq.plan.output.size == 1,
          s"graft-manifest $stmt: multi-column IN subqueries are not " +
            "supported — use MERGE INTO with a composite ON key")
        val sub = refreshManifestRelations(lq.plan, stmt)
        val out = sub.output.head
        val rows = org.apache.spark.sql.GraftSqlBridge
          .ofRows(spark, sub).distinct()
          .limit(maxInlineSubqueryKeys + 1).collect()
        if (rows.length > maxInlineSubqueryKeys)
          // typed, not sys.error: the DELETE dispatcher re-routes the
          // canonical whole-condition shape join-based; every other
          // catcher rethrows and the message above is the refusal
          throw SubqueryBeyondInlineCap(values.head, sub,
            overflowMsg("IN"))
        if (rows.isEmpty) Literal(false)
        else In(values.head,
          rows.toSeq.map(r => Literal.create(r.get(0), out.dataType)))
      case e: Exists =>
        requireUncorrelated(e.outerAttrs, "EXISTS")
        Literal(!org.apache.spark.sql.GraftSqlBridge
          .ofRows(spark, refreshManifestRelations(e.plan, stmt))
          .isEmpty)
      case s: ScalarSubquery =>
        requireUncorrelated(s.outerAttrs, "scalar")
        val sub = refreshManifestRelations(s.plan, stmt)
        val out = sub.output.head
        val rows = org.apache.spark.sql.GraftSqlBridge
          .ofRows(spark, sub).limit(2).collect()
        require(rows.length <= 1,
          s"graft-manifest $stmt: scalar subquery returned more than " +
            "one row")
        Literal.create(rows.headOption.map(_.get(0)).orNull,
          out.dataType)
    }
  }

  /** Whether `cond` still carries a subquery expression (materialize
    * before classifying) — and whether it is READY to materialize
    * (everything resolved; an unresolved subquery waits for the
    * analyzer's next fixed-point pass). */
  private def hasSubquery(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[SubqueryExpression])

  /** The FULL clause family — `WHEN MATCHED [AND p] THEN
    * UPDATE/DELETE`, multiple ordered clauses, conditioned `WHEN NOT
    * MATCHED THEN INSERT *`, `WHEN NOT MATCHED BY SOURCE [AND p] THEN
    * UPDATE/DELETE`, composite `ON t.a = s.a AND t.b = s.b` keys —
    * classified onto [[ManifestTable.mergeClauses]]'s ordered-clause
    * engine — including PARTIAL-COLUMN `INSERT (cols) VALUES (…)`,
    * legitimate when every omitted column is nullable (the nulls are
    * then explicit semantics, not accidents; a non-nullable omission
    * is loud). Strict like everything here: any expression the
    * engine's rewrite frames cannot host re-resolves to a loud
    * error. */
  private def generalMerge(m: MergeIntoTable, path: String,
      schema: StructType): LogicalPlan = {
    import graft.sinks.ManifestTable.MergeClauseAction
    val cols = schema.fieldNames.toSet
    val tgtIds = m.targetTable.output.map(_.exprId).toSet
    val srcIds = m.sourceTable.output.map(_.exprId).toSet
    // each ON conjunct binds target.<key> = source.<key>, sides
    // resolved by attribute identity (the names may DIFFER —
    // `ON t.id = u.customer_id` is the warehouse norm); the source
    // key renames to the target's name below, so the engine's
    // by-name join sees one key vocabulary
    def sideName(e: Expression): Option[(Boolean, String)] =
      nameOf(e).flatMap { n =>
        val refs = e.references.toSeq.map(_.exprId)
        if (refs.nonEmpty && refs.forall(srcIds)) Some((true, n))
        else if (refs.nonEmpty && refs.forall(tgtIds)) Some((false, n))
        else None
      }
    def keysOf(cond: Expression): Seq[(String, String)] = cond match {
      case And(l, r) => keysOf(l) ++ keysOf(r)
      case EqualTo(a, b) =>
        (sideName(a), sideName(b)) match {
          case (Some((false, tn)), Some((true, sn))) => Seq((tn, sn))
          case (Some((true, sn)), Some((false, tn))) => Seq((tn, sn))
          case got => sys.error(
            "graft-manifest MERGE: every ON conjunct must be " +
              s"target.<key> = source.<key> on one column, got $got")
        }
      case other => sys.error(
        "graft-manifest MERGE: the ON condition must be a " +
          s"conjunction of key equalities, got ${other.sql}")
    }
    val keyPairs = keysOf(m.mergeCondition).distinct
    val keyCols = keyPairs.map(_._1).distinct
    // rename differing-name source keys to the target's vocabulary:
    // references keep their exprIds (Alias over the same attribute),
    // only the clause-expression scopes below must translate
    val renames = keyPairs.filter(p => p._1 != p._2)
    val renameByExprId: Map[
        org.apache.spark.sql.catalyst.expressions.ExprId, String] =
      (for {
        (tn, sn) <- renames
        a <- m.sourceTable.output if a.name == sn
      } yield a.exprId -> tn).toMap
    val sourcePlan: LogicalPlan =
      if (renames.isEmpty) m.sourceTable
      else {
        val srcNames = m.sourceTable.output.map(_.name).toSet
        renames.foreach { case (tn, sn) =>
          require(!srcNames.contains(tn),
            s"graft-manifest MERGE: the source already has a column " +
              s"'$tn' — renaming its key '$sn' to the target's name " +
              "would collide; alias the source explicitly")
        }
        Project(m.sourceTable.output.map { a =>
          renameByExprId.get(a.exprId) match {
            case Some(tn) => Alias(a, tn)()
            case None => a
          }
        }, m.sourceTable)
      }
    def srcNameOf(ar: AttributeReference): String =
      renameByExprId.getOrElse(ar.exprId, ar.name)
    // the three reference scopes a clause expression may see
    def matchedScope(ar: AttributeReference): Option[String] =
      if (srcIds(ar.exprId)) Some("_src_" + srcNameOf(ar))
      else if (tgtIds(ar.exprId)) Some(ar.name) else None
    def srcScope(ar: AttributeReference): Option[String] =
      if (srcIds(ar.exprId)) Some(srcNameOf(ar)) else None
    def tgtScope(ar: AttributeReference): Option[String] =
      if (tgtIds(ar.exprId)) Some(ar.name) else None
    def rebuild(e: Expression,
        scope: AttributeReference => Option[String], what: String)
        : org.apache.spark.sql.Column =
      rebuildSetValue(e, scope).getOrElse(sys.error(
        s"graft-manifest MERGE: unsupported $what expression " +
          s"(${e.sql}) — subqueries, non-deterministic functions, " +
          "and out-of-scope references must go through the " +
          "programmatic API"))
    def wholeRow(assigns: Seq[Assignment]): Boolean = {
      val pairs = assigns.map(a => (nameOf(a.key), nameOf(a.value)))
      pairs.forall {
        case (Some(k), Some(v)) => k == v
        case _ => false
      } && pairs.flatMap(_._1).toSet == cols &&
        assigns.forall(_.value match {
          case v: AttributeReference => !tgtIds(v.exprId)
          case _ => true
        })
    }
    val wholeRowSets = schema.fieldNames.toSeq
      .filterNot(keyCols.contains).map(c => (c, col(s"_src_$c")))
    def realSets(assigns: Seq[Assignment],
        scope: AttributeReference => Option[String], where: String)
        : Seq[(String, org.apache.spark.sql.Column)] = {
      // identity padding (SET c = c on the target side — the
      // analyzer's alignment) is a semantic no-op: dropped
      val real = assigns.filterNot { a =>
        (nameOf(a.key), a.value) match {
          case (Some(k), v: AttributeReference) if tgtIds(v.exprId) =>
            v.name == k
          case _ => false
        }
      }
      // an all-identity clause yields EMPTY sets: the engine treats
      // that as claim-the-row-change-nothing, preserving ordered-
      // clause reachability for the clauses after it. NESTED targets
      // (`SET meta.n = …`) fold onto their struct via withField,
      // same contract as UPDATE's (NULL parents stay NULL).
      foldNestedSets(schema,
        real,
        (a, what) => rebuild(a.value, scope,
          s"$where SET value for '$what'"),
        _.map { a =>
          val k = nameOf(a.key).getOrElse(sys.error(
            s"graft-manifest MERGE: $where SET target must be a " +
              s"plain (optionally nested) column, got ${a.key.sql}"))
          (k, rebuild(a.value, scope, s"$where SET value for '$k'"))
        })
    }
    val matched = m.matchedActions.map {
      case DeleteAction(cond) =>
        (cond.map(rebuild(_, matchedScope, "WHEN MATCHED AND")),
          MergeClauseAction.Delete: MergeClauseAction)
      case UpdateStarAction(cond) =>
        (cond.map(rebuild(_, matchedScope, "WHEN MATCHED AND")),
          MergeClauseAction.Update(wholeRowSets): MergeClauseAction)
      case UpdateAction(cond, assigns, _) =>
        val c = cond.map(rebuild(_, matchedScope, "WHEN MATCHED AND"))
        val act: MergeClauseAction =
          if (wholeRow(assigns)) MergeClauseAction.Update(wholeRowSets)
          else MergeClauseAction.Update(
            realSets(assigns, matchedScope, "WHEN MATCHED"))
        (c, act)
      case other => sys.error(
        s"graft-manifest MERGE: unsupported WHEN MATCHED action " +
          s"$other — supported: UPDATE SET … / UPDATE SET * / DELETE")
    }
    val notMatched: Seq[(Option[org.apache.spark.sql.Column],
        Option[Seq[(String, org.apache.spark.sql.Column)]])] =
      m.notMatchedActions.map {
        case InsertStarAction(cond) =>
          (cond.map(rebuild(_, srcScope, "WHEN NOT MATCHED AND")), None)
        case InsertAction(cond, assigns) if wholeRow(assigns) =>
          (cond.map(rebuild(_, srcScope, "WHEN NOT MATCHED AND")), None)
        case InsertAction(cond, assigns) =>
          // PARTIAL-COLUMN insert — `INSERT (cols) VALUES (…)`:
          // listed columns take their source-scoped expressions,
          // omitted columns take explicit typed NULLs. Legitimate
          // exactly when every omitted column is nullable (engine-
          // enforced too); the merge keys must be assigned — an
          // unkeyed insert row is an accident
          val names = assigns.map(a => nameOf(a.key).getOrElse(
            sys.error("graft-manifest MERGE: INSERT column must be " +
              s"a plain top-level column, got ${a.key.sql}")))
          val keyMissing = keyCols.filterNot(names.contains)
          if (keyMissing.nonEmpty) sys.error(
            "graft-manifest MERGE: a partial-column INSERT must " +
              s"assign the merge key(s) ${keyMissing
                .mkString("'", "', '", "'")} — an unkeyed row can " +
              "never be matched by a later merge")
          val sets = names.zip(assigns).map { case (n, a) =>
            (n, rebuild(a.value, srcScope,
              s"WHEN NOT MATCHED INSERT value for '$n'"))
          }
          (cond.map(rebuild(_, srcScope, "WHEN NOT MATCHED AND")),
            Some(sets))
        case other => sys.error(
          s"graft-manifest MERGE: unsupported WHEN NOT MATCHED " +
            s"action $other")
      }
    val bySource = m.notMatchedBySourceActions.map {
      case DeleteAction(cond) =>
        (cond.map(rebuild(_, tgtScope, "WHEN NOT MATCHED BY SOURCE AND")),
          MergeClauseAction.Delete: MergeClauseAction)
      case UpdateAction(cond, assigns, _) =>
        (cond.map(rebuild(_, tgtScope, "WHEN NOT MATCHED BY SOURCE AND")),
          MergeClauseAction.Update(realSets(assigns, tgtScope,
            "WHEN NOT MATCHED BY SOURCE")): MergeClauseAction)
      case other => sys.error(
        s"graft-manifest MERGE: unsupported WHEN NOT MATCHED BY " +
          s"SOURCE action $other — supported: UPDATE SET … / DELETE")
    }
    GraftManifestMergeClausesCommand(path, keyCols, sourcePlan,
      matched, notMatched, bySource)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case i: InsertIntoStatement if i.query.resolved =>
        i.table match {
          case ManifestTarget(path, schema) =>
            require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
              "graft-manifest SQL INSERT: PARTITION clauses are not " +
                "supported — manifest-stats pruning is this format's " +
                "partitioning story")
            if (i.userSpecifiedCols.isEmpty)
              GraftManifestInsertCommand(path, i.query, i.overwrite,
                i.byName)
            else {
              // partial-column INSERT — the same contract as MERGE's
              // partial-column insert clause (q160): every OMITTED
              // column must be NULLABLE, and the nulls written are
              // explicit typed semantics, never accidents. The column
              // list maps the query's output POSITIONALLY, then the
              // row is padded and reordered to the table schema.
              val cols = i.userSpecifiedCols
              require(cols.distinct.size == cols.size,
                "graft-manifest SQL INSERT: duplicate column in " +
                  cols.mkString("(", ", ", ")"))
              val byName = schema.fields.map(f => f.name -> f).toMap
              val unknown = cols.filterNot(byName.contains)
              require(unknown.isEmpty,
                s"graft-manifest SQL INSERT: column(s) " +
                  unknown.mkString("'", "', '", "'") +
                  " are not in the table schema " +
                  s"(${schema.fieldNames.mkString(", ")})")
              require(i.query.output.size == cols.size,
                s"graft-manifest SQL INSERT: the column list names " +
                  s"${cols.size} column(s) but the query produces " +
                  s"${i.query.output.size}")
              val colSet = cols.toSet
              val badOmit = schema.fields
                .filterNot(f => colSet(f.name)).filterNot(_.nullable)
              require(badOmit.isEmpty,
                s"graft-manifest SQL INSERT: the column list omits " +
                  "NON-NULLABLE column(s) " +
                  badOmit.map(_.name).mkString("'", "', '", "'") +
                  " — name them or make them nullable")
              val pos = cols.zipWithIndex.toMap
              val proj = schema.fields.map { f =>
                pos.get(f.name) match {
                  case Some(ix) => Alias(i.query.output(ix), f.name)()
                  case None => Alias(Literal(null, f.dataType), f.name)()
                }
              }.toIndexedSeq
              GraftManifestInsertCommand(path,
                Project(proj, i.query), i.overwrite, byName = true)
            }
          case _ => i
        }

      // a WHERE carrying a subquery waits until the analyzer has
      // resolved it (same fixed-point batch), then materializes at
      // rule time and re-enters the classification below
      case d @ DeleteFromTable(ManifestTarget(_, _), cond0)
          if hasSubquery(cond0) && !cond0.resolved => d
      case DeleteFromTable(t @ ManifestTarget(path, _), cond1) =>
        val condOrCmd: scala.Either[LogicalPlan, Expression] =
          if (!hasSubquery(cond1)) scala.Right(cond1)
          else try scala.Right(materializeSubqueries(cond1, "DELETE"))
          catch {
            // over-cap IN-subquery: the CANONICAL retention shape —
            // the IN is the WHOLE condition on a plain column —
            // auto-routes through the DataFrame-valued merge-on-read
            // delete instead of refusing (the key set never touches
            // the driver; zero data files rewrite). With DETERMINISTIC
            // residual conjuncts beside the IN, the route is the
            // frame-keyed copy-on-write delete (membership = key-frame
            // join, residual verbatim in the staged rewrite — a
            // key-only tombstone cannot carry a residual). Any other
            // shape (NOT IN, OR-joined membership, a residual with
            // its own subquery, casts) rethrows the loud MERGE
            // remedy, as does the knob.
            case cap: SubqueryBeyondInlineCap
                if subqueryJoinRouteEnabled =>
              cond1 match {
                case InSubquery(Seq(a: AttributeReference), _) =>
                  scala.Left(GraftManifestDeleteSubqueryKeysCommand(
                    path, a.name, cap.sub))
                // composite-key membership as the whole condition:
                // the tuple-frame copy-on-write route
                case InSubquery(vs, _)
                    if vs.forall(_.isInstanceOf[AttributeReference]) =>
                  scala.Left(GraftManifestDeleteTuplesSubqueryCommand(
                    path, vs.map(
                      _.asInstanceOf[AttributeReference].name),
                    cap.sub, None, Nil))
                case _ => peelSubqueryResidual(cond1, "DELETE") match {
                  case Some((Seq(k), rc, rconj)) =>
                    scala.Left(
                      GraftManifestDeleteSubqueryKeysWhereCommand(
                        path, k, cap.sub, rc, rconj))
                  case Some((ks, rc, rconj)) =>
                    scala.Left(GraftManifestDeleteTuplesSubqueryCommand(
                      path, ks, cap.sub, Some(rc), rconj))
                  case None => throw cap
                }
              }
          }
        condOrCmd match {
          case scala.Left(cmd) => cmd
          case scala.Right(cond) =>
        cond match {
          case Literal(true, _) => // DELETE FROM t (no WHERE)
            GraftManifestFullDeleteCommand(path)
          // a provably-false WHERE (an empty or non-matching
          // materialized subquery) deletes nothing
          case Literal(false, _) | Literal(null, _) =>
            GraftManifestNoopCommand(s"provably-empty DELETE on $path")
          // a STRING point/set delete (`WHERE id = 'CVE-…'`, the
          // reference's hottest mutation —
          // /root/reference/chatbot_pg/main.py:89) routes
          // MERGE-ON-READ: one tombstone write, zero data files
          // rewritten (deleteKeys). Integral ranges stay
          // copy-on-write below — the retention-delete shape where
          // whole expired dirs drop is exactly what deleteRange
          // does best.
          case StringKeyDelete(c, vals) =>
            if (vals.isEmpty)
              GraftManifestNoopCommand(s"all-NULL DELETE keys on $path")
            else GraftManifestDeleteKeysCommand(path, c, vals)
          // a scattered INTEGRAL point set (`id IN (3, 17, …)`) is
          // the same merge-on-read shape: a range delete would
          // rewrite every dir holding one key
          case IntKeyDelete(c, vals) =>
            if (vals.isEmpty)
              GraftManifestNoopCommand(s"all-NULL DELETE keys on $path")
            else GraftManifestDeleteIntKeysCommand(path, c, vals)
          // composite business-key point delete (`a = … AND b = …`):
          // one copy-on-write tuple delete, conjunctively dir-pruned
          case CompositePointKeys(keys) =>
            GraftManifestCompositeDmlCommand(path, keys, Nil)
          case _ =>
            try deleteRangeOf(cond) match {
              case Some((c, lo, hi)) =>
                GraftManifestDeleteCommand(path, c, lo, hi)
              case None => // provably-empty range
                GraftManifestNoopCommand(s"empty DELETE range on $path")
            } catch {
              // anything the fast paths can't denote exactly — mixed
              // conjuncts, ORs, non-integral ranges, function-wrapped
              // columns — routes the GENERAL predicate path: the
              // predicate runs verbatim in the rewrite, dirs prune by
              // the scan's own conjunct probe; only non-deterministic
              // or subquery predicates stay loud (generalWhere).
              // ONLY the extractor's typed signal reroutes — a real
              // defect inside it propagates
              case _: UnsupportedWhereShape =>
                val (c, conj) = generalWhere(cond, "DELETE")
                GraftManifestDeleteWhereCommand(path, c, conj)
            }
        }
        }

      // `UPDATE t SET col = expr [, …] WHERE <range|points|none>` —
      // routed through the staged-rewrite engine: matching rows are
      // patched IN PLACE (row order, clustering, untouched dirs all
      // survive), and dir pruning runs on the same recorded stats as
      // the equivalent DELETE's. The WHERE grammar is exactly the
      // DELETE grammar (strict; see deleteRangeOf/StringKeyDelete).
      // Left alone, Spark rejects UPDATE on a v1 relation outright —
      // this rule is the statement's only road.
      // same wait-for-resolution rule as DELETE's: a subquery in the
      // WHERE or a SET value must be resolved before it can
      // materialize
      case u: UpdateTable if (u.condition.exists(c =>
            hasSubquery(c) && !c.resolved) ||
          u.assignments.exists(a =>
            hasSubquery(a.value) && !a.value.resolved)) &&
          u.table.collectFirst {
            case ManifestTarget(p, _) => p }.isDefined => u
      case u: UpdateTable if u.assignments.nonEmpty &&
          u.assignments.forall(a => a.key.resolved && a.value.resolved) =>
        u.table match {
          case ManifestTarget(path, schema) =>
            // identity assignments (SET c = c — the analyzer's
            // assignment alignment pads untouched columns this way)
            // are semantic no-ops: drop them rather than rewrite
            // dirs to identical bytes. Uncorrelated subqueries in a
            // SET VALUE (`SET n = (SELECT max(n) …)`) materialize at
            // rule time like the WHERE's — same one-shot exactness
            val real = u.assignments.filterNot { a =>
              (nameOf(a.key), a.value) match {
                case (Some(k), v: AttributeReference) => v.name == k
                case _ => false
              }
            }.map { a =>
              if (hasSubquery(a.value))
                Assignment(a.key, materializeSubqueries(a.value, "UPDATE"))
              else a
            }
            // NESTED SET targets (`SET meta.n = expr`) fold onto
            // their top-level column through Column.withField —
            // Spark's own nested-update semantics: the leaf replaces
            // IN PLACE and a NULL parent struct stays NULL (never
            // silently materialized). Multiple leaves under one
            // struct chain onto one rebuild; a plain SET of the same
            // struct beside a nested one is a duplicate-column error
            // downstream (no defined order).
            def rebuilt(a: Assignment, what: String)
                : org.apache.spark.sql.Column =
              rebuildSetValue(a.value, ar => Some(ar.name))
                .getOrElse(sys.error(
                  "graft-manifest UPDATE: unsupported SET expression " +
                    s"for '$what' (${a.value.sql}) — subqueries and " +
                    "non-deterministic functions must go through the " +
                    "programmatic API"))
            val sets = foldNestedSets(schema, real, rebuilt,
              _.map { a =>
                val k = nameOf(a.key).getOrElse(sys.error(
                  "graft-manifest UPDATE: SET target must be a plain " +
                    "(optionally nested) column, got " + a.key.sql))
                (k, rebuilt(a, k))
              })
            if (sets.isEmpty)
              GraftManifestNoopCommand(s"identity-only UPDATE on $path")
            else scala.util.Try(u.condition.map(c =>
                if (hasSubquery(c) && c.resolved)
                  materializeSubqueries(c, "UPDATE")
                else c)) match {
              // over-cap IN-subquery: the canonical whole-condition
              // shape routes the frame-keyed copy-on-write update
              // (updateKeysFrame — keys stay distributed, only
              // key-overlapping dirs rewrite); deterministic residual
              // conjuncts ride the same route as an extra row gate
              // (patch only key-match AND residual-TRUE rows), with
              // pruning the intersection of key and residual probes;
              // other shapes rethrow the loud MERGE remedy, as does
              // the knob. Mirrors the DELETE dispatcher's routing.
              case scala.util.Failure(cap: SubqueryBeyondInlineCap)
                  if subqueryJoinRouteEnabled =>
                u.condition match {
                  case Some(InSubquery(
                      Seq(a: AttributeReference), _)) =>
                    GraftManifestUpdateSubqueryKeysCommand(path,
                      a.name, cap.sub, sets)
                  case Some(InSubquery(vs, _))
                      if vs.forall(
                        _.isInstanceOf[AttributeReference]) =>
                    GraftManifestUpdateTuplesSubqueryCommand(path,
                      vs.map(_.asInstanceOf[AttributeReference].name),
                      cap.sub, sets, None, Nil)
                  case Some(c) =>
                    peelSubqueryResidual(c, "UPDATE") match {
                      case Some((Seq(k), rc, rconj)) =>
                        GraftManifestUpdateSubqueryKeysCommand(path,
                          k, cap.sub, sets, Some(rc), rconj)
                      case Some((ks, rc, rconj)) =>
                        GraftManifestUpdateTuplesSubqueryCommand(path,
                          ks, cap.sub, sets, Some(rc), rconj)
                      case None => throw cap
                    }
                  case None => throw cap
                }
              case scala.util.Failure(e) => throw e
              case scala.util.Success(matCond) => matCond match {
              case None | Some(Literal(true, _)) =>
                GraftManifestUpdateCommand(path, None, sets)
              case Some(Literal(false, _)) | Some(Literal(null, _)) =>
                GraftManifestNoopCommand(
                  s"provably-empty UPDATE on $path")
              case Some(StringKeyDelete(c, vals)) =>
                if (vals.isEmpty) GraftManifestNoopCommand(
                  s"all-NULL UPDATE keys on $path")
                else GraftManifestUpdateCommand(path,
                  Some(scala.Right((c, vals))), sets)
              case Some(CompositePointKeys(keys))
                  if keys.forall(k => !sets.exists(_._1 == k._1)) =>
                // composite-key point UPDATE: the tuple's row patches
                // in place through the ordered-clause engine
                GraftManifestCompositeDmlCommand(path, keys, sets)
              case Some(cond) =>
                try deleteRangeOf(cond, "UPDATE") match {
                  case Some((c, lo, hi)) =>
                    GraftManifestUpdateCommand(
                      path, Some(scala.Left((c, lo, hi))), sets)
                  case None =>
                    GraftManifestNoopCommand(
                      s"empty UPDATE range on $path")
                } catch {
                  // general deterministic predicate — same routing
                  // rationale as DELETE's (typed signal only)
                  case _: UnsupportedWhereShape =>
                    val (c, conj) = generalWhere(cond, "UPDATE")
                    GraftManifestUpdateWhereCommand(path, c, conj, sets)
                }
            }
            }
          case _ => u
        }

      case m: MergeIntoTable if m.sourceTable.resolved =>
        m.targetTable match {
          case ManifestTarget(path, schema) =>
            require(!m.withSchemaEvolution,
              "graft-manifest MERGE: WITH SCHEMA EVOLUTION is not " +
                "supported — evolve via append(evolveSchema) first")
            // classification reads assignment SIDES and clause
            // conditions — wait for a later fixed-point pass until
            // everything is resolved rather than misread the statement
            val allActs = m.matchedActions ++ m.notMatchedActions ++
              m.notMatchedBySourceActions
            val ready = m.mergeCondition.resolved && allActs.forall {
              case UpdateAction(cond, assigns, _) =>
                cond.forall(_.resolved) &&
                  assigns.forall(a => a.key.resolved && a.value.resolved)
              case InsertAction(cond, assigns) =>
                cond.forall(_.resolved) &&
                  assigns.forall(a => a.key.resolved && a.value.resolved)
              case DeleteAction(cond) => cond.forall(_.resolved)
              case UpdateStarAction(cond) => cond.forall(_.resolved)
              case InsertStarAction(cond) => cond.forall(_.resolved)
              case _ => true
            }
            // the single-key, single-unconditional-clause shapes keep
            // their dedicated fast paths (whole-row merge /
            // column-wise mergeUpdate); everything else — clause
            // conditions, DELETE actions, multiple clauses, NOT
            // MATCHED BY SOURCE, composite keys — routes the general
            // ordered-clause engine below
            val simple = m.notMatchedBySourceActions.isEmpty &&
              (m.matchedActions match {
                case Seq() => true
                case Seq(UpdateStarAction(None)) => true
                case Seq(UpdateAction(None, assigns, _)) =>
                  // nested SET targets route the general engine
                  // (withField fold), not the fast path
                  assigns.forall(a => nameOf(a.key).isDefined)
                case _ => false
              }) &&
              (m.notMatchedActions match {
                case Seq() => true
                case Seq(InsertStarAction(None)) => true
                case Seq(InsertAction(None, assigns)) =>
                  // a PARTIAL-column or expression-valued insert is
                  // not the fast path's whole-row shape — route the
                  // general engine, which hosts explicit VALUES; only
                  // the identity whole-row form (every column, each
                  // from the same-named source column) stays simple
                  val tgtIds = m.targetTable.output.map(_.exprId).toSet
                  val pairs =
                    assigns.map(a => (nameOf(a.key), nameOf(a.value)))
                  pairs.forall {
                    case (Some(k), Some(v)) => k == v
                    case _ => false
                  } && pairs.flatMap(_._1).toSet ==
                    schema.fieldNames.toSet &&
                    assigns.forall(_.value match {
                      case v: AttributeReference => !tgtIds(v.exprId)
                      case _ => true
                    })
                case _ => false
              }) &&
              (m.mergeCondition match {
                // the fast paths assume target and source share the
                // key NAME; `ON t.a = u.b` routes the general engine
                // (which renames the source key to the target's)
                case EqualTo(a, b) =>
                  nameOf(a).zip(nameOf(b)).exists { case (x, y) => x == y }
                case _ => false
              })
            // uncorrelated subqueries in CLAUSE conditions or
            // assignment VALUES materialize at rule time (same
            // one-shot exactness as DELETE/UPDATE's); the rebuilt,
            // subquery-free statement classifies on the analyzer's
            // next fixed-point pass. The ON condition stays strict
            // (key equalities only — a subquery there is loud below).
            def matE(e: Expression): Expression =
              if (hasSubquery(e)) materializeSubqueries(e, "MERGE")
              else e
            def matA(as: Seq[Assignment]): Seq[Assignment] =
              as.map(a => Assignment(a.key, matE(a.value)))
            val actsHaveSub = allActs.exists {
              case UpdateAction(c, as, _) => c.exists(hasSubquery) ||
                as.exists(a => hasSubquery(a.value))
              case InsertAction(c, as) => c.exists(hasSubquery) ||
                as.exists(a => hasSubquery(a.value))
              case DeleteAction(c) => c.exists(hasSubquery)
              case UpdateStarAction(c) => c.exists(hasSubquery)
              case InsertStarAction(c) => c.exists(hasSubquery)
              case _ => false
            }
            if (!ready) m
            else if (actsHaveSub) m.copy(
              matchedActions = m.matchedActions.map {
                case UpdateAction(c, as, star) =>
                  UpdateAction(c.map(matE), matA(as), star)
                case DeleteAction(c) => DeleteAction(c.map(matE))
                case UpdateStarAction(c) => UpdateStarAction(c.map(matE))
                case other => other
              },
              notMatchedActions = m.notMatchedActions.map {
                case InsertAction(c, as) =>
                  InsertAction(c.map(matE), matA(as))
                case InsertStarAction(c) => InsertStarAction(c.map(matE))
                case other => other
              },
              notMatchedBySourceActions =
                m.notMatchedBySourceActions.map {
                  case UpdateAction(c, as, star) =>
                    UpdateAction(c.map(matE), matA(as), star)
                  case DeleteAction(c) => DeleteAction(c.map(matE))
                  case other => other
                })
            else if (!simple) generalMerge(m, path, schema)
            else {
              // accept `SET *` / `INSERT *` both before star
              // expansion and after the analyzer expanded it into the
              // per-column whole-row assignment list (same-name
              // source -> target, covering EVERY target column)
              val cols = schema.fieldNames.toSet
              val tgtIds = m.targetTable.output.map(_.exprId).toSet
              val srcIds = m.sourceTable.output.map(_.exprId).toSet
              def wholeRow(assigns: Seq[Assignment]): Boolean = {
                val pairs =
                  assigns.map(a => (nameOf(a.key), nameOf(a.value)))
                pairs.forall {
                  case (Some(k), Some(v)) => k == v
                  case _ => false
                } && pairs.flatMap(_._1).toSet == cols &&
                  // identity padding (value = TARGET column) is NOT a
                  // whole-row copy — only source-side values qualify
                  assigns.forall(_.value match {
                    case v: AttributeReference => !tgtIds(v.exprId)
                    case _ => true
                  })
              }
              def failActions(): Nothing = sys.error(
                "graft-manifest MERGE: the fast-path action shapes " +
                  "are the whole-row upsert (UPDATE SET * / INSERT " +
                  "*), the column-wise patch (UPDATE SET col = expr)," +
                  " and insert-if-absent — partial-column and " +
                  "expression-valued INSERTs route the general " +
                  "ordered-clause engine")
              if (m.notMatchedBySourceActions.nonEmpty) failActions()
              // None -> whole-row upsert; Some(sets) -> column-wise
              // patch (empty = no matched action at all)
              val matchedShape
                  : Option[Seq[(String, org.apache.spark.sql.Column)]] =
                m.matchedActions match {
                  case Seq() => Some(Nil)
                  case Seq(UpdateStarAction(None)) => None
                  case Seq(UpdateAction(None, assigns, _))
                      if wholeRow(assigns) => None
                  case Seq(UpdateAction(None, assigns, _)) =>
                    // identity assignments (SET c = c on the target
                    // side — the analyzer's alignment padding) are
                    // semantic no-ops: drop them
                    val real = assigns.filterNot { a =>
                      (nameOf(a.key), a.value) match {
                        case (Some(k), v: AttributeReference)
                            if tgtIds(v.exprId) => v.name == k
                        case _ => false
                      }
                    }
                    Some(real.map { a =>
                      val k = nameOf(a.key).getOrElse(sys.error(
                        "graft-manifest MERGE: UPDATE SET target " +
                          "must be a plain top-level column, got " +
                          a.key.sql))
                      val c = rebuildSetValue(a.value, ar =>
                        if (srcIds(ar.exprId)) Some("_src_" + ar.name)
                        else if (tgtIds(ar.exprId)) Some(ar.name)
                        else None).getOrElse(sys.error(
                        "graft-manifest MERGE: unsupported SET " +
                          s"expression for '$k' (${a.value.sql}) — " +
                          "subqueries and non-deterministic " +
                          "functions must go through the " +
                          "programmatic API"))
                      (k, c)
                    })
                  case _ => failActions()
                }
              val insert: Boolean = m.notMatchedActions match {
                case Seq() => false
                case Seq(InsertStarAction(None)) => true
                case Seq(InsertAction(None, assigns))
                    if wholeRow(assigns) => true
                case _ => failActions()
              }
              val key = m.mergeCondition match {
                case EqualTo(a, b) =>
                  (nameOf(a), nameOf(b)) match {
                    case (Some(x), Some(y)) if x == y => x
                    case got => sys.error(
                      "graft-manifest MERGE: the ON condition must " +
                        s"be target.<key> = source.<key> on one " +
                        s"column, got $got")
                  }
                case other => sys.error(
                  "graft-manifest MERGE: the ON condition must be a " +
                    s"single key equality, got ${other.sql}")
              }
              matchedShape match {
                case None if insert => // whole-row upsert
                  GraftManifestMergeCommand(path, key, m.sourceTable)
                case None =>
                  // whole-row update WITHOUT insert: patch every
                  // non-key column from the source in place — matched
                  // rows never migrate out of their dirs
                  GraftManifestMergeUpdateCommand(path, key,
                    m.sourceTable, schema.fieldNames.toSeq
                      .filterNot(_ == key)
                      .map(c => (c, col(s"_src_$c"))), insert = false)
                case Some(sets) if sets.isEmpty && !insert =>
                  sys.error("graft-manifest MERGE: the statement can " +
                    "have no effect — no real SET column and no " +
                    "INSERT action")
                case Some(sets) =>
                  GraftManifestMergeUpdateCommand(path, key,
                    m.sourceTable, sets, insert)
              }
            }
          case _ => m
        }
    }
}

/** `INSERT INTO` / `INSERT OVERWRITE` a manifest view: the query's
  * rows commit as one manifest append/overwrite, inheriting the
  * table's existing stats/bloom column discipline so SQL-ingested
  * commits prune exactly like API-ingested ones. */
final case class GraftManifestInsertCommand(path: String,
    query: LogicalPlan, overwrite: Boolean, byName: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftSqlBridge.ofRows(session, query)
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest INSERT: no committed version at $path"))
    val schema = ManifestTable.schemaOf(session, path, v).getOrElse(
      sys.error(s"graft-manifest INSERT: no schema sidecar at $path"))
    // INSERT resolves by POSITION (the SQL default; byName for
    // `INSERT INTO ... BY NAME`), with store-assignment casts to the
    // table's types — the same rule Spark applies to its own tables.
    // Positional alignment renames to fresh names FIRST so a query
    // with duplicate output names (legal in positional SQL:
    // `SELECT doc_id, doc_id`) never hits an ambiguity error.
    val aligned =
      if (byName) df.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType)).toSeq: _*)
      else {
        require(df.columns.length == schema.fields.length,
          s"graft-manifest INSERT: query has ${df.columns.length} " +
            s"column(s), table $path has ${schema.fields.length}")
        df.toDF(df.columns.indices.map(i => s"_graft_c$i"): _*)
          .select(schema.fields.zipWithIndex.map { case (f, i) =>
            col(s"_graft_c$i").cast(f.dataType).as(f.name)
          }.toSeq: _*)
      }
    // inherit the table's persisted pruning discipline (survives
    // overwrites and full deletes, unlike entry-derived key unions)
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, path, v)
    if (overwrite)
      ManifestTable.overwrite(session, aligned, path,
        statsCols = statsCols, bloomCols = bloomCols)
    else
      ManifestTable.append(session, aligned, path, statsCols = statsCols,
        bloomCols = bloomCols)
    Seq.empty
  }
}

/** The DELETE commands' shared METADATA-ONLY fast path: when the key
  * column is an identity-partition SOURCE of the table's spec,
  * `k = v` denotes exactly "drop the v partition" — zero rows read
  * or written, whatever the partition's size. Decided at RUN time
  * against the live table: if any data dir is partition-blind
  * (cluster output, pre-spec commits), [[ManifestTable.dropPartitions]]
  * refuses (typed [[ManifestTable.PartitionBlindException]]) and
  * this returns false — the caller's row-level path keeps the
  * delete exact. The Hive null sentinel is refused too: a row whose
  * key IS that literal string is not the null partition. A value
  * SET drops as ONE atomic commit ([[ManifestTable.dropPartitionsIn]])
  * — never a per-value commit loop a reader could observe torn. */
private[plans] object DropPartitionFastPath {
  def apply(session: SparkSession, path: String, keyCol: String,
      values: Seq[String]): Boolean = {
    import graft.sinks.PartitionTransform
    val identity = ManifestTable.latestVersion(session, path)
      .map(v => ManifestTable.partitionSpecOf(session, path, v))
      .getOrElse(Nil)
      .exists {
        case PartitionTransform.PIdentity(s) => s == keyCol
        case _ => false
      }
    if (!identity || values.isEmpty ||
        values.contains(PartitionTransform.NullValue)) false
    else
      try {
        // ONE commit for the whole value set — a per-value loop
        // would let a reader (or a crash) observe a torn DELETE
        // between commits
        ManifestTable.dropPartitionsIn(session, path, keyCol, values)
        true
      } catch {
        // typed: blind dirs exist, metadata cannot prove
        // disjointness — the caller's exact row-level path takes over
        case _: ManifestTable.PartitionBlindException => false
      }
  }
}

/** `DELETE FROM v WHERE <range>` → [[ManifestTable.deleteRange]]:
  * only dirs whose stats overlap are rewritten. A POINT delete
  * (`lo == hi`) on an identity-partition source column takes the
  * metadata-only partition drop instead ([[DropPartitionFastPath]]). */
final case class GraftManifestDeleteCommand(path: String, keyCol: String,
    lo: Long, hi: Long) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (lo != hi ||
        !DropPartitionFastPath(session, path, keyCol, Seq(lo.toString)))
      ManifestTable.deleteRange(session, path, keyCol, lo, hi)
    Seq.empty
  }
}

/** `DELETE FROM v WHERE k = '<lit>'` / `k IN (…)` on a string key →
  * metadata-only partition drop when `k` is an identity-partition
  * source ([[DropPartitionFastPath]]); otherwise
  * [[ManifestTable.deleteKeys]]: MERGE-ON-READ — one tombstone write
  * plus a metadata commit; no data file is rewritten, reads
  * anti-join the tombstone until a rewrite materializes it. */
final case class GraftManifestDeleteKeysCommand(path: String,
    keyCol: String, values: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import session.implicits._
    if (!DropPartitionFastPath(session, path, keyCol, values))
      ManifestTable.deleteKeys(session, values.toDF(keyCol), path, keyCol)
    Seq.empty
  }
}

/** The OVER-CAP subquery route: `DELETE FROM t WHERE col IN
  * (SELECT …)` whose key set exceeded the inline-literal cap runs
  * the SAME merge-on-read delete, with the key set staying a
  * DISTRIBUTED frame end-to-end — [[ManifestTable.deleteKeys]]
  * normalizes/dedups it, prunes dirs by stats+Blooms, and writes it
  * as the tombstone; zero data files rewrite and the driver never
  * holds the keys. `sub` is the statement's own refreshed subplan
  * (rule-time snapshot discipline, like the inline route's). The
  * subquery's output column renames to the target's key column; key
  * type compatibility is enforced loudly by deleteKeys itself. */
final case class GraftManifestDeleteSubqueryKeysCommand(path: String,
    keyCol: String, sub: LogicalPlan) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val keys = org.apache.spark.sql.GraftSqlBridge
      .ofRows(session, sub).toDF(keyCol)
    ManifestTable.deleteKeys(session, keys, path, keyCol)
    Seq.empty
  }
}

/** The RESIDUAL-conjunct variant of
  * [[GraftManifestDeleteSubqueryKeysCommand]]: `DELETE FROM t WHERE
  * col IN (SELECT …) AND <deterministic residual>` past the inline
  * cap — membership stays a distributed key-frame join, the residual
  * runs verbatim inside the staged rewrite, and the route is
  * honestly COPY-ON-WRITE (a key-only tombstone cannot carry a
  * residual); dirs prune by the intersection of the key and residual
  * probes ([[ManifestTable.deleteKeysFrameWhere]]). */
final case class GraftManifestDeleteSubqueryKeysWhereCommand(
    path: String, keyCol: String, sub: LogicalPlan,
    residual: org.apache.spark.sql.Column,
    residualConjuncts: Seq[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val keys = org.apache.spark.sql.GraftSqlBridge
      .ofRows(session, sub).toDF(keyCol)
    ManifestTable.deleteKeysFrameWhere(session, path, keyCol, keys,
      residual, residualConjuncts)
    Seq.empty
  }
}

/** COMPOSITE-key subquery DELETE — `DELETE FROM t WHERE (a, b) IN
  * (SELECT …) [AND residual]`: the tuple-frame copy-on-write route
  * ([[ManifestTable.deleteTuplesFrame]] — composite prune pass,
  * multi-column marker join, keys never on the driver). Composite
  * membership routes here at ANY size: there is no tuple
  * merge-on-read and no literal-inline form worth building. */
final case class GraftManifestDeleteTuplesSubqueryCommand(
    path: String, keyCols: Seq[String], sub: LogicalPlan,
    residual: Option[org.apache.spark.sql.Column],
    residualConjuncts: Seq[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val keys = org.apache.spark.sql.GraftSqlBridge
      .ofRows(session, sub).toDF(keyCols: _*)
    ManifestTable.deleteTuplesFrame(session, path, keyCols, keys,
      residual, residualConjuncts)
    Seq.empty
  }
}

/** COMPOSITE-key subquery UPDATE — [[ManifestTable
  * .updateTuplesFrame]]: the tuple twin of
  * [[GraftManifestUpdateSubqueryKeysCommand]]. */
final case class GraftManifestUpdateTuplesSubqueryCommand(
    path: String, keyCols: Seq[String], sub: LogicalPlan,
    sets: Seq[(String, org.apache.spark.sql.Column)],
    residual: Option[org.apache.spark.sql.Column],
    residualConjuncts: Seq[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val keys = org.apache.spark.sql.GraftSqlBridge
      .ofRows(session, sub).toDF(keyCols: _*)
    ManifestTable.updateTuplesFrame(session, path, keyCols, keys,
      sets, residual, residualConjuncts)
    Seq.empty
  }
}

/** The UPDATE twin of [[GraftManifestDeleteSubqueryKeysCommand]]:
  * `UPDATE t SET … WHERE col IN (SELECT …) [AND residual]` whose key
  * set exceeded the inline cap routes the frame-keyed COPY-ON-WRITE
  * update — one distributed prune pass scopes the rewrite to
  * key-overlapping dirs (intersected with the residual's probe when
  * one rides along), row matching is a marker join against the key
  * frame gated by the residual, and the driver never holds the keys
  * ([[ManifestTable.updateKeysFrame]]). */
final case class GraftManifestUpdateSubqueryKeysCommand(path: String,
    keyCol: String, sub: LogicalPlan,
    sets: Seq[(String, org.apache.spark.sql.Column)],
    residual: Option[org.apache.spark.sql.Column] = None,
    residualConjuncts: Seq[Expression] = Nil)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val keys = org.apache.spark.sql.GraftSqlBridge
      .ofRows(session, sub).toDF(keyCol)
    ManifestTable.updateKeysFrame(session, path, keyCol, keys, sets,
      residual = residual, residualConjuncts = residualConjuncts)
    Seq.empty
  }
}

/** The INTEGRAL twin of [[GraftManifestDeleteKeysCommand]]: a
  * scattered integral point set routes merge-on-read. The key frame
  * casts to the TABLE's exact key type at run time (deleteKeys is
  * loud on a type mismatch by design); literals outside the narrow
  * type's range — coercion artifacts that can match no row — are
  * dropped, not wrapped. */
final case class GraftManifestDeleteIntKeysCommand(path: String,
    keyCol: String, values: Seq[Long]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import session.implicits._
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest DELETE: no committed version at $path"))
    val dt = ManifestTable.schemaOf(session, path, v)
      .flatMap(_.fields.find(_.name == keyCol)).map(_.dataType)
      .getOrElse(sys.error(s"graft-manifest DELETE: no column " +
        s"'$keyCol' in the table schema at $path"))
    val fits: Long => Boolean = dt match {
      case org.apache.spark.sql.types.ByteType =>
        x => x >= Byte.MinValue && x <= Byte.MaxValue
      case org.apache.spark.sql.types.ShortType =>
        x => x >= Short.MinValue && x <= Short.MaxValue
      case org.apache.spark.sql.types.IntegerType =>
        x => x >= Int.MinValue && x <= Int.MaxValue
      case _ => _ => true
    }
    val keep = values.filter(fits)
    if (keep.nonEmpty)
      ManifestTable.deleteKeys(session,
        keep.toDF(keyCol).select(
          org.apache.spark.sql.functions.col(keyCol).cast(dt)
            .as(keyCol)),
        path, keyCol)
    Seq.empty
  }
}

/** `DELETE FROM v` (no WHERE): one atomic empty overwrite — the
  * watermark survives, old snapshots remain until vacuum. */
final case class GraftManifestFullDeleteCommand(path: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest DELETE: no committed version at $path"))
    val schema = ManifestTable.schemaOf(session, path, v).getOrElse(
      sys.error(s"graft-manifest DELETE: no schema sidecar at $path"))
    val empty = session.createDataFrame(
      session.sparkContext.emptyRDD[Row], schema)
    // carry the pruning discipline through the emptying overwrite so
    // later SQL INSERTs keep recording stats/filters
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, path, v)
    ManifestTable.overwrite(session, empty, path, statsCols = statsCols,
      bloomCols = bloomCols)
    Seq.empty
  }
}

/** A DELETE whose WHERE provably matches nothing: analysis-time no-op
  * (kept as a command so EXPLAIN shows the decision). */
final case class GraftManifestNoopCommand(why: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = Seq.empty
}

/** `DELETE FROM v WHERE <any deterministic, subquery-free
  * predicate>` → [[ManifestTable.deleteWhere]]: the predicate runs
  * VERBATIM in the staged rewrite (TRUE rows deleted, NULL/FALSE
  * survive), and dirs prune by the same conjunct probe the scan's
  * FileIndex runs — a stats-disjoint dir survives physically
  * untouched. `conjuncts` are the resolved WHERE conjuncts, carried
  * for pruning only; `cond` is the by-name rebuilt Column the
  * rewrite evaluates. */
final case class GraftManifestDeleteWhereCommand(path: String,
    cond: org.apache.spark.sql.Column, conjuncts: Seq[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    ManifestTable.deleteWhere(session, path, cond, conjuncts)
    Seq.empty
  }
}

/** `UPDATE v SET … WHERE <any deterministic, subquery-free
  * predicate>` → [[ManifestTable.updateWhere]]: matching rows are
  * patched in place, with the same pruning story as the general
  * DELETE's. */
final case class GraftManifestUpdateWhereCommand(path: String,
    cond: org.apache.spark.sql.Column, conjuncts: Seq[Expression],
    sets: Seq[(String, org.apache.spark.sql.Column)])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    ManifestTable.updateWhere(session, path, cond, conjuncts, sets)
    Seq.empty
  }
}

/** `UPDATE v SET col = expr [, …] WHERE <shape>` → the
  * [[ManifestTable]] update family, dispatched on the WHERE shape the
  * analysis rule extracted: `None` = whole table ([[ManifestTable
  * .updateAll]]), `Left((col, lo, hi))` = integral range
  * ([[ManifestTable.updateRange]]), `Right((col, keys))` = string
  * point set ([[ManifestTable.updateKeys]]). Matching rows are
  * patched in place; only stat-overlapping dirs rewrite. */
final case class GraftManifestUpdateCommand(path: String,
    where: Option[Either[(String, Long, Long), (String, Seq[String])]],
    sets: Seq[(String, org.apache.spark.sql.Column)])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    where match {
      case None => ManifestTable.updateAll(session, path, sets)
      case Some(scala.Left((c, lo, hi))) =>
        ManifestTable.updateRange(session, path, c, lo, hi, sets)
      case Some(scala.Right((c, keys))) =>
        ManifestTable.updateKeys(session, path, c, keys, sets)
    }
    Seq.empty
  }
}

/** `MERGE INTO v USING src ON v.k = src.k WHEN MATCHED THEN UPDATE
  * SET col = expr [, …] [WHEN NOT MATCHED THEN INSERT *]` →
  * [[ManifestTable.mergeUpdate]]: matched rows are PATCHED in place
  * (clustering survives, nothing migrates), not-matched source rows
  * land as one appended dir when `insert`. `sets` values reference
  * target columns by name and source columns as `_src_<name>` (the
  * rewrite engine's published alias). */
final case class GraftManifestMergeUpdateCommand(path: String,
    keyCol: String, source: LogicalPlan,
    sets: Seq[(String, org.apache.spark.sql.Column)], insert: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src =
      org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest MERGE: no committed version at $path"))
    // an inserted batch dir keeps the table's pruning discipline,
    // exactly like the whole-row merge command's
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, path, v)
    ManifestTable.mergeUpdate(session, src, path, keyCol, sets,
      insertNotMatched = insert, statsCols = statsCols,
      bloomCols = bloomCols)
    Seq.empty
  }
}

/** Composite business-key point DML — `DELETE FROM t WHERE a = …
  * AND b = …` / `UPDATE t SET … WHERE a = … AND b = …` — routed as a
  * single-tuple ordered-clause merge ([[ManifestTable.mergeClauses]]:
  * matched DELETE or matched UPDATE), so the conjunctive composite
  * dir prune applies and the touched dirs patch in place. An
  * integral literal outside its column's range provably matches
  * nothing (a no-op, never a wrapped cast that would hit the wrong
  * rows); a type-mismatched literal is loud. */
final case class GraftManifestCompositeDmlCommand(path: String,
    keys: Seq[(String, Either[Long, String])],
    sets: Seq[(String, org.apache.spark.sql.Column)])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.types._
    val stmt = if (sets.isEmpty) "DELETE" else "UPDATE"
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest $stmt: no committed version at $path"))
    val schema = ManifestTable.schemaOf(session, path, v).getOrElse(
      sys.error(s"graft-manifest $stmt: no schema sidecar at $path"))
    val fields = keys.map { case (c, _) =>
      schema.fields.find(_.name == c).getOrElse(sys.error(
        s"graft-manifest $stmt: no column '$c' in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    }
    def fits(x: Long, dt: DataType): Boolean = dt match {
      case ByteType => x.isValidByte
      case ShortType => x.isValidShort
      case IntegerType => x.isValidInt
      case LongType => true
      case _ => false
    }
    val vals: Seq[Option[Any]] = keys.zip(fields).map {
      case ((c, scala.Right(s)), f) =>
        require(f.dataType == StringType,
          s"graft-manifest $stmt: column '$c' is " +
            s"${f.dataType.catalogString} but the literal is a string")
        Some(s)
      case ((c, scala.Left(x)), f) =>
        require(f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }, s"graft-manifest $stmt: column '$c' is " +
          s"${f.dataType.catalogString} but the literal is integral")
        if (!fits(x, f.dataType)) None // out of range: matches nothing
        else Some(f.dataType match {
          case ByteType => x.toByte
          case ShortType => x.toShort
          case IntegerType => x.toInt
          case _ => x
        })
    }
    if (vals.exists(_.isEmpty)) return Seq.empty // provably-empty tuple
    val row = Row.fromSeq(vals.map(_.get))
    val df = session.createDataFrame(
      java.util.Collections.singletonList(row),
      StructType(fields.map(_.copy(metadata =
        org.apache.spark.sql.types.Metadata.empty))))
    val action: ManifestTable.MergeClauseAction =
      if (sets.isEmpty) ManifestTable.MergeClauseAction.Delete
      else ManifestTable.MergeClauseAction.Update(sets)
    ManifestTable.mergeClauses(session, df, path, keys.map(_._1),
      matched = Seq((None, action)))
    Seq.empty
  }
}

/** The general ordered-clause MERGE — conditioned clauses, DELETE
  * actions, NOT MATCHED BY SOURCE, composite keys —
  * → [[ManifestTable.mergeClauses]]. Clause conditions and SET values
  * arrive as Columns that re-resolve by name against the engine's
  * rewrite frames (target columns plain, source columns `_src_`-
  * aliased for matched clauses / plain for insert conditions). */
final case class GraftManifestMergeClausesCommand(path: String,
    keyCols: Seq[String], source: LogicalPlan,
    matched: Seq[(Option[org.apache.spark.sql.Column],
      ManifestTable.MergeClauseAction)],
    notMatched: Seq[(Option[org.apache.spark.sql.Column],
      Option[Seq[(String, org.apache.spark.sql.Column)]])],
    bySource: Seq[(Option[org.apache.spark.sql.Column],
      ManifestTable.MergeClauseAction)])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src =
      org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest MERGE: no committed version at $path"))
    // an inserted batch dir keeps the table's pruning discipline,
    // exactly like the other merge commands'
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, path, v)
    ManifestTable.mergeClauses(session, src, path, keyCols,
      matched = matched, notMatchedInsert = notMatched.map(_._1),
      notMatchedBySource = bySource, statsCols = statsCols,
      bloomCols = bloomCols, insertValues = notMatched.map(_._2))
    Seq.empty
  }
}

/** `MERGE INTO v USING src ON v.k = src.k WHEN MATCHED THEN UPDATE
  * SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[ManifestTable.merge]]: copy-on-write upsert, one staged rewrite
  * job over the touched dirs + one appended batch dir. */
final case class GraftManifestMergeCommand(path: String, keyCol: String,
    source: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val updates =
      org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    // the merged-in batch dir keeps the table's pruning discipline —
    // without this, every SQL MERGE would leave one filter-less dir
    // that point lookups conservatively read forever
    val v = ManifestTable.latestVersion(session, path).getOrElse(
      sys.error(s"graft-manifest MERGE: no committed version at $path"))
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, path, v)
    ManifestTable.merge(session, updates, path, keyCol,
      statsCols = statsCols, bloomCols = bloomCols)
    Seq.empty
  }
}
