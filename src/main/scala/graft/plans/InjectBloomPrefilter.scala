package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.optimizer.{ColumnPruning, ConstantFolding}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Automatic Bloom runtime join filter (VERDICT r8 #6): spot
  * `big ⋈ selective-dim` equi-joins and inject a Bloom probe of the
  * dim's keys into the big side BEFORE its shuffle, so the exchange
  * carries only (matching rows + an fpp-bounded false-positive tail)
  * instead of the whole fact table. q113 builds this by hand
  * ([[graft.operators.LayoutQueries.bloomPrefilterJoin]]); this rule is
  * the same cut applied by the optimizer to a PLAIN join — the form a
  * warehouse user gets for free (the reference's Snowflake side applies
  * join pruning automatically; here the optimizer earns it).
  *
  * Mechanism — identical plan shape to Spark's own `InjectRuntimeFilter`
  * (deliberately, see below):
  * {{{
  *   Filter(BloomFilterMightContain(
  *            ScalarSubquery(Aggregate(bloom_filter_agg(xxhash64(dimKey)))),
  *            xxhash64(bigKey)),
  *          bigSide)  ⋈  dimSide
  * }}}
  * The subquery runs once per query (a distributed treeAggregate of
  * fixed-size bit arrays — never a row collect), its result ships to
  * executors as a literal inside the plan, and the probe evaluates
  * inside the big side's scan stage under whole-stage codegen. The
  * exact join still runs afterward, so false positives die there and
  * the composed result is EXACTLY the plain join's.
  *
  * Why a graft rule when Spark 4 has `InjectRuntimeFilter` on by
  * default: the native rule fires only when the application side scans
  * ≥ 10 GB, the creation side is ≤ 10 MB, AND the creation side carries
  * a "likely selective" filter predicate. A curated key list — a dedup
  * survivor set, an allowlist, a filtered dim that arrived pre-filtered
  * from upstream — has no such predicate and never qualifies, yet the
  * shuffle cut is just as large. This rule decides from relative SIZE
  * (creation ≪ application), with every threshold a session conf, so
  * test-scale pins and 100 TB deployments tune the same knobs:
  *
  *  - `spark.graft.bloomJoin.enabled` (true) — master switch.
  *  - `spark.graft.bloomJoin.creationSideMaxBytes` (256 MB) — above
  *    this, building the filter costs more than it saves.
  *  - `spark.graft.bloomJoin.applicationSideMinBytes` (64 MB) — below
  *    this, the shuffle being cut is too small to matter.
  *  - `spark.graft.bloomJoin.minSizeRatio` (8) — application must be at
  *    least this many times the creation side.
  *  - `spark.graft.bloomJoin.maxExpectedItems` (4M) — cap on the
  *    filter's sizing estimate (BloomFilterAggregate additionally caps
  *    at Spark's `runtime.bloomFilter.maxNumItems`).
  *  - `spark.graft.bloomJoin.evenIfBroadcast` (false) — by default skip
  *    joins whose creation side can broadcast: a broadcast-hash join
  *    never shuffles the big side, so the probe would only add CPU.
  *
  * Native-rule compatibility: `InjectRuntimeFilter` runs AFTER the
  * Pre-CBO batch this rule is injected into, and its had-a-filter check
  * pattern-matches exactly the `BloomFilterMightContain(_,
  * XxHash64(key))`-under-`Filter` shape built here — so when both rules
  * would fire on one join, the native rule sees ours and stands down
  * (never a double probe). The reverse guard is [[alreadyFiltered]].
  *
  * Correctness invariants (spec-pinned in BloomInjectSpec):
  *  - never a false negative: the probe passes every true join key, the
  *    exact join removes false positives → results hash-identical to
  *    the plain join (q119's DuckDB oracle re-checks this end-to-end);
  *  - only join types where pre-filtering the chosen side cannot drop
  *    an output row (the dynamic-pruning prune-ability rules);
  *  - creation side must be deterministic and subquery-free — the
  *    filter and the join evaluate it independently, so a
  *    non-deterministic dim could produce false NEGATIVES;
  *  - idempotent: a side already probed on the same key is never
  *    probed again (the rule runs Once, but plans re-enter the
  *    optimizer under AQE and nested-view reuse).
  */
object InjectBloomPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def flag(key: String, dflt: Boolean): Boolean =
    conf.getConfString(s"spark.graft.bloomJoin.$key", dflt.toString).toBoolean
  private def num(key: String, dflt: Long): Long =
    conf.getConfString(s"spark.graft.bloomJoin.$key", dflt.toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flag("enabled", dflt = true)) plan
    else plan.transformUp {
      case j @ Join(_, _, _, Some(_), _) if !j.isStreaming => inject(j)
    }
  }

  /** Join types for which dropping non-matching LEFT rows cannot change
    * the result (mirrors dynamic partition pruning's prune-ability). */
  private def canFilterLeft(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | RightOuter => true
    case _ => false
  }

  private def canFilterRight(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftOuter => true
    case _ => false
  }

  /** Key types worth probing: fixed-width atomics and strings. (Any
    * type XxHash64 accepts would be CORRECT; float/interval keys are
    * not plausible join keys and binary/nested keys are better served
    * by the exact join alone.) */
  private def supportedKey(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** True when `side` already probes a Bloom filter on `key` — ours or
    * the native rule's (both hash the key with XxHash64). */
  private def alreadyFiltered(side: LogicalPlan, key: Expression): Boolean =
    side.exists {
      case Filter(cond, _) => cond.exists {
        case BloomFilterMightContain(_, XxHash64(Seq(k), _)) =>
          k.semanticEquals(key)
        case _ => false
      }
      case _ => false
    }

  /** The creation side is evaluated twice (subquery + join); anything
    * non-deterministic or subquery-bearing could disagree between the
    * two runs and turn the probe's false positives into false
    * NEGATIVES, so such plans are never used as a filter source. */
  private def safeCreationSide(p: LogicalPlan): Boolean =
    !p.exists(n => n.expressions.exists(e =>
      !e.deterministic || e.exists(_.isInstanceOf[SubqueryExpression])))

  private def inject(j: Join): Join = {
    val Join(left, right, joinType, Some(cond), _) = j: @unchecked
    val creationMax = num("creationSideMaxBytes", 256L << 20)
    val appMin = num("applicationSideMinBytes", 64L << 20)
    val ratio = num("minSizeRatio", 8L)
    val maxItems = num("maxExpectedItems", 4_000_000L)
    val evenIfBroadcast = flag("evenIfBroadcast", dflt = false)

    // equi-key pairs, normalized to (leftKey, rightKey)
    val keys = splitConjunctivePredicates(cond).collect {
      case EqualTo(l, r) if canEvaluate(l, left) && canEvaluate(r, right) =>
        (l, r)
      case EqualTo(l, r) if canEvaluate(l, right) && canEvaluate(r, left) =>
        (r, l)
    }.filter { case (l, r) => supportedKey(l) && supportedKey(r) }

    val leftSize = left.stats.sizeInBytes
    val rightSize = right.stats.sizeInBytes

    def eligible(app: LogicalPlan, creation: LogicalPlan,
        appKey: Expression, creationKey: Expression): Boolean = {
      val appSize = app.stats.sizeInBytes
      val creationSize = creation.stats.sizeInBytes
      appSize >= appMin &&
        creationSize <= creationMax &&
        appSize >= creationSize * ratio &&
        (evenIfBroadcast ||
          conf.autoBroadcastJoinThreshold < 0 ||
          creationSize > conf.autoBroadcastJoinThreshold) &&
        safeCreationSide(creation) &&
        !alreadyFiltered(app, appKey)
    }

    def probed(app: LogicalPlan, creation: LogicalPlan,
        appKey: Expression, creationKey: Expression): LogicalPlan = {
      // estimate the dim's key count for filter sizing: exact row count
      // when stats carry one (CBO / local relations), else bytes-based
      // (over-estimating only widens the filter, improving fpp)
      val estRows = creation.stats.rowCount.map(_.longValue)
        .getOrElse((creation.stats.sizeInBytes / 32).toLong)
      val items = math.max(4096L, math.min(estRows, maxItems))
      val bloomAgg = new BloomFilterAggregate(
        new XxHash64(Seq(creationKey)), items).toAggregateExpression()
      val aggPlan: LogicalPlan =
        Aggregate(Nil, Seq(Alias(bloomAgg, "graft_bloom_filter")()), creation)
      // the subquery keeps its own copy of the creation plan — prune it
      // to the key column so the build scan reads one column, not the
      // dim's full width (the join's copy is pruned by the main batches)
      val prunedAgg = ConstantFolding(ColumnPruning(aggPlan))
      Filter(
        BloomFilterMightContain(
          ScalarSubquery(prunedAgg), new XxHash64(Seq(appKey))),
        app)
    }

    // prefer filtering the LARGER side; require the size gates and a
    // prune-safe join type for that orientation
    val filterLeftFirst = leftSize >= rightSize
    val orientations =
      if (filterLeftFirst) Seq(true, false) else Seq(false, true)
    orientations.view.flatMap { filterLeft =>
      keys.collectFirst {
        case (lk, rk) if filterLeft && canFilterLeft(joinType) &&
            eligible(left, right, lk, rk) =>
          j.copy(left = probed(left, right, lk, rk))
        case (lk, rk) if !filterLeft && canFilterRight(joinType) &&
            eligible(right, left, rk, lk) =>
          j.copy(right = probed(right, left, rk, lk))
      }
    }.headOption.getOrElse(j)
  }
}
