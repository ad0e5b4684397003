package graft.sources

import graft.sinks.ManifestTable
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over one committed [[ManifestTable]] snapshot — the
  * piece that makes the manifest table a first-class SQL citizen
  * instead of a programmatic API.
  *
  * How it plugs in: Spark's `FileSourceStrategy` hands every file
  * scan's data filters to the relation's `FileIndex.listFiles`. A
  * plain parquet read answers from a directory listing; this index
  * answers from the MANIFEST — it extracts `[lo, hi]` bounds per
  * column from the pushed-down predicates and returns only the files
  * of data dirs whose recorded min/max overlap every bound. So
  * `WHERE doc_id BETWEEN 10 AND 60` in ordinary SQL prunes whole
  * commit dirs from one metadata read, before any file is opened —
  * the same planning shape Delta/Iceberg give their SQL users (the
  * reference's users get it by delegating SQL to Snowflake,
  * /root/reference/processor.py:55-58), with the row-level filter
  * still applied by the scan on top. Everything downstream is
  * Spark's own parquet scan: whole-stage codegen, parquet row-group
  * skipping, and `PushedFilters` all behave exactly as for a plain
  * parquet table.
  *
  * The snapshot is resolved at construction (immutable dirs + one
  * manifest read), so a relation, like every other manifest read,
  * keeps reading ITS snapshot no matter what commits afterwards.
  *
  * Merge-on-read deletes: a file-level index cannot anti-join
  * tombstones, so when the snapshot carries pending deletion vectors
  * ([[ManifestTable.Entry.dv]]) the relation is REWRITTEN at
  * resolution time by [[graft.plans.ManifestApplyDeletes]] into a
  * union of per-tombstone-group sub-relations with the anti-joins
  * applied. The sub-relations are built with the subset constructor
  * below (`applyDeletes = false`), which is both the rewrite's
  * building block and its termination guarantee — the rule never
  * matches a sub-relation. */
final class ManifestFileIndex private (spark: SparkSession,
    val tablePath: String, val version: Long,
    explicitEntries: Option[Seq[ManifestTable.Entry]],
    val applyDeletes: Boolean) extends FileIndex {

  def this(spark: SparkSession, tablePath: String, version: Long) =
    this(spark, tablePath, version, None, true)

  /** Subset index over explicit snapshot entries — the deletion-
    * vector rewrite's per-group scan (and the reason the rewrite
    * terminates: `applyDeletes = false` rules this index out of
    * another rewrite). */
  private[graft] def this(spark: SparkSession, tablePath: String,
      version: Long, subset: Seq[ManifestTable.Entry]) =
    this(spark, tablePath, version, Some(subset), false)

  private val entries =
    explicitEntries.getOrElse(
      ManifestTable.entriesOf(spark, tablePath, version))

  // the table's partition spec (one side-file read): listFiles turns
  // pushed filters on the TRANSFORM SOURCE columns into partition-
  // value constraints on each dir's recorded values — hidden
  // partitioning's whole point: the user filters `ts`, the engine
  // prunes `days(ts)` dirs, no partition column ever appears in SQL
  private val partSpec: Seq[graft.sinks.PartitionTransform] =
    scala.util.Try(
      ManifestTable.partitionSpecOf(spark, tablePath, version))
      .getOrElse(Nil)

  /** The pinned snapshot's manifest entries — what
    * [[graft.plans.ManifestMetadataAggs]] answers whole-table
    * COUNT/MIN/MAX from without touching a data file. Same snapshot
    * the scan would read: both come from THIS relation's immutable
    * version, so a concurrent commit can never make the metadata
    * answer diverge from the scan answer. */
  private[graft] def snapshotEntries: Seq[ManifestTable.Entry] = entries
  private val fs = new org.apache.hadoop.fs.Path(tablePath)
    .getFileSystem(spark.sessionState.newHadoopConf())

  // the scan file list comes from the MANIFEST's recorded per-entry
  // file lists — zero data-tree RPCs at relation construction or
  // listFiles time (the difference between manifest-BACKED and
  // manifest-BOUNDED planning: on a table with thousands of retained
  // commits, one serial listStatus per dir at every SQL plan is
  // exactly the O(files) cost the manifest exists to kill). Only
  // entries committed before file lists were recorded fall back to
  // one listing each; their next rewrite modernizes them.
  // FileStatus block size is nominal (splitting uses
  // spark.sql.files.maxPartitionBytes, not the block size) and mtime
  // is 0 (immutable dirs have no meaningful mtime).
  private val filesByDir: Seq[(ManifestTable.Entry,
      Seq[org.apache.hadoop.fs.FileStatus])] =
    entries.map { e =>
      // pre-upgrade entries fall back to the ONE shared data-file
      // listing helper (same filter predicate as every other consumer,
      // same probe counter), then both branches build FileStatus the
      // same way
      val named = e.files.getOrElse(
        ManifestTable.listDataFilesOf(fs, s"$tablePath/data/${e.dir}"))
      val fsz = named.toSeq.sortBy(_._1).map { case (name, len) =>
        new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L << 20,
          0L, new org.apache.hadoop.fs.Path(
            s"$tablePath/data/${e.dir}/$name"))
      }
      (e, fsz)
    }

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    Seq(new org.apache.hadoop.fs.Path(s"$tablePath/data"))

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val might = ManifestFileIndex.entryProbe(dataFilters, partSpec)
    val kept = filesByDir.filter { case (e, _) => might(e) }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.flatMap(_._2).toArray[org.apache.hadoop.fs.FileStatus]))
  }

  override def inputFiles: Array[String] =
    filesByDir.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // snapshot-pinned: nothing to refresh

  override def sizeInBytes: Long = filesByDir.flatMap(_._2.map(_.getLen)).sum
}

object ManifestFileIndex {

  /** The ONE entry-vs-conjuncts pruning probe — shared by
    * [[ManifestFileIndex.listFiles]] (scan-time dir pruning) and the
    * arbitrary-predicate DML path
    * ([[graft.sinks.ManifestTable.deleteWhere]] /
    * [[graft.sinks.ManifestTable.updateWhere]]), so "which dirs might
    * hold a matching row" can never drift between reads and writes.
    * Extraction runs ONCE over the conjuncts; the returned closure is
    * O(extracted) per entry. Widen-only by construction: every
    * extractor ignores shapes it can't prove (OR, functions over
    * columns, non-literal operands), so a kept dir may be a false
    * positive but a dropped dir can never hold a matching row. */
  private[graft] def entryProbe(dataFilters: Seq[Expression],
      partSpec: Seq[graft.sinks.PartitionTransform])
      : ManifestTable.Entry => Boolean = {
    val bounds = boundsOf(dataFilters)
    val sBounds = strBoundsOf(dataFilters)
    val points = pointsOf(dataFilters)
    val sPoints = strPointsOf(dataFilters)
    val (notNulls, isNulls) = nullnessOf(dataFilters)
    val natives =
      if (partSpec.isEmpty) Map.empty[String, Seq[Literal]]
      else nativePointsOf(dataFilters)
    val dayBounds =
      if (partSpec.isEmpty)
        Map.empty[String, (Option[String], Option[String])]
      else dayBoundsOf(dataFilters)
    val hourBounds =
      if (!partSpec.exists(_.isInstanceOf[
          graft.sinks.PartitionTransform.PHours]))
        Map.empty[String, (Option[String], Option[String])]
      else hourBoundsOf(dataFilters)
    (e: ManifestTable.Entry) =>
      bounds.forall { case (c, (lo, hi)) => e.mightOverlap(c, lo, hi) } &&
        sBounds.forall { case (c, (lo, hi)) =>
          e.mightOverlapStr(c, lo, hi) } &&
        // point sets (=, IN) additionally consult the dirs' Bloom
        // filters: SOME value must be possibly-present — integral and
        // string keys each probe their own type's filters
        points.forall { case (c, vs) => vs.exists(v =>
          e.mightOverlap(c, v, v) && e.mightContainPoint(c, v)) } &&
        sPoints.forall { case (c, vs) => vs.exists(v =>
          e.mightOverlapStr(c, Some(v), Some(v)) &&
            e.mightContainPointStr(c, v)) } &&
        // nullness pruning from the recorded per-dir null counts:
        // IsNotNull prunes provably-all-null dirs (and fires on every
        // value filter — Catalyst conjoins the guard), IsNull prunes
        // provably-null-free dirs
        notNulls.forall(c => e.mightHaveNonNull(c)) &&
        isNulls.forall(c => e.mightHaveNull(c)) &&
        // hidden-partition pruning: a PARTITION-PURE dir is kept only
        // if its recorded value can satisfy the filters on the
        // transform's SOURCE column; blind dirs (no recorded value)
        // are always kept — the row filter stays exact either way
        partSpec.forall(t => e.partition.get(t.field).forall(pv =>
          partitionMight(t, pv, bounds, points,
            sPoints, natives, dayBounds, hourBounds)))
  }

  private def intWidth(dt: org.apache.spark.sql.types.DataType)
      : Option[Int] = dt match {
    case org.apache.spark.sql.types.ByteType => Some(1)
    case org.apache.spark.sql.types.ShortType => Some(2)
    case org.apache.spark.sql.types.IntegerType => Some(4)
    case org.apache.spark.sql.types.LongType => Some(8)
    case _ => None
  }

  /** The column under WIDENING integral casts only (Catalyst inserts
    * those when a literal's type widens the column's). A narrowing
    * cast (CAST(longCol AS INT)) is value-CHANGING — under integer
    * wraparound a row far outside the literal's range can satisfy the
    * predicate, so stripping it would prune dirs that contain
    * matches. Anything non-integral contributes no column.
    *
    * NESTED fields resolve to their DOTTED stat path: a pushed
    * `meta.n > 5` arrives as GetStructField(meta#…, ordinal) and
    * yields "meta.n" — the key [[graft.sinks.ManifestTable]] records
    * nested leaf stats under, so nested-stat dirs prune exactly like
    * top-level ones. Null-semantics match: a null parent struct makes
    * the leaf null, and the recorded leaf null/min/max counts were
    * computed over the same col("a.b.c") projection. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case g: GetStructField =>
      attrOf(g.child).map(p => s"$p.${g.extractFieldName}")
    case c: Cast =>
      for {
        w1 <- intWidth(c.child.dataType)
        w2 <- intWidth(c.dataType)
        if w2 >= w1
        n <- attrOf(c.child)
      } yield n
    case _ => None
  }

  /** An integral literal's long value, gated on the literal's
    * DATATYPE, not just its runtime value class: a timestamp literal
    * is also a Long at runtime (epoch MICROseconds), and extracting
    * it would compare micros against whatever unit the stats were
    * recorded in — unsound pruning. Non-integral literals (fractional,
    * temporal, string) contribute no bound: conservative, the row
    * filter still runs. */
  private def longOf(l: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Long] =
    if (intWidth(dt).isEmpty) None
    else l match {
      case v: Byte => Some(v.toLong)
      case v: Short => Some(v.toLong)
      case v: Int => Some(v.toLong)
      case v: Long => Some(v)
      case _ => None
    }

  /** Per-column `[lo, hi]` bounds implied by the pushed conjuncts.
    * Only shapes whose implied range is SAFE to widen are extracted
    * (`>=`, `>`, `<=`, `<`, `=`, `IN`, nested `AND`); `>`/`<` are
    * treated as their inclusive forms — wider, never narrower, so
    * pruning can only keep extra dirs, never drop a matching one.
    * Anything else (OR at the top level, UDF-wrapped columns, …)
    * contributes no bound and prunes nothing. */
  private[graft] def boundsOf(conjuncts: Seq[Expression])
      : Map[String, (Long, Long)] = {
    val per = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def add(col: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = per.getOrElse(col, (Long.MinValue, Long.MaxValue))
      per.update(col, (math.max(l0, lo), math.min(h0, hi)))
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, Long.MaxValue)
      case GreaterThan(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, Long.MaxValue)
      case LessThanOrEqual(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Long.MinValue, x)
      case LessThan(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Long.MinValue, x)
      case EqualTo(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, x)
      case EqualTo(Literal(v, t), a) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, x)
      case GreaterThanOrEqual(Literal(v, t), a) => // v >= col  ==  col <= v
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Long.MinValue, x)
      case GreaterThan(Literal(v, t), a) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Long.MinValue, x)
      case LessThanOrEqual(Literal(v, t), a) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, Long.MaxValue)
      case LessThan(Literal(v, t), a) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, x, Long.MaxValue)
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        val xs = list.collect { case Literal(v, t) => longOf(v, t) }
        if (xs.nonEmpty && xs.forall(_.isDefined))
          attrOf(a).foreach(c =>
            add(c, xs.flatten.min, xs.flatten.max))
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap
  }

  /** Per-column point SETS implied by `=` and `IN` conjuncts on
    * integral columns — the shape Bloom-filter dir pruning consumes
    * (a range can't probe a Bloom; a point set can, value by value).
    * Same widen-only discipline: unsupported shapes contribute
    * nothing, and only this EXACT set semantics is returned (an IN's
    * envelope lives in [[boundsOf]] separately). */
  private[graft] def pointsOf(conjuncts: Seq[Expression])
      : Map[String, Seq[Long]] = {
    val per = scala.collection.mutable.Map.empty[String, Seq[Long]]
    def add(col: String, vs: Seq[Long]): Unit =
      // conjunct intersection: keep the SMALLER candidate set (any
      // value the dir must contain has to be in both)
      per.update(col, per.get(col) match {
        case Some(prev) => prev.intersect(vs)
        case None => vs
      })
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, Literal(v, t)) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Seq(x))
      case EqualTo(Literal(v, t), a) =>
        for (c <- attrOf(a); x <- longOf(v, t)) add(c, Seq(x))
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        val xs = list.collect { case Literal(v, t) => longOf(v, t) }
        if (xs.nonEmpty && xs.forall(_.isDefined))
          attrOf(a).foreach(c => add(c, xs.flatten))
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap
  }

  /** Per-column STRING point sets implied by `=` and `IN` conjuncts —
    * the shape the string-keyed Bloom filters consume, the twin of
    * [[pointsOf]]. Same conjunct-intersection and widen-only rules;
    * unsupported shapes contribute nothing. */
  private[graft] def strPointsOf(conjuncts: Seq[Expression])
      : Map[String, Seq[String]] = {
    val per = scala.collection.mutable.Map.empty[String, Seq[String]]
    def add(col: String, vs: Seq[String]): Unit =
      per.update(col, per.get(col) match {
        case Some(prev) => prev.intersect(vs)
        case None => vs
      })
    def strOf(v: Any): Option[String] = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case s: String => Some(s)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Seq(x))
      case EqualTo(Literal(v, _), a) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Seq(x))
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        val xs = list.collect { case Literal(v, _) => strOf(v) }
        if (xs.nonEmpty && xs.forall(_.isDefined))
          attrOf(a).foreach(c => add(c, xs.flatten))
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap
  }

  /** The columns the pushed conjuncts constrain to be (notNull,
    * isNull) — consumed against the manifest's recorded per-dir null
    * counts. Only top-level (AND-nested) bare-column shapes count;
    * the [[attrOf]] cast discipline applies (a widening integral cast
    * preserves nullness exactly — `CAST(c AS BIGINT) IS NULL` iff
    * `c IS NULL`). An OR, NOT, or anything else contributes nothing:
    * widen-only, a missed shape never prunes. */
  private[graft] def nullnessOf(conjuncts: Seq[Expression])
      : (Set[String], Set[String]) = {
    val nn = scala.collection.mutable.Set.empty[String]
    val in = scala.collection.mutable.Set.empty[String]
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case IsNotNull(a) => attrOf(a).foreach(nn += _)
      case IsNull(a) => attrOf(a).foreach(in += _)
      case _ => ()
    }
    conjuncts.foreach(walk)
    (nn.toSet, in.toSet)
  }

  /** Per-column string `[lo, hi]` bounds implied by the pushed
    * conjuncts — the categorical twin of [[boundsOf]] (`lang = 'es'`,
    * `source IN (...)`, prefix ranges). Same widen-only rules; the
    * ASCII comparability guard lives in `Entry.mightOverlapStr`, so a
    * non-ASCII literal flows through and simply never prunes. */
  private[graft] def strBoundsOf(conjuncts: Seq[Expression])
      : Map[String, (Option[String], Option[String])] = {
    val per = scala.collection.mutable.Map.empty[String, (String, String)]
    def add(col: String, lo: Option[String], hi: Option[String]): Unit = {
      val (l0, h0) = per.getOrElse(col, (null: String, null: String))
      val l1 = (Option(l0) ++ lo).reduceOption((a, b) =>
        if (a.compareTo(b) >= 0) a else b).orNull
      val h1 = (Option(h0) ++ hi).reduceOption((a, b) =>
        if (a.compareTo(b) <= 0) a else b).orNull
      per.update(col, (l1, h1))
    }
    def strOf(v: Any): Option[String] = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case s: String => Some(s)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Some(x), Some(x))
      case EqualTo(Literal(v, _), a) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Some(x), Some(x))
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Some(x), None)
      case GreaterThan(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, Some(x), None)
      case LessThanOrEqual(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, None, Some(x))
      case LessThan(a, Literal(v, _)) =>
        for (c <- attrOf(a); x <- strOf(v)) add(c, None, Some(x))
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        val xs = list.collect { case Literal(v, _) => strOf(v) }
        if (xs.nonEmpty && xs.forall(_.isDefined))
          attrOf(a).foreach(c => add(c, Some(xs.flatten.min),
            Some(xs.flatten.max)))
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap.map { case (c, (lo, hi)) =>
      c -> ((Option(lo), Option(hi)))
    }
  }

  /** Per-column point sets as LITERALS AT THE COLUMN'S NATIVE TYPE —
    * no cast-stripping, no widening: the attribute must be bare and
    * the literal's type must equal its exactly. This is what the
    * bucket transform needs — Spark's Murmur3 is TYPE-DEPENDENT
    * (int 5 and long 5 hash differently), so a literal that reached
    * the filter through any coercion must contribute nothing or the
    * derived bucket would be wrong and pruning would DROP matching
    * dirs. */
  private[graft] def nativePointsOf(conjuncts: Seq[Expression])
      : Map[String, Seq[Literal]] = {
    val per = scala.collection.mutable.Map.empty[String, Seq[Literal]]
    def add(col: String, vs: Seq[Literal]): Unit =
      per.update(col, per.get(col) match {
        case Some(prev) => prev.filter(p => vs.exists(_.semanticEquals(p)))
        case None => vs
      })
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a: AttributeReference, l @ Literal(v, t))
          if v != null && t == a.dataType => add(a.name, Seq(l))
      case EqualTo(l @ Literal(v, t), a: AttributeReference)
          if v != null && t == a.dataType => add(a.name, Seq(l))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall {
            case Literal(v, t) => v != null && t == a.dataType
            case _ => false
          } =>
        add(a.name, list.collect { case l: Literal => l })
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap
  }

  /** Per-column CALENDAR-DAY bounds implied by timestamp/date
    * comparisons — what prunes a `days(ts)` partitioning from a
    * filter on `ts` itself (months/years bounds are monotone
    * truncations of these; hours get their own finer extractor,
    * [[hourBoundsOf]]). Day granularity is the widening: `ts > X`
    * becomes `day >= dayOf(X)`, never narrower. Literals convert by
    * TYPE — the literal's type equals the source column's after
    * Catalyst coercion, so each rule pairs with the matching
    * `PartitionTransform.dayExprOf` branch that derived the recorded
    * values: a tz-aware TIMESTAMP literal by UTC epoch arithmetic, an
    * NTZ literal as a wall clock (the micros ARE the wall clock —
    * same floor-div), a DATE literal as its exact epoch day. Writer
    * and reader sessions in different timezones always agree.
    * Unsupported shapes contribute nothing. */
  private[graft] def dayBoundsOf(conjuncts: Seq[Expression])
      : Map[String, (Option[String], Option[String])] = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def dayOf(v: Any, dt: org.apache.spark.sql.types.DataType)
        : Option[String] = (dt, v) match {
      case (TimestampType | TimestampNTZType, micros: Long) =>
        Some(java.time.LocalDate
          .ofEpochDay(Math.floorDiv(micros, 86400000000L)).format(fmt))
      case (DateType, days: Int) =>
        Some(java.time.LocalDate.ofEpochDay(days.toLong).format(fmt))
      case _ => None
    }
    temporalBoundsOf(conjuncts, dayOf)
  }

  /** Per-column HOUR bounds ("yyyy-MM-dd-HH") implied by timestamp
    * comparisons — what prunes an `hours(ts)` partitioning. Same
    * type-pairing rule as [[dayBoundsOf]]: tz-aware literals take
    * the UTC hour, NTZ literals the wall-clock hour; DATE literals
    * contribute nothing (hours() rejects DATE sources at write). */
  private[graft] def hourBoundsOf(conjuncts: Seq[Expression])
      : Map[String, (Option[String], Option[String])] = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def hourOf(v: Any, dt: org.apache.spark.sql.types.DataType)
        : Option[String] = (dt, v) match {
      case (TimestampType | TimestampNTZType, micros: Long) =>
        val day = java.time.LocalDate
          .ofEpochDay(Math.floorDiv(micros, 86400000000L)).format(fmt)
        val h = Math.floorMod(
          Math.floorDiv(micros, 3600000000L), 24L)
        Some(f"$day-$h%02d")
      case _ => None
    }
    temporalBoundsOf(conjuncts, hourOf)
  }

  /** The shared comparison walker behind [[dayBoundsOf]] /
    * [[hourBoundsOf]]: folds every supported conjunct into per-column
    * closed string bounds under `unitOf`'s granularity (widening — a
    * strict bound stays inclusive at unit granularity, never
    * narrower). */
  private def temporalBoundsOf(conjuncts: Seq[Expression],
      unitOf: (Any, org.apache.spark.sql.types.DataType) => Option[String])
      : Map[String, (Option[String], Option[String])] = {
    def dayOf(v: Any, dt: org.apache.spark.sql.types.DataType)
        : Option[String] = unitOf(v, dt)
    val per = scala.collection.mutable
      .Map.empty[String, (String, String)]
    def add(col: String, lo: Option[String],
        hi: Option[String]): Unit = {
      val (l0, h0) = per.getOrElse(col, (null: String, null: String))
      val l1 = (Option(l0) ++ lo).reduceOption((a, b) =>
        if (a.compareTo(b) >= 0) a else b).orNull
      val h1 = (Option(h0) ++ hi).reduceOption((a, b) =>
        if (a.compareTo(b) <= 0) a else b).orNull
      per.update(col, (l1, h1))
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None // casts between temporal types shift semantics
    }
    // STRICT bounds tighten by one representable step BEFORE unit
    // conversion: `ts < X` means `ts <= X - 1µs`, so when X sits
    // exactly on a unit boundary the bound lands in the PREVIOUS
    // unit (`ts < '2024-01-01T00:00Z'` excludes all of 2024 from a
    // years() layout). Off-boundary literals keep the same unit —
    // still exact, never narrower than the predicate.
    def pred(v: Any): Option[Any] = v match {
      case m: Long => if (m == Long.MinValue) None else Some(m - 1)
      case d: Int => if (d == Int.MinValue) None else Some(d - 1)
      case _ => None
    }
    def succ(v: Any): Option[Any] = v match {
      case m: Long => if (m == Long.MaxValue) None else Some(m + 1)
      case d: Int => if (d == Int.MaxValue) None else Some(d + 1)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, Literal(v, t)) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, Some(d), Some(d))
      case EqualTo(Literal(v, t), a) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, Some(d), Some(d))
      case GreaterThanOrEqual(a, Literal(v, t)) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, Some(d), None)
      case GreaterThan(a, Literal(v, t)) =>
        for (c <- nameOf(a); w <- succ(v); d <- dayOf(w, t))
          add(c, Some(d), None)
      case LessThanOrEqual(a, Literal(v, t)) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, None, Some(d))
      case LessThan(a, Literal(v, t)) =>
        for (c <- nameOf(a); w <- pred(v); d <- dayOf(w, t))
          add(c, None, Some(d))
      case GreaterThanOrEqual(Literal(v, t), a) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, None, Some(d))
      case GreaterThan(Literal(v, t), a) => // X > a  ⟺  a < X
        for (c <- nameOf(a); w <- pred(v); d <- dayOf(w, t))
          add(c, None, Some(d))
      case LessThanOrEqual(Literal(v, t), a) =>
        for (c <- nameOf(a); d <- dayOf(v, t)) add(c, Some(d), None)
      case LessThan(Literal(v, t), a) => // X < a  ⟺  a > X
        for (c <- nameOf(a); w <- succ(v); d <- dayOf(w, t))
          add(c, Some(d), None)
      case _ => ()
    }
    conjuncts.foreach(walk)
    per.toMap.map { case (c, (lo, hi)) =>
      c -> ((Option(lo), Option(hi)))
    }
  }

  /** Whether a PARTITION-PURE dir whose `transform` value is `pv`
    * can satisfy the pushed filters on the transform's source
    * column. One-sided like every prune here: an un-derivable
    * constraint keeps the dir; a null-partition value (`NullValue`
    * sentinel) fails every VALUE constraint, which is sound — a
    * value predicate never matches null rows, and a pure null
    * partition holds only those. */
  private[graft] def partitionMight(t: graft.sinks.PartitionTransform,
      pv: String,
      bounds: Map[String, (Long, Long)],
      points: Map[String, Seq[Long]],
      sPoints: Map[String, Seq[String]],
      natives: Map[String, Seq[Literal]],
      dayBounds: Map[String, (Option[String], Option[String])],
      hourBounds: Map[String, (Option[String], Option[String])] =
        Map.empty)
      : Boolean = {
    import graft.sinks.PartitionTransform._
    val isNull = pv == NullValue
    // ISO temporal strings ("yyyy-MM-dd", "yyyy-MM", "yyyy",
    // "yyyy-MM-dd-HH") compare chronologically ONLY while the year is
    // plain four digits — a negative or five-digit year formats with
    // a sign/extra digit and breaks lexicographic order, so such a
    // value never prunes (kept conservatively, like every stat here)
    def isoComparable(s: String): Boolean =
      s.length >= 4 && s.take(4).forall(_.isDigit)
    def temporalMight(src: String, grain: Int,
        bs: Map[String, (Option[String], Option[String])]): Boolean =
      bs.get(src).forall { case (lo, hi) =>
        // a non-ISO-comparable recorded value (negative/5-digit year)
        // cannot be ordered lexicographically — KEEP the dir, exactly
        // as the comment above promises; only a comparable value may
        // prune. The null partition still prunes: these bounds come
        // from VALUE predicates, which no null row satisfies.
        !isNull && (!isoComparable(pv) ||
          (lo.forall(l => !isoComparable(l) || pv >= l.take(grain)) &&
            hi.forall(h => !isoComparable(h) || pv <= h.take(grain))))
      }
    t match {
      case PIdentity(src) =>
        // string equality/IN: the pure value must be in the set;
        // integral equality/IN and ranges: parse the canonical
        // cast-to-string form back (identity of an integral column
        // always round-trips)
        sPoints.get(src).forall(vs => !isNull && vs.contains(pv)) &&
          points.get(src).forall(vs => !isNull &&
            scala.util.Try(pv.toLong).toOption.exists(vs.contains)) &&
          bounds.get(src).forall { case (lo, hi) => !isNull &&
            scala.util.Try(pv.toLong).toOption
              .exists(v => v >= lo && v <= hi) }
      case PDays(src) => temporalMight(src, 10, dayBounds)
      // month/year values are monotone truncations of the day string
      // (equal-length ISO strings: prefix truncation preserves order),
      // so the day bounds truncate to exact month/year bounds
      case PMonths(src) => temporalMight(src, 7, dayBounds)
      case PYears(src) => temporalMight(src, 4, dayBounds)
      case PHours(src) => temporalMight(src, 13, hourBounds)
      case PBucket(n, src) =>
        natives.get(src).forall { lits =>
          !isNull && lits.exists { l =>
            val h = new org.apache.spark.sql.catalyst.expressions
              .Murmur3Hash(Seq(l)).eval(InternalRow.empty)
              .asInstanceOf[Int]
            (((h % n) + n) % n).toString == pv
          }
        }
      case PTruncate(len, src) =>
        sPoints.get(src).forall(vs => !isNull &&
          vs.exists(_.take(len) == pv))
    }
  }
}

/** The V1 streaming [[org.apache.spark.sql.execution.streaming.Sink]]
  * behind `writeStream.format("graft-manifest")`: each micro-batch is
  * one [[ManifestTable.append]] with the batchId as tag, so the
  * exactly-once watermark rides INSIDE the commit rename and a
  * replayed batch is skipped from one side-file read (no content
  * dedup, no state rewrite). The in-stream maintenance is vacuum —
  * metadata-only — on the same cadence contract as
  * `Streams.manifestSinkWriter`. */
final class ManifestStreamSink(path: String, statsCols: Seq[String],
    vacuumEvery: Int, keepVersions: Int, bloomCols: Seq[String] = Nil,
    partitionSpec: Seq[graft.sinks.PartitionTransform] = Nil,
    partitionFanout: Int = 1, vacuumMinAgeMillis: Long = 0L,
    branch: Option[String] = None,
    writerId: Option[String] = None)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    // a V1 sink's micro-batch is streaming-tagged and not directly
    // writable — re-tag it as a batch frame over the same rows; the
    // exactly-once skip + maintenance cadence is the ONE shared
    // implementation both streaming write paths use
    branch match {
      case Some(b) =>
        // stream-WAP through the format API: stage on the branch
        // under the same shared exactly-once step as
        // Streams.branchSinkWriter (see appendToBranchIfFresh)
        ManifestTable.appendToBranchIfFresh(data.sparkSession,
          org.apache.spark.sql.GraftSqlBridge.batchFrame(data), path,
          b, batchId, statsCols, bloomCols, writerId = writerId)
      case None =>
        ManifestTable.appendIfFresh(data.sparkSession,
          org.apache.spark.sql.GraftSqlBridge.batchFrame(data), path,
          batchId, statsCols, vacuumEvery, keepVersions, bloomCols,
          partitionSpec, partitionFanout, vacuumMinAgeMillis,
          writerId = writerId)
    }
    ()
  }

  override def toString: String =
    s"ManifestStreamSink[$path${branch.fold("")("@" + _)}]"
}

/** The V1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * behind `readStream.format("graft-manifest")`. Offsets ARE manifest
  * versions — the natural exactly-once cursor for a table whose
  * commits are atomic and totally ordered:
  *
  *  - `getOffset` is one version listing (metadata-sized);
  *  - `getBatch(start, end)` is the version-range diff
  *    `readSinceUntil(start, end)` — provenance-aware, so table
  *    maintenance between micro-batches never re-delivers drained
  *    rows, and a fold of UNdrained commits fails loudly instead of
  *    duplicating;
  *  - restart replays `(checkpointed, end]` bit-identically as long
  *    as vacuum retention covers the replay window; a vacuumed
  *    checkpoint names the re-bootstrap contract rather than
  *    silently re-reading the world.
  *
  * The first micro-batch bootstraps the whole table (start = None →
  * since 0), which is the Delta `readStream` convention: existing
  * content, then a commit-by-commit tail. Schema is pinned at query
  * start; batches select exactly those columns, so additive evolution
  * mid-stream is invisible (new columns ignored until the query
  * restarts) and a removed column fails loudly.
  *
  * `maxVersionsPerTrigger` bounds how many commit versions one
  * micro-batch may cover — the same back-pressure contract Kafka's
  * `maxOffsetsPerTrigger` gives its poll loop. Without it, a
  * bootstrap of a large table (or a consumer resuming after long
  * lag) materializes the WHOLE backlog as one micro-batch — at 100 TB
  * that is an unbounded unit of work and an unbounded recovery
  * replay. With it, the backlog drains as ceil(lag / max) batches,
  * each a pinned version-range diff, each individually
  * checkpoint-replayable.
  *
  * `maxRowsPerTrigger` bounds the same thing in the unit that
  * actually sizes a micro-batch — ROWS — using the exact per-dir row
  * counts the manifest records at commit time (no data read, no
  * estimate): versions are admitted into the batch until the next
  * one would push the fresh-row total past the cap. Version
  * granularity: a SINGLE commit larger than the cap still delivers
  * whole (progress is guaranteed — the first pending version is
  * always taken), and a version whose entries predate recorded row
  * counts conservatively ends the batch after itself.
  *
  * `maxBytesPerTrigger` is the third knob (Delta's trio), sized from
  * the manifest's recorded per-dir FILE sizes — the right unit when
  * row width varies wildly (documents vs events). Same version
  * granularity and guaranteed-progress rule. All three caps compose;
  * the tightest one wins. */
final class ManifestStreamSource(spark: SparkSession, path: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    maxRowsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    changeFeed: Boolean = false)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  // the highest version already handed to getBatch: the base the
  // rate limit advances from (a V1 getOffset has no start argument).
  // -1 = no batch yet this run; on restart the engine re-issues
  // getBatch for the checkpointed range before asking for new
  // offsets, which re-establishes this — so a resumed stream
  // rate-limits from its checkpoint, not from zero.
  //
  // CAVEAT (engine limitation, every rate-limited V1 source): under
  // Trigger.AvailableNow, Spark's wrapper snapshots ONE getOffset as
  // the drain's FINAL target — with any per-trigger cap set that is
  // the first CAPPED offset, so the drain stops short of the real
  // backlog. Drain rate-limited streams with processAllAvailable()
  // (or run continuously); use AvailableNow only without caps.
  private val lastSeen = new java.util.concurrent.atomic.AtomicLong(-1L)

  override def getOffset: Option[V1Offset] =
    ManifestTable.latestVersion(spark, path).map { latest =>
      val base = math.max(lastSeen.get(), 0L)
      val vCapped = maxVersionsPerTrigger match {
        case Some(max) =>
          // count through the RETAINED versions, not version
          // arithmetic: a vacuumed table's numbers are sparse below
          // the suffix, and `base + max` could name a vacuumed (=
          // unreadable) snapshot as the batch end
          val pending = ManifestTable.versions(spark, path)
            .filter(v => v > base && v <= latest)
          if (max >= pending.size.toLong || pending.isEmpty) latest
          else pending(max.toInt - 1)
        case None => latest
      }
      val rCapped = maxRowsPerTrigger match {
        case Some(budget) if vCapped > base =>
          sizeCappedEnd(base, vCapped, budget, _.rows)
        case _ => vCapped
      }
      val capped = maxBytesPerTrigger match {
        case Some(budget) if rCapped > base =>
          sizeCappedEnd(base, rCapped, budget,
            _.files.map(_.values.sum))
        case _ => rCapped
      }
      LongOffset(capped)
    }

  /** Highest version in `(base, limit]` whose cumulative FRESH size
    * — `sizeOf` per new dir (rows or bytes), new dirs by identity,
    * version over version, the same diff `getBatch` will read —
    * stays within `budget`; the first pending version is always
    * admitted so an oversized single commit can never stall the
    * stream. Cost per trigger: one small manifest read per version
    * considered — bounded by the cap itself, never by table size. */
  private def sizeCappedEnd(base: Long, limit: Long, budget: Long,
      sizeOf: ManifestTable.Entry => Option[Long]): Long = {
    val pending = ManifestTable.versions(spark, path)
      .filter(v => v > base && v <= limit)
    // the base snapshot's dirs (empty when base = 0 or vacuumed —
    // then the first diff counts a version's whole dir set:
    // over-counting only under-advances, never overflows the cap)
    var prevDirs = scala.util.Try(
        ManifestTable.entriesOf(spark, path, base))
      .toOption.map(_.map(_.dir).toSet).getOrElse(Set.empty[String])
    var end = base
    var spent = 0L
    pending.foreach { v =>
      if (end == base || spent <= budget) {
        val cur = ManifestTable.entriesOf(spark, path, v)
        val freshEntries = cur.filterNot(e => prevDirs.contains(e.dir))
        // a pre-upgrade entry without a recorded size ends the batch
        // after this version (unknown size must not be accumulated)
        val sizes = freshEntries.map(sizeOf)
        val fresh =
          if (sizes.forall(_.isDefined)) sizes.flatten.sum
          else budget + 1
        if (end == base || spent + fresh <= budget) {
          end = v
          spent += fresh
          prevDirs = cur.map(_.dir).toSet
        } else spent = budget + 1 // full: stop admitting
      }
    }
    end
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset)
      : org.apache.spark.sql.DataFrame = {
    val from = start.map(versionOf).getOrElse(0L)
    val until = versionOf(end)
    lastSeen.getAndUpdate(v => math.max(v, until))
    // changeFeed: the batch is the bounded DELETE/INSERT-normal-form
    // diff (readChanges) instead of the append diff — the stream
    // follows deletes and in-place updates a readSince consumer
    // would hit the mixed-lineage error on
    val batch =
      (if (changeFeed) ManifestTable.readChanges(spark, path, from, until)
       else ManifestTable.readSinceUntil(spark, path, from, until))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toSeq: _*)
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestStreamSource[$path]"
}

/** `spark.read.format("graft-manifest").load(tablePath)` — the
  * manifest table as an ordinary SQL-queryable relation. Options:
  * `versionAsOf` time-travels to a specific committed snapshot
  * (default: latest). Registered under the short name via the
  * DataSourceRegister service file, so the format string needs no
  * class name. The returned relation is a standard
  * [[HadoopFsRelation]] over a [[ManifestFileIndex]]: Catalyst plans
  * it with `FileSourceStrategy`, pushes filters to both the index
  * (dir pruning) and the parquet reader (row-group skipping), and
  * the data schema comes from the snapshot's persisted sidecar — an
  * empty snapshot is a readable empty relation. */
final class GraftManifestSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  /** `df.writeStream.format("graft-manifest").start(tablePath)` — the
    * fourth quadrant of the format (batch read/write, stream
    * read/write all through ONE format string): exactly-once
    * streaming ingest where each micro-batch commits as one data dir
    * + one atomically-renamed manifest carrying the batchId as its
    * tag, and a replayed batch (tag <= table watermark) is skipped
    * from one side-file read — the same mechanism as
    * `Streams.manifestSinkWriter`, reachable without writing a
    * `foreachBatch`. Options: `statsCols` / `bloomCols`
    * (comma-separated; per-dir min/max stats and point-lookup Bloom
    * filters, same as the batch write path), `vacuumEvery` /
    * `keepVersions` (in-stream metadata retention; 0 = never),
    * `.partitionBy(cols)` / `partitionSpec` option (hidden
    * partitioning at table creation — identity columns via the API,
    * derived transforms like `days:ts` via the option; the created
    * table lands partition-pure dirs every batch, ready for
    * [[ManifestTable.dropPartitions]] retention).
    * Append output mode only — a manifest table is an
    * append log; aggregations stream through `foreachBatch` where
    * update semantics are the caller's to define. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-manifest sink: only Append output mode is supported " +
        s"(got $outputMode) — a manifest table is an append log")
    val path = graft.catalog.GraftNames.resolve(
      sqlContext.sparkSession, parameters.getOrElse("path", sys.error(
        "graft-manifest: a table path or catalog.ns.table name is " +
          "required — .start(<tablePath>)")))
    // `.partitionBy(cols)` maps to identity transforms; the
    // `partitionSpec` option carries DERIVED transforms ("days:ts",
    // "bucket:16:id", comma-separated render forms) the DSv1
    // partitionBy API cannot express. Effective only when the first
    // batch CREATES the table — an existing table's spec governs, and
    // a mismatch fails loudly at append (never a silent layout fork).
    val specOpt = parameters.get("partitionSpec")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        .map(graft.sinks.PartitionTransform.parse))
      .getOrElse(Nil)
    require(partitionColumns.isEmpty || specOpt.isEmpty,
      "graft-manifest sink: give either .partitionBy(...) (identity " +
        "transforms) or the partitionSpec option (derived " +
        "transforms), not both")
    val partSpec =
      if (specOpt.nonEmpty) specOpt
      else partitionColumns.map(graft.sinks.PartitionTransform.PIdentity)
    // spreads one huge/skewed partition over up to N write tasks per
    // batch (row-content-salted, still one leaf dir per value)
    val partFanout = parameters.get("partitionFanout").map(_.toInt)
      .getOrElse(1)
    require(partFanout >= 1,
      s"graft-manifest sink: partitionFanout must be >= 1, got " +
        s"$partFanout")
    // the cadence vacuum's grace window: set above the longest write
    // when OTHER writers (a WAP stage, a concurrent appender) share
    // this table, so their in-flight dirs are never presumed orphans
    val vacMinAge = parameters.get("vacuumMinAgeMillis")
      .map(_.toLong).getOrElse(0L)
    val statsCols = parameters.get("statsCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val vacuumEvery = parameters.get("vacuumEvery").map(_.toInt).getOrElse(0)
    val keepVersions = parameters.get("keepVersions").map(_.toInt).getOrElse(2)
    // without this, streaming-built tables would silently get no
    // Bloom pruning at all — the exact interleaved-key ingest layout
    // the per-dir filters were added for
    val bloomCols = parameters.get("bloomCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    // stream-WAP through the format API: option("branch", name)
    // stages every micro-batch invisibly; the auditor fast-forwards.
    // Branch staging follows the TABLE's current partition spec and
    // does its maintenance at publish, so the main-path layout and
    // vacuum knobs cannot apply — loud, not ignored.
    val branch = parameters.get("branch").map(_.trim).filter(_.nonEmpty)
    if (branch.isDefined)
      require(partSpec.isEmpty && vacuumEvery == 0 && partFanout == 1,
        "graft-manifest sink: the branch option stages on the table's " +
          "own spec and publishes through fastForwardBranch — " +
          "partitionBy/partitionSpec/partitionFanout/vacuumEvery do " +
          "not apply to a staging stream; drop them")
    // the sink's writer identity for the single-writer skip check:
    // the stream's checkpoint location (unique per live stream)
    val writerId = parameters.get("checkpointLocation")
    new ManifestStreamSink(path, statsCols, vacuumEvery, keepVersions,
      bloomCols, partSpec, partFanout, vacMinAge, branch, writerId)
  }

  /** `spark.readStream.format("graft-manifest").load(tablePath)` —
    * the manifest table as a STREAMING source: offsets are committed
    * versions, each micro-batch is the bounded version-range diff
    * ([[ManifestTable.readSinceUntil]]), so the stream delivers every
    * commit's rows exactly once, rides the provenance chain through
    * table maintenance (a compaction of drained commits is not a
    * batch), and replays deterministically from a checkpoint as long
    * as retention covers the replay window (the Kafka-retention
    * analogy, here `vacuum keepVersions`). The table must have at
    * least one committed snapshot when the stream starts — the
    * persisted schema sidecar is the source schema, pinned for the
    * query's lifetime like every streaming source's. */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val path = graft.catalog.GraftNames.resolve(spark,
      parameters.getOrElse("path", sys.error(
        "graft-manifest: a table path or catalog.ns.table name is " +
          "required — .load(<tablePath>)")))
    val v = ManifestTable.latestVersion(spark, path).getOrElse(sys.error(
      s"graft-manifest stream: no committed version at $path — commit " +
        "once before starting the stream (the schema sidecar is the " +
        "source schema)"))
    val base = schema.orElse(ManifestTable.schemaOf(spark, path, v))
      .getOrElse(sys.error(s"graft-manifest stream: no schema sidecar " +
        s"at $path v$v (pre-sidecar table); pass .schema(...)"))
    // readChangeFeed: two metadata columns ride every row (the
    // Delta-CDF shape) — declared here so the engine plans them
    val full =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
    (shortName(), full)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val spark = sqlContext.sparkSession
    val path = graft.catalog.GraftNames.resolve(spark,
      parameters.getOrElse("path", sys.error(
        "graft-manifest: a table path or catalog.ns.table name is " +
          "required — .load(<tablePath>)")))
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxVersions.foreach(m => require(m > 0,
      s"graft-manifest stream: maxVersionsPerTrigger must be positive, got $m"))
    val maxRows = parameters.get("maxRowsPerTrigger").map(_.toLong)
    maxRows.foreach(m => require(m > 0,
      s"graft-manifest stream: maxRowsPerTrigger must be positive, got $m"))
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxBytes.foreach(m => require(m > 0,
      s"graft-manifest stream: maxBytesPerTrigger must be positive, got $m"))
    new ManifestStreamSource(spark, path,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      maxVersions, maxRows, maxBytes,
      changeFeed = parameters.get("readChangeFeed").exists(_.toBoolean))
  }

  /** `df.write.format("graft-manifest").mode(...).save(tablePath)` —
    * the write half of the SQL surface. Append commits one data dir +
    * manifest ([[ManifestTable.append]], schema-enforced); Overwrite
    * replaces content and schema in one atomic commit
    * ([[ManifestTable.overwrite]] — old snapshots survive until
    * vacuum, the watermark stays monotone). Options: `tag` (streaming
    * watermark, default -1), `statsCols` (comma-separated columns to
    * min/max-stat for dir pruning), `evolveSchema` (opt into additive
    * evolution on append). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = graft.catalog.GraftNames.resolve(spark,
      parameters.getOrElse("path", sys.error(
        "graft-manifest: a table path or catalog.ns.table name is " +
          "required — .save(<tablePath>)")))
    val tag = parameters.get("tag").map(_.toLong).getOrElse(-1L)
    val statsCols = parameters.get("statsCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val evolve = parameters.get("evolveSchema").exists(_.toBoolean)
    val bloomCols = parameters.get("bloomCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val exists = ManifestTable.latestVersion(spark, path).isDefined
    mode match {
      case SaveMode.Append =>
        ManifestTable.append(spark, data, path, tag, statsCols, evolve,
          bloomCols)
      case SaveMode.Overwrite =>
        ManifestTable.overwrite(spark, data, path, tag, statsCols)
      case SaveMode.ErrorIfExists if exists => sys.error(
        s"graft-manifest: table at $path already exists " +
          "(mode ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        ManifestTable.append(spark, data, path, tag, statsCols, evolve)
      case SaveMode.Ignore if exists => () // committed table wins
      case SaveMode.Ignore =>
        ManifestTable.append(spark, data, path, tag, statsCols, evolve)
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = graft.catalog.GraftNames.resolve(spark,
      parameters.getOrElse("path", sys.error(
        "graft-manifest: a table path or catalog.ns.table name is " +
          "required — .load(<tablePath>)")))
    require(Seq("versionAsOf", "timestampAsOf", "tagAsOf")
        .count(parameters.contains) <= 1,
      "graft-manifest: versionAsOf, timestampAsOf and tagAsOf are " +
        "mutually exclusive — a snapshot has one address")
    // timestampAsOf accepts epoch millis or an ISO-8601 instant
    // (2026-08-14T12:00:00Z) — resolution itself (latest retained
    // commit at-or-before, loud past the vacuum horizon) lives in
    // ManifestTable.versionAtTimestamp; tagAsOf resolves a named pin
    // (vacuum keeps tagged snapshots, so a tag read never dangles)
    val version = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { s =>
        val ms = s.toLongOption.getOrElse(
          java.time.Instant.parse(s).toEpochMilli)
        ManifestTable.versionAtTimestamp(spark, path, ms)
      })
      .orElse(parameters.get("tagAsOf").map { name =>
        ManifestTable.tags(spark, path).getOrElse(name, sys.error(
          s"graft-manifest: no tag '$name' at $path — existing: " +
            ManifestTable.tags(spark, path).keys.toSeq.sorted
              .mkString(", ")))
      })
      .getOrElse(
        ManifestTable.latestVersion(spark, path).getOrElse(sys.error(
          s"graft-manifest: no committed version at $path")))
    require(ManifestTable.versions(spark, path).contains(version),
      s"graft-manifest: versionAsOf=$version is not a committed " +
        s"snapshot at $path (never committed, or vacuumed)")
    val index = new ManifestFileIndex(spark, path, version)
    val schema0 = ManifestTable.schemaOf(spark, path, version).getOrElse(
      spark.read.parquet(index.inputFiles.headOption.getOrElse(sys.error(
        s"graft-manifest: no schema sidecar and no data files at " +
          s"$path v$version")): String).schema)
    // on a MAPPED snapshot (a rename/drop committed) the data schema
    // carries parquet field ids, so the reader resolves renamed
    // columns in old files by id — unmapped tables read by name
    // exactly as before
    val schema = ManifestTable.readSchemaFor(spark, path, version, schema0)
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = parameters)(spark)
  }
}
