package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** The row-level DML half of [[ManifestTable]], split out for size
  * (the staging/branch half lives in [[ManifestStagingOps]]): the
  * copy-on-write family (deleteRange, deleteWhere, updateWhere, the
  * update trio, merge, mergeUpdate, mergeClauses), the merge-on-read
  * keyed deletes (deleteKeys + rewriteDeletes), and the shared
  * keyed-dir pruning ([[dirsHitByKeys]]). A self-typed trait on the
  * object — one table format, one namespace, three files. */
private[sinks] trait ManifestDmlOps { self: ManifestTable.type =>

  /** Copy-on-write row-level delete of `[lo, hi]` on `statsCol`:
    * ONLY the data dirs whose recorded stats overlap the range are
    * rewritten (filtered, restatted on every column the entry had
    * stats for, possibly dropped entirely when emptied); every other
    * dir keeps its identity — no rewrite, no new files, same entry,
    * just copied into the new manifest. That is the delete shape a
    * 100 TB table needs: cost proportional to the data that CONTAINS
    * matches, not to the table (with a monotone stats column like
    * event time, a retention delete touches exactly the expired
    * dirs). Dirs without stats on `statsCol` are conservatively
    * rewritten (they might contain matches). Old snapshots still see
    * the deleted rows until [[vacuum]] — deletion is a new version,
    * not an edit. The table watermark is table-level metadata and
    * survives any delete (a replayed batch stays skipped even after
    * its rows were deliberately removed). Returns (new version, dirs
    * rewritten).
    *
    * `retries > 0` makes the commit optimistic ([[commitRewrite]]):
    * on a version conflict the delete REBASES onto the new latest iff
    * the recorded stats prove every concurrently-added dir is
    * disjoint from `[lo, hi]` — otherwise (the interloper may have
    * appended rows this delete should have removed) the conflict
    * propagates, because rebasing would silently miss them. */
  def deleteRange(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long, retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.deleteRange: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    // a long-range delete is only defined on an INTEGRAL key: on any
    // other type the row filter's cast would be lossy (or, under ANSI,
    // a runtime error mid-rewrite) and could delete rows far outside
    // [lo, hi] — fail loudly up front instead. The guard runs on
    // [[tableSchema]] (sidecar, or inferred from a readable dir), so a
    // pre-sidecar migrated table is guarded too, not silently skipped.
    schema.fields.find(_.name == statsCol).foreach { f =>
      require(isIntegral(f.dataType),
        s"ManifestTable.deleteRange: '$statsCol' is " +
          s"${f.dataType.catalogString}, not an integral type — a " +
          "long-range delete is only defined on integral keys")
    }
    val (touch0, keep0) = entries.partition(_.mightOverlap(statsCol, lo, hi))
    // a file-less dir (empty-batch commit) holds nothing to delete —
    // keep its entry untouched instead of crashing on a schema-less
    // read
    val (touch, keepEmpty) = touch0.partition(e =>
      e.hasData(fs, s"$path/data/${e.dir}"))
    val keep = keep0 ++ keepEmpty
    val v = prev + 1
    // ONE staged job rewrites every touched dir (union-scanned,
    // dir-tagged, grouped restat — see stagedRewrite), instead of the
    // per-dir write+restat loop that paid k serialized job latencies
    // for a delete straddling k dirs. Null keys are never "in range"
    // — they must survive a range delete (a bare !between would
    // evaluate null and drop them); a fully-deleted dir has no staged
    // output and drops out of the new manifest.
    val rewritten = stagedRewrite(spark, path, v, schema, touch,
      "deleteRange",
      _.filter(col(statsCol).isNull ||
        !col(statsCol).cast("long").between(lo, hi)),
      extraRestatCols = Seq(statsCol))
    val committed = commitRewrite(spark, path, "deleteRange", prev,
      entries, touch.map(_.dir).toSet, rewritten, schema, Nil, Nil,
      retries,
      added => added.forall(e => !e.mightOverlap(statsCol, lo, hi) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, touch.size)
  }

  /** Copy-on-write `DELETE FROM t WHERE <any deterministic,
    * subquery-free predicate>` — the first statement a migrating
    * Delta/Iceberg user writes (`WHERE lang = 'de' AND n_chars >
    * 5000`), and the generalization [[deleteRange]]/[[deleteKeys]]
    * are the fast paths of. Dir pruning runs the SAME probe the
    * scan's FileIndex runs on pushed filters
    * ([[graft.sources.ManifestFileIndex.entryProbe]] over
    * `pruneConjuncts`, the predicate's resolved conjuncts): recorded
    * min/max envelopes, string bounds, Bloom point probes, null
    * counts, and hidden-partition values all participate, so a
    * stats-disjoint dir survives PHYSICALLY untouched. Rows where
    * the predicate is NULL or FALSE survive (SQL DELETE deletes
    * exactly the TRUE rows); only overlapping dirs rewrite, in ONE
    * staged job ([[stagedRewrite]]). `cond` re-resolves BY NAME
    * against the table's columns — the caller (the SQL rule, or a
    * programmatic user) passes a Column built from plain column
    * names. Returns (new version, dirs rewritten).
    *
    * `retries > 0` rebases optimistically iff the probe proves every
    * concurrently-added dir cannot hold a matching row — otherwise
    * the conflict propagates (the interloper may have appended rows
    * this delete should have removed). */
  def deleteWhere(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column,
      pruneConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.deleteWhere: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    // the predicate must TYPE-CHECK as a boolean over the table's
    // columns — validated on a zero-row frame before any work (a
    // mistyped column name or non-boolean expression is loud here,
    // never a half-rewritten table)
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val dt = probe.select(cond).schema.head.dataType
    require(dt == org.apache.spark.sql.types.BooleanType,
      s"ManifestTable.deleteWhere: the predicate has type " +
        s"${dt.catalogString}, not boolean")
    val might = graft.sources.ManifestFileIndex.entryProbe(
      pruneConjuncts, partitionSpecOf(spark, path, prev))
    val touch = entries.filter(e => might(e) &&
      e.hasData(fs, s"$path/data/${e.dir}"))
    if (touch.isEmpty) return (prev, 0)
    val v = prev + 1
    // keep = NOT (cond IS TRUE): null-evaluating rows survive, the
    // SQL DELETE contract (a bare !cond would evaluate null on them
    // and drop them)
    val rewritten = stagedRewrite(spark, path, v, schema, touch,
      "deleteWhere",
      _.filter(!coalesce(cond, lit(false))),
      extraRestatCols = pruneConjuncts.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name
      }).distinct)
    val committed = commitRewrite(spark, path, "deleteWhere", prev,
      entries, touch.map(_.dir).toSet, rewritten, schema, Nil, Nil,
      retries,
      added => added.forall(e => !might(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, touch.size)
  }

  /** Copy-on-write `UPDATE … SET … WHERE <any deterministic,
    * subquery-free predicate>` — the general-WHERE twin of
    * [[deleteWhere]] over the one [[updateImpl]] engine: matching
    * rows are patched IN PLACE (row order, clustering, untouched
    * dirs survive), dir pruning runs the scan's own conjunct probe,
    * and rows where the predicate is NULL or FALSE keep their
    * values. See [[updateImpl]] for the SET contract. Returns (new
    * version, dirs rewritten). */
  def updateWhere(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column,
      pruneConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression],
      sets: Seq[(String, org.apache.spark.sql.Column)],
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.updateWhere: no committed version at $path"))
    val schema = tableSchema(spark, path, prev, entriesOf(spark, path, prev))
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val dt = probe.select(cond).schema.head.dataType
    require(dt == org.apache.spark.sql.types.BooleanType,
      s"ManifestTable.updateWhere: the predicate has type " +
        s"${dt.catalogString}, not boolean")
    val might = graft.sources.ManifestFileIndex.entryProbe(
      pruneConjuncts, partitionSpecOf(spark, path, prev))
    updateImpl(spark, path, "updateWhere", sets, cond,
      e => might(e),
      added => added.forall(e => !might(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")), retries)
  }

  /** MERGE-ON-READ equality delete (the deletion-vector shape of
    * Delta/Iceberg): delete every row whose `keyCol` is in `keys`
    * WITHOUT rewriting a single data file. The key set is written
    * once as a small TOMBSTONE dir under `<table>/deletes/`, and the
    * manifest entries of the dirs that might contain the keys
    * (pruned by recorded bounds, an exact per-dir probe pass, and —
    * for small key sets — the per-dir Bloom filters) get a pending
    * deletion-vector reference; every read path anti-joins the
    * tombstones before surfacing those dirs' rows. That is the
    * delete shape a 100 TB table needs for SCATTERED keys: a
    * copy-on-write [[deleteRange]] of k scattered ids rewrites every
    * dir that holds one (full bytes), while this costs one key-set
    * write + one metadata commit — the read tax is a broadcast
    * anti-join against an update-batch-sized key set, and
    * [[rewriteDeletes]] / [[compact]] / any rewrite of the dir
    * materializes and clears it.
    *
    * Semantics: equality delete on the CURRENT snapshot — a row with
    * key k is deleted from every dir committed so far; a key
    * RE-INSERTED by a later append survives (its fresh dir carries no
    * tombstone — dv scoping is per-dir, which is what makes
    * merge-on-read sound under continued ingest). Null keys in
    * `keys` are dropped (a null equals no row). `keyCol` must be an
    * integral or string column and `keys` must carry it at the
    * table's exact type (a lossy cast could delete the wrong rows).
    * Keys absent from the table commit nothing (no tombstone, no new
    * version). While tombstones are pending, the touched dirs'
    * recorded stats describe physical content — still one-sidedly
    * valid for pruning, but metadata-only aggregates stand down
    * ([[graft.plans.ManifestMetadataAggs]]).
    *
    * Returns (version, dirs tombstoned) — (current, 0) when no dir
    * can contain a key. `retries > 0` rebases optimistically: an
    * interloper's APPEND always rebases (the rebase realizes the
    * valid serial order "delete, then append" — a re-inserted key
    * survives by the scoping rule above), while a concurrent rewrite
    * or concurrent delete touching the same dirs conflicts loudly
    * ([[commitRewrite]]'s reference and dv-identity checks). */
  def deleteKeys(spark: SparkSession, keys: DataFrame, path: String,
      keyCol: String, retries: Int = 0,
      autoRewriteGroups: Int =
        graft.plans.ManifestApplyDeletes.GroupWarnThreshold)
      : (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.deleteKeys: no committed version at $path"))
    require(schemaOf(spark, path, prev).isDefined,
      s"ManifestTable.deleteKeys: no schema sidecar at $path — a " +
        "pre-upgrade table must commit once before merge-on-read " +
        "deletes (the read path needs the persisted schema)")
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val f = schema.fields.find(_.name == keyCol).getOrElse(sys.error(
      s"ManifestTable.deleteKeys: no column '$keyCol' in the table " +
        s"schema (${schema.fieldNames.mkString(", ")})"))
    val isStr = f.dataType == org.apache.spark.sql.types.StringType
    require(isStr || isIntegral(f.dataType),
      s"ManifestTable.deleteKeys: '$keyCol' is " +
        s"${f.dataType.catalogString} — equality deletes are defined " +
        "on integral and string keys")
    val kf = keys.schema.fields.find(_.name == keyCol).getOrElse(
      sys.error(s"ManifestTable.deleteKeys: keys frame has no column " +
        s"'$keyCol'"))
    require(kf.dataType.catalogString == f.dataType.catalogString,
      s"ManifestTable.deleteKeys: keys column '$keyCol' is " +
        s"${kf.dataType.catalogString} but the table's is " +
        s"${f.dataType.catalogString} — a lossy cast could delete the " +
        "wrong rows; cast explicitly at the call site")
    // normalized, null-free, deduped — materialized once: it feeds
    // the prune pass and the tombstone write
    val batch = keys.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct().localCheckpoint()
    // ONE prune pass ([[dirsHitByKeys]]: envelope, exact range probe,
    // Bloom consultation — the prune that works on interleaved
    // layouts, the exact workload scattered-key deletes are)
    val (touch, _, nKeys) =
      dirsHitByKeys(spark, path, entries, batch, keyCol, isStr)
    if (nKeys == 0 || touch.isEmpty)
      return (prev, 0) // no key, or no dir can hold one: no-op
    val v = prev + 1
    // the tombstone is immutable and attempt-unique like a data dir;
    // the version prefix is cosmetic (readers resolve through dv refs)
    val tomb = f"t$v%08d_${java.util.UUID.randomUUID.toString.take(8)}"
    batch.repartition(1).write.mode("overwrite")
      .parquet(s"$path/deletes/$tomb")
    val produced = touch.map(e => e.copy(dv = e.dv + (tomb -> keyCol)))
    val committed = commitRewrite(spark, path, "deleteKeys", prev,
      entries, touch.map(_.dir).toSet, produced, schema, Nil, Nil,
      retries, _ => true)
    // SELF-LIMITING merge-on-read: past `autoRewriteGroups` distinct
    // pending tombstone SETS, the read plan unions one sub-scan per
    // set — so once this delete pushes the table past the threshold,
    // materialize the backlog right here (one bounded rewrite job)
    // instead of letting an unmaintained delete loop degrade every
    // reader without bound. The read stays correct at any width;
    // this caps the WIDTH. Opt out with Int.MaxValue and run
    // [[rewriteDeletes]] on your own cadence.
    val dvGroups = entriesOf(spark, path, committed)
      .map(_.dv).distinct.count(_.nonEmpty)
    if (dvGroups > autoRewriteGroups) {
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"ManifestTable.deleteKeys($path): $dvGroups pending " +
          s"tombstone sets exceed autoRewriteGroups=$autoRewriteGroups" +
          " — materializing via rewriteDeletes")
      // best-effort MAINTENANCE: the delete itself is already
      // committed, so a materialization failure (e.g. a commit
      // conflict with zero retries left) must not make the whole
      // call throw — the caller could no longer tell the delete
      // succeeded. Log and return the delete's own version instead;
      // the backlog stays readable (merge-on-read is always
      // correct) and the next delete or manual rewriteDeletes
      // retries the materialization.
      try {
        val (v2, _) = rewriteDeletes(spark, path, retries = retries)
        return (v2, touch.size)
      } catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ManifestTable.deleteKeys($path): auto rewriteDeletes " +
              s"failed (${e.getMessage}) — the delete IS committed " +
              s"at ${vName(committed)}; tombstones stay pending")
      }
    }
    (committed, touch.size)
  }

  /** Frame-keyed copy-on-write DELETE with a RESIDUAL row predicate —
    * `DELETE FROM t WHERE keyCol IN (<frame>) AND residual` where the
    * key set is too large to inline (the over-cap subquery route
    * with extra conjuncts): membership is a marker left-join against
    * the distributed key frame (the keys never touch the driver, the
    * [[updateKeysFrame]] discipline), the residual runs VERBATIM in
    * the staged rewrite, and a row deletes only when BOTH are TRUE —
    * a NULL-evaluating residual survives, the SQL contract. This
    * shape cannot ride merge-on-read ([[deleteKeys]]' tombstones are
    * key-only; a residual needs the rows), so it is honestly
    * copy-on-write: dirs prune by the INTERSECTION of the key prune
    * ([[dirsHitByKeys]]: envelope + per-key range probe + Blooms)
    * and the residual's own conjunct probe — only dirs BOTH admit
    * rewrite. Returns (new version, dirs rewritten). `retries > 0`
    * rebases iff recorded stats prove every concurrently-added dir
    * is disjoint from the key batch or the residual. */
  def deleteKeysFrameWhere(spark: SparkSession, path: String,
      keyCol: String, keys: DataFrame,
      residual: org.apache.spark.sql.Column,
      residualConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(sys.error(
      s"ManifestTable.deleteKeysFrameWhere: no committed version at " +
        s"$path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val f = schema.fields.find(_.name == keyCol).getOrElse(sys.error(
      s"ManifestTable.deleteKeysFrameWhere: no column '$keyCol' in " +
        s"the table schema (${schema.fieldNames.mkString(", ")})"))
    val isStr = f.dataType == org.apache.spark.sql.types.StringType
    require(isStr || isIntegral(f.dataType),
      s"ManifestTable.deleteKeysFrameWhere: '$keyCol' is " +
        s"${f.dataType.catalogString} — keyed deletes are defined on " +
        "integral and string keys")
    val kf = keys.schema.fields.find(_.name == keyCol).getOrElse(
      sys.error(s"ManifestTable.deleteKeysFrameWhere: keys frame has " +
        s"no column '$keyCol'"))
    require(kf.dataType.catalogString == f.dataType.catalogString,
      s"ManifestTable.deleteKeysFrameWhere: keys column '$keyCol' is " +
        s"${kf.dataType.catalogString} but the table's is " +
        s"${f.dataType.catalogString} — a lossy cast could delete " +
        "the wrong rows; cast explicitly at the call site")
    // the residual must TYPE-CHECK boolean before any work
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val dt = probe.select(residual).schema.head.dataType
    require(dt == org.apache.spark.sql.types.BooleanType,
      s"ManifestTable.deleteKeysFrameWhere: the residual predicate " +
        s"has type ${dt.catalogString}, not boolean")
    val hit = "__graft_key_hit"
    require(!schema.fieldNames.contains(hit),
      s"ManifestTable.deleteKeysFrameWhere: column name '$hit' is " +
        "reserved for frame-keyed matching — rename the column")
    val batch = keys.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct().localCheckpoint()
    val (touchKeys, envelope, nKeys) =
      dirsHitByKeys(spark, path, entries, batch, keyCol, isStr)
    val mightRes = graft.sources.ManifestFileIndex.entryProbe(
      residualConjuncts, partitionSpecOf(spark, path, prev))
    val touch = touchKeys.filter(e => mightRes(e) &&
      e.hasData(fs, s"$path/data/${e.dir}"))
    if (nKeys == 0 || touch.isEmpty) return (prev, 0)
    val v = prev + 1
    val rewritten = stagedRewrite(spark, path, v, schema, touch,
      "deleteKeysFrameWhere",
      df => df
        .join(batch.withColumn(hit, lit(true)), Seq(keyCol), "left")
        .filter(!(col(hit).isNotNull &&
          coalesce(residual, lit(false))))
        .drop(hit),
      extraRestatCols = (keyCol +: residualConjuncts.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name
      })).distinct)
    val committed = commitRewrite(spark, path, "deleteKeysFrameWhere",
      prev, entries, touch.map(_.dir).toSet, rewritten, schema, Nil,
      Nil, retries,
      added => added.forall(e => !envelope(e) || !mightRes(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, touch.size)
  }

  /** COMPOSITE-key twin of [[deleteKeysFrameWhere]] /
    * [[updateKeysFrame]]'s membership machinery: shared validation +
    * prune + marker-join pieces for the tuple-frame DML routes
    * (`WHERE (a, b) IN (SELECT …)`), where the key is a TUPLE and
    * membership is a multi-column frame join. Returns the validated
    * (keyCols with string-ness, normalized batch, touched dirs,
    * envelope probe, nKeys). Rows with ANY null key component are
    * dropped from the batch — tuple-IN three-valued semantics: a
    * null component can never evaluate TRUE. */
  private def tupleFramePrep(spark: SparkSession, path: String, op: String,
      keyCols: Seq[String], keys: DataFrame, schema: StructType,
      entries: Seq[Entry])
      : (Seq[(String, Boolean)], DataFrame, Seq[Entry],
        Entry => Boolean, Long) = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"ManifestTable.$op: key columns must be non-empty and " +
        s"distinct, got ${keyCols.mkString("[", ", ", "]")}")
    val typed = keyCols.map { k =>
      val f = schema.fields.find(_.name == k).getOrElse(sys.error(
        s"ManifestTable.$op: no column '$k' in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
      val isStr = f.dataType == org.apache.spark.sql.types.StringType
      require(isStr || isIntegral(f.dataType),
        s"ManifestTable.$op: '$k' is ${f.dataType.catalogString} — " +
          "keyed DML is defined on integral and string keys")
      val kf = keys.schema.fields.find(_.name == k).getOrElse(
        sys.error(s"ManifestTable.$op: keys frame has no column '$k'"))
      require(kf.dataType.catalogString == f.dataType.catalogString,
        s"ManifestTable.$op: keys column '$k' is " +
          s"${kf.dataType.catalogString} but the table's is " +
          s"${f.dataType.catalogString} — a lossy cast could match " +
          "the wrong rows; cast explicitly at the call site")
      (k, isStr)
    }
    val batch = keys.select(keyCols.map(col): _*)
      .na.drop("any", keyCols).distinct().localCheckpoint()
    val (touch0, envelope, nKeys) =
      dirsHitByKeysMulti(spark, path, entries, batch, typed)
    (typed, batch, touch0, envelope, nKeys)
  }

  /** Frame-keyed copy-on-write DELETE on a COMPOSITE key —
    * `DELETE FROM t WHERE (a, b) IN (<frame>) [AND residual]`: the
    * composite-subquery route ([[deleteKeysFrameWhere]]'s tuple
    * twin). A composite key has NO merge-on-read form at any size
    * (tombstones are single-key by design), so membership is always
    * this honest copy-on-write marker join; dirs prune by the
    * composite prune pass ([[dirsHitByKeysMulti]]: per-column
    * envelope + per-row conjunctive range probe + per-tuple Blooms),
    * intersected with the residual's conjunct probe when one rides
    * along. Returns (new version, dirs rewritten). */
  def deleteTuplesFrame(spark: SparkSession, path: String,
      keyCols: Seq[String], keys: DataFrame,
      residual: Option[org.apache.spark.sql.Column] = None,
      residualConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(sys.error(
      s"ManifestTable.deleteTuplesFrame: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    residual.foreach { r =>
      val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val dt = probe.select(r).schema.head.dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"ManifestTable.deleteTuplesFrame: the residual predicate " +
          s"has type ${dt.catalogString}, not boolean")
    }
    val hit = "__graft_key_hit"
    require(!schema.fieldNames.contains(hit),
      s"ManifestTable.deleteTuplesFrame: column name '$hit' is " +
        "reserved for frame-keyed matching — rename the column")
    val (_, batch, touch0, envelope, nKeys) = tupleFramePrep(spark,
      path, "deleteTuplesFrame", keyCols, keys, schema, entries)
    val mightRes = graft.sources.ManifestFileIndex.entryProbe(
      residualConjuncts, partitionSpecOf(spark, path, prev))
    val touch = touch0.filter(e => mightRes(e) &&
      e.hasData(fs, s"$path/data/${e.dir}"))
    if (nKeys == 0 || touch.isEmpty) return (prev, 0)
    val v = prev + 1
    val matchGate = residual.fold(col(hit).isNotNull)(r =>
      col(hit).isNotNull && coalesce(r, lit(false)))
    val rewritten = stagedRewrite(spark, path, v, schema, touch,
      "deleteTuplesFrame",
      df => df
        .join(batch.withColumn(hit, lit(true)), keyCols, "left")
        .filter(!matchGate)
        .drop(hit),
      extraRestatCols = (keyCols ++ residualConjuncts.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name
      })).distinct)
    val committed = commitRewrite(spark, path, "deleteTuplesFrame",
      prev, entries, touch.map(_.dir).toSet, rewritten, schema, Nil,
      Nil, retries,
      added => added.forall(e => !envelope(e) || !mightRes(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, touch.size)
  }

  /** Frame-keyed copy-on-write UPDATE on a COMPOSITE key —
    * [[updateKeysFrame]]'s tuple twin for
    * `UPDATE t SET … WHERE (a, b) IN (<frame>) [AND residual]`:
    * matching rows patch IN PLACE through the one update engine,
    * membership is the multi-column marker join, pruning is the
    * composite prune pass intersected with the residual's probe.
    * Returns (new version, dirs rewritten). */
  def updateTuplesFrame(spark: SparkSession, path: String,
      keyCols: Seq[String], keys: DataFrame,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      residual: Option[org.apache.spark.sql.Column] = None,
      residualConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(sys.error(
      s"ManifestTable.updateTuplesFrame: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val clash = keyCols.filter(k => sets.exists(_._1 == k))
    require(clash.isEmpty,
      s"ManifestTable.updateTuplesFrame: SET touches key column(s) " +
        s"${clash.mkString("'", "', '", "'")} — a frame-keyed update " +
        "cannot re-derive its own match set; use updateWhere")
    residual.foreach { r =>
      val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val dt = probe.select(r).schema.head.dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"ManifestTable.updateTuplesFrame: the residual predicate " +
          s"has type ${dt.catalogString}, not boolean")
    }
    val hit = "__graft_key_hit"
    require(!schema.fieldNames.contains(hit),
      s"ManifestTable.updateTuplesFrame: column name '$hit' is " +
        "reserved for frame-keyed matching — rename the column")
    val (_, batch, touch0, envelope, nKeys) = tupleFramePrep(spark,
      path, "updateTuplesFrame", keyCols, keys, schema, entries)
    if (nKeys == 0) return (prev, 0)
    val mightRes = graft.sources.ManifestFileIndex.entryProbe(
      residualConjuncts, partitionSpecOf(spark, path, prev))
    updateImpl(spark, path, "updateTuplesFrame", sets,
      residual.fold(col(hit).isNotNull)(r =>
        col(hit).isNotNull && coalesce(r, lit(false))),
      e => touch0.exists(_.dir == e.dir) && mightRes(e),
      added => added.forall(e => !envelope(e) || !mightRes(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")), retries,
      preTransform = df => df
        .join(batch.withColumn(hit, lit(true)), keyCols, "left"),
      dropAfter = Seq(hit))
  }

  /** Materialize every pending deletion vector: each dir carrying
    * tombstone references is rewritten (its dvs anti-joined out,
    * re-statted exact, provenance recorded, possibly dropped when
    * emptied) with a bounded number of Spark jobs however many dirs
    * are dirty — ONE scan per tombstone GROUP (dirs sharing a dv set
    * read together, their tombstones anti-joined once), each row
    * tagged with its source dir name derived from the scan's own
    * file path (no shuffle: broadcast anti-joins keep rows in their
    * scan stage), staged with `partitionBy(dir name)`, restatted by
    * ONE grouped aggregate over the staged tree ([[statsBySrc]] —
    * not a per-dir job loop), and promoted by rename. Clean dirs
    * keep their physical identity untouched. After this commit the
    * table's metadata is exact again (metadata-only aggregates
    * resume) and reads pay no anti-join tax; [[vacuum]] reaps the
    * orphaned tombstone dirs with the old snapshots. Returns
    * (version, dirs rewritten) — (current, 0) when nothing is
    * pending. */
  def rewriteDeletes(spark: SparkSession, path: String,
      retries: Int = 0): (Long, Int) = {
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.rewriteDeletes: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val dirty = entries.filter(_.dv.nonEmpty)
    if (dirty.isEmpty) return (prev, 0)
    val schema = tableSchema(spark, path, prev, entries)
    val v = prev + 1
    val out = stagedRewrite(spark, path, v, schema, dirty,
      "rewriteDeletes", identity)
    // a materialization has no row-level effect on LOGICAL content:
    // any concurrent addition rebases safely
    val committed = commitRewrite(spark, path, "rewriteDeletes", prev,
      entries, dirty.map(_.dir).toSet, out, schema, Nil, Nil, retries,
      _ => true)
    (committed, dirty.size)
  }


  /** Two-stage + Bloom dir pruning shared by every KEYED row-level op
    * ([[merge]], [[deleteKeys]], [[mergeUpdate]]): which data dirs
    * MIGHT hold a key of `batch`? Stage 1 cuts candidates from the
    * manifest alone via the batch's key ENVELOPE (one tiny aggregate;
    * integral keys probe the long stats, string keys the recorded
    * string bounds — string comparisons run IN Spark, the same UTF8
    * binary order that recorded them, so the envelope itself is
    * exact and the manifest-side bounds check is ASCII-guarded
    * conservative). Stage 2 probes each candidate dir's exact
    * recorded range with ONE aggregate pass over the batch — a batch
    * touching keys {2, 20} must not hit a [10, 11] dir just because
    * the envelope [2, 20] covers it (update/delete batches are
    * sparse in key space; the envelope alone would hit nearly
    * everything). Batches of at most 8192 keys additionally consult
    * the per-dir Bloom filters — the prune that works on INTERLEAVED
    * key layouts, where every dir's range spans the whole domain and
    * range probes clear nothing. Sound for every caller because a
    * dir NO batch key can be in holds no row the op could affect.
    * Returns (dirs hit, the envelope predicate — what the rebase
    * gates re-check on concurrently-added dirs — and the batch's
    * row count, which doubles as the callers' broadcast guard). */
  private def dirsHitByKeys(spark: SparkSession, path: String,
      entries: Seq[Entry], batch: DataFrame, keyCol: String,
      isStr: Boolean): (Seq[Entry], Entry => Boolean, Long) =
    dirsHitByKeysMulti(spark, path, entries, batch,
      Seq((keyCol, isStr)))

  /** The key-batch dir prune, generalized to COMPOSITE keys: a dir is
    * touched only if it might hold a row whose ENTIRE key tuple the
    * batch carries. Three conjunctive passes, each exact in its own
    * terms and conservative across columns —
    *  1. envelope: the batch's per-column [min, max] against each
    *     dir's recorded bounds (a dir disjoint on ANY key column can
    *     hold no matching tuple);
    *  2. exact range probe: ONE aggregate over the batch asking, per
    *     candidate dir, "does any batch ROW fall inside this dir's
    *     bounds on every bounded key column simultaneously?" — the
    *     per-row conjunction prunes dirs a per-column envelope keeps
    *     (row (1, 'z') and row (9, 'a') both in-envelope for a dir
    *     holding only (1..2, 'a'..'b'));
    *  3. point probe (batches <= 8192 keys): per-column Bloom/point
    *     consultation per key tuple, ANDed across columns.
    * Returns (touched dirs, the envelope predicate — the rebase
    * gate's disjointness proof, conjunctive like pass 1 — and the
    * batch's key count). */
  private def dirsHitByKeysMulti(spark: SparkSession, path: String,
      entries: Seq[Entry], batch: DataFrame,
      keys: Seq[(String, Boolean)])
      : (Seq[Entry], Entry => Boolean, Long) = {
    val (fs, _) = fsOf(spark, path)
    val aggs = keys.flatMap { case (k, _) =>
      Seq(min(col(k)), max(col(k))) } :+ count(lit(1))
    val env = batch.agg(aggs.head, aggs.tail: _*).head()
    val nKeys = env.getLong(2 * keys.length)
    val envOverlap: Entry => Boolean =
      if (nKeys == 0) _ => false
      else e => keys.zipWithIndex.forall { case ((k, isStr), i) =>
        if (isStr) e.mightOverlapStr(k, env.getString(2 * i),
          env.getString(2 * i + 1))
        else e.mightOverlap(k,
          env.get(2 * i).asInstanceOf[Number].longValue(),
          env.get(2 * i + 1).asInstanceOf[Number].longValue())
      }
    if (nKeys == 0) return (Seq.empty, envOverlap, 0L)
    val cand = entries.filter(e => envOverlap(e) &&
      e.hasData(fs, s"$path/data/${e.dir}"))
    def boundsOf(e: Entry, k: String, isStr: Boolean)
        : Option[(Any, Any)] =
      if (isStr) e.strMin.get(k).zip(e.strMax.get(k))
      else e.statMin.get(k).zip(e.statMax.get(k))
    // a dir is "bounded" when ANY key column has recorded bounds —
    // the probe conjoins exactly the bounded columns (an unbounded
    // column contributes TRUE, never a false prune)
    val (bounded, unbounded) = cand.partition(e =>
      keys.exists { case (k, s) => boundsOf(e, k, s).isDefined })
    val hits: Seq[Entry] =
      if (bounded.isEmpty) Seq.empty
      else {
        val probes = bounded.zipWithIndex.map { case (e, i) =>
          val inDir = keys.flatMap { case (k, s) =>
            boundsOf(e, k, s).map { case (mn, mx) =>
              col(k) >= lit(mn) && col(k) <= lit(mx) }
          }.reduce(_ && _)
          max(when(inDir, 1).otherwise(0)).as(s"d$i")
        }
        val r = batch.select(keys.map(k => col(k._1)): _*)
          .agg(probes.head, probes.tail: _*).head()
        bounded.zipWithIndex.collect {
          case (e, i) if !r.isNullAt(i) && r.getInt(i) == 1 => e
        }
      }
    val touch0 = unbounded ++ hits
    val touch =
      if (nKeys > 8192) touch0
      else {
        val tuples = batch.select(keys.map(k => col(k._1)): _*)
          .collect().map(r => keys.indices.map(r.get)).toSeq
        touch0.filter(e => tuples.exists(t =>
          keys.zipWithIndex.forall { case ((k, isStr), i) =>
            if (isStr) e.mightContainPointStr(k, t(i).asInstanceOf[String])
            else e.mightContainPoint(k,
              t(i).asInstanceOf[Number].longValue())
          }))
      }
    (touch, envOverlap, nKeys)
  }

  /** Copy-on-write MERGE (upsert) by integral or STRING key — the
    * reference's natural upsert key IS a string
    * (`consumer/consumer.py:111-125` upserts per cveId;
    * `chatbot_pg/main.py:89` addresses rows by string id): rows of
    * `updates` REPLACE same-key rows in the table; new keys are
    * inserted. Cost
    * shape mirrors [[deleteRange]]: only data dirs whose recorded
    * `keyCol` stats overlap the batch's key range are rewritten (the
    * replaced rows anti-joined out, re-statted, provenance recorded);
    * every other dir keeps its physical identity, and the whole
    * updates batch lands as ONE new appended dir — so a merge costs
    * the dirs that CONTAIN matches plus one batch write, not a table
    * rewrite. With a clustered key (the ingest layouts here), that is
    * a handful of dirs. All committed atomically as one new version;
    * old snapshots still see the pre-merge rows until [[vacuum]].
    *
    * The rewrite of all touched dirs runs as ONE Spark job (touched
    * dirs union-tagged, key set anti-joined once, output staged with
    * partitionBy and promoted by rename — the [[cluster]] pattern), so
    * a merge straddling k dirs pays one job latency, not k serialized
    * round-trips. The updates key set broadcasts into the anti-join
    * only while the batch is at most `maxBroadcastKeys` rows;
    * beyond that (someone merging a table-sized frame) it degrades to
    * a plain shuffle anti-join instead of flooding every executor.
    *
    * Contract: `updates` must carry exactly the table's columns
    * (replaced rows are replaced WHOLE — a partial-column update
    * would silently null the rest), and its keys must be unique (two
    * updates for one key have no defined winner). Both violations
    * fail loudly. Returns (new version, dirs rewritten).
    *
    * `retries > 0` makes the commit optimistic ([[commitRewrite]]):
    * on a version conflict the merge REBASES onto the new latest iff
    * the recorded stats prove every concurrently-added dir is
    * disjoint from the batch's key envelope `[lo, hi]` — otherwise
    * (the interloper may have appended rows with keys this merge
    * replaces, which a rebase would silently duplicate) the conflict
    * propagates. */
  def merge(spark: SparkSession, updates: DataFrame, path: String,
      keyCol: String, statsCols: Seq[String] = Nil,
      maxBroadcastKeys: Long = 4000000L,
      bloomCols: Seq[String] = Nil, retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.merge: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    require(updates.columns.toSet == schema.fieldNames.toSet,
      s"ManifestTable.merge: updates columns " +
        updates.columns.toSeq.sorted.mkString("[", ", ", "]") +
        " must equal the table's " +
        schema.fieldNames.toSeq.sorted.mkString("[", ", ", "]") +
        " — replaced rows are replaced whole")
    // same write-boundary TYPE enforcement as append: a same-named
    // column of a different type would commit an appended dir the
    // persisted-schema read path can no longer decode
    compatibleSchema(updates.schema, schema, evolve = false,
      s"ManifestTable.merge($path)", allowWidening = true)
    val keyField = schema.fields.find(_.name == keyCol).getOrElse(
      sys.error(s"ManifestTable.merge: no column '$keyCol' in the " +
        s"table schema (${schema.fieldNames.mkString(", ")})"))
    val isStr =
      keyField.dataType == org.apache.spark.sql.types.StringType
    require(isStr || isIntegral(keyField.dataType),
      s"ManifestTable.merge: key '$keyCol' is " +
        s"${keyField.dataType.catalogString} — merge is defined on " +
        "integral and string keys")
    // materialize the batch once: it feeds the key-range bound, the
    // per-dir anti-joins, and the appended dir
    val batch = alignToTable(updates, schema)
      .select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint()
    if (batch.head(1).isEmpty) return (prev, 0) // empty batch: no-op
    // null keys have no equality match: they could never be UPDATED
    // by a later merge (anti-join on null never hits), so admitting
    // them would quietly duplicate on every re-merge — loud instead
    require(batch.filter(col(keyCol).isNull).head(1).isEmpty,
      s"ManifestTable.merge: updates carry null '$keyCol' keys — a " +
        "null key can never be matched for replacement; assign keys " +
        "or route null-key rows through append")
    val dupKeys = batch.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupKeys.isEmpty,
      s"ManifestTable.merge: updates carry duplicate key " +
        s"${dupKeys.headOption.map(_.get(0))} — no defined winner")
    // only the batch adds rows (rewritten dirs are row-subsets of
    // content that passed at ITS commit, and addConstraint validates
    // the whole table) — CHECK it before any staging work. The
    // checkpointed batch is what writeDirEntry will write, so this
    // pre-write check is authoritative.
    enforceConstraints(batch, constraintsOf(spark, path, prev),
      s"ManifestTable.merge($path)")
    // ONE key-batch prune pass ([[dirsHitByKeys]] — envelope from the
    // manifest, exact per-dir range probe, Bloom consultation for
    // small batches) decides the rewrite set; its row count doubles
    // as the broadcast guard (no separate count job)
    val (touch, envOverlap, nKeys) =
      dirsHitByKeys(spark, path, entries, batch, keyCol, isStr)
    val v = prev + 1
    val keys = batch.select(col(keyCol))
    // broadcast the key set only when it is update-batch-sized: a
    // table-sized updates frame must not be forced whole into every
    // executor (and the driver) just because someone called merge with
    // it — past the threshold the anti-join falls back to a plain
    // shuffle join, correct at any size
    val probe =
      if (nKeys <= maxBroadcastKeys) broadcast(keys) else keys
    // ONE staged job rewrites every touched dir (shared engine with
    // deleteRange/rewriteDeletes — see [[stagedRewrite]]): group
    // scans with pending dvs applied, the key set anti-joined once,
    // rows tagged with their source dir, partitionBy staging, one
    // grouped restat, rename promotion. The old per-dir loop paid
    // one full job latency PER touched dir, serialized in the driver
    // — a merge straddling k dirs cost k job round-trips for the
    // same bytes. No repartition: input splits flow straight to
    // per-source staged outputs, preserving each dir's existing file
    // structure and row order (any prior clustering survives) with
    // zero shuffle.
    val rewritten: Seq[Entry] = stagedRewrite(spark, path, v, schema,
      touch, "merge", _.join(probe, Seq(keyCol), "left_anti"),
      extraRestatCols = Seq(keyCol))
    // on a partitioned table the batch lands partition-pure too —
    // otherwise every merge would erode dropPartitions eligibility
    // one insert dir at a time
    val mSpec = partitionSpecOf(spark, path, prev)
    val stamped = stampIds(spark, batch, schema)
    val inserted: Seq[Entry] =
      if (mSpec.isEmpty) Seq(writeDirEntry(spark, stamped, path, v, -1L,
        (statsCols :+ keyCol).distinct, bloomCols))
      else writePartitionedEntries(spark, stamped, path, v, -1L,
        (statsCols :+ keyCol).distinct, bloomCols, mSpec,
        provenance = Seq.empty)
    val committed = commitRewrite(spark, path, "merge", prev, entries,
      touch.map(_.dir).toSet, rewritten ++ inserted, schema,
      (statsCols :+ keyCol).distinct, bloomCols, retries,
      added => added.forall(e => !envOverlap(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, touch.size)
  }

  /** Shared engine of the copy-on-write UPDATE family
    * ([[updateRange]]/[[updateKeys]]/[[updateAll]]): rows matching
    * `rowPred` get the `sets` expressions applied IN PLACE — same
    * dirs, same row order and count, so any prior clustering
    * survives — and only the dirs `touchPred` admits are rewritten
    * (ONE staged job however many), every other dir keeping its
    * physical identity. That is the UPDATE shape a 100 TB table
    * needs: cost proportional to the data that CONTAINS matches,
    * never to the table.
    *
    * Strictness at the boundary (the same discipline as every other
    * mutation here):
    *  - every SET column must exist, once, in the table schema;
    *  - a SET on a PARTITION-SOURCE column is refused — the rewrite
    *    carries each dir's recorded partition value through
    *    (`stagedRewrite` keeps `partition`), so changing a source
    *    column would silently divorce metadata from content and
    *    corrupt partition pruning/drops; route such a change through
    *    merge/overwrite, which re-derive partitions;
    *  - each SET expression must produce the column's exact type (or
    *    losslessly widen into it, then cast) — validated on a
    *    zero-row frame before any work; an implicit narrowing
    *    mid-rewrite would corrupt values;
    *  - CHECK constraints are enforced on the UPDATED rows (one
    *    pass over the touched dirs' matching rows, dvs applied,
    *    before any staging work) — only updated rows can newly
    *    violate. */
  private def updateImpl(spark: SparkSession, path: String, op: String,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      rowPred: org.apache.spark.sql.Column, touchPred: Entry => Boolean,
      addedSafe: Seq[Entry] => Boolean, retries: Int,
      // frame-keyed matching ([[updateKeysFrame]]): stage the row
      // matcher as a marker JOIN before applySets, and drop the
      // marker before the write. Joined transforms reorder rows
      // inside a rewritten dir (the merge family's accepted bill —
      // partitionBy(srcCol) keeps dir routing exact); the default
      // identity keeps every literal-predicate path narrow.
      preTransform: DataFrame => DataFrame = identity,
      dropAfter: Seq[String] = Nil): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.$op: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    require(sets.nonEmpty, s"ManifestTable.$op: empty SET list")
    require(sets.map(_._1).distinct.size == sets.size,
      s"ManifestTable.$op: duplicate SET column in " +
        sets.map(_._1).mkString("[", ", ", "]"))
    val fieldsByName = schema.fields.map(f => f.name -> f).toMap
    sets.foreach { case (c, _) =>
      require(fieldsByName.contains(c),
        s"ManifestTable.$op: SET column '$c' is not in the table " +
          s"schema (${schema.fieldNames.mkString(", ")})")
    }
    val pSrcs = partitionSpecOf(spark, path, prev).map(_.src).toSet
    val clash = sets.map(_._1).filter(pSrcs)
    require(clash.isEmpty,
      s"ManifestTable.$op: SET touches partition-source column(s) " +
        clash.mkString("'", "', '", "'") + " — an in-place update " +
        "cannot re-derive partition metadata; rewrite those rows via " +
        "merge or overwrite instead")
    // type-check every SET expression against a ZERO-ROW frame with
    // the table's schema: exact type, or a lossless widening (then
    // cast below) — loud before any data work
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    sets.foreach { case (c, e) =>
      val dt = probe.select(e).schema.head.dataType
      val want = fieldsByName(c).dataType
      require(dt.catalogString == want.catalogString || widens(dt, want),
        s"ManifestTable.$op: SET '$c' expression has type " +
          s"${dt.catalogString} but the column is " +
          s"${want.catalogString} — cast explicitly at the call site")
    }
    val setMap = sets.toMap
    val tableCols = schema.fieldNames.toSet
    def applySets(df: DataFrame): DataFrame = {
      val cols = schema.fieldNames.map { c =>
        setMap.get(c) match {
          // a null-evaluating predicate matches nothing (SQL UPDATE
          // semantics): `when` falls through to the original value
          case Some(e) => when(rowPred,
            e.cast(fieldsByName(c).dataType)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }
      // staging bookkeeping columns (the rewrite's source-dir tag)
      // pass through untouched; frame-matcher markers do not
      val extra = df.columns.filterNot(tableCols)
        .filterNot(dropAfter.contains).map(col)
      df.select((cols ++ extra).toSeq: _*)
    }
    val touch = entries.filter(e => touchPred(e) &&
      e.hasData(fs, s"$path/data/${e.dir}"))
    if (touch.isEmpty) return (prev, 0)
    val cs = constraintsOf(spark, path, prev)
    if (cs.nonEmpty)
      enforceConstraints(
        applySets(preTransform(readableFrame(spark, path, schema, touch))
          .filter(rowPred)),
        cs, s"ManifestTable.$op($path)")
    val v = prev + 1
    // restat the SET columns too: their recorded min/max/Blooms
    // describe pre-update values — stale bounds would prune wrongly
    val rewritten = stagedRewrite(spark, path, v, schema, touch, op,
      df => applySets(preTransform(df)), extraRestatCols = sets.map(_._1))
    val committed = commitRewrite(spark, path, op, prev, entries,
      touch.map(_.dir).toSet, rewritten, schema, Nil, Nil, retries,
      addedSafe)
    (committed, touch.size)
  }

  /** Copy-on-write `UPDATE … SET … WHERE keyCol IN [lo, hi]` on an
    * integral key: only dirs whose recorded stats overlap the range
    * rewrite (in place — row order, count, and clustering survive);
    * null keys never match. See [[updateImpl]] for the SET contract.
    * Returns (new version, dirs rewritten). `retries > 0` rebases
    * optimistically iff recorded stats prove every concurrently-added
    * dir is disjoint from the range. */
  def updateRange(spark: SparkSession, path: String, keyCol: String,
      lo: Long, hi: Long, sets: Seq[(String, org.apache.spark.sql.Column)],
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.updateRange: no committed version at $path"))
    val schema = tableSchema(spark, path, prev, entriesOf(spark, path, prev))
    val f = schema.fields.find(_.name == keyCol).getOrElse(sys.error(
      s"ManifestTable.updateRange: no column '$keyCol' in the table " +
        s"schema (${schema.fieldNames.mkString(", ")})"))
    require(isIntegral(f.dataType),
      s"ManifestTable.updateRange: '$keyCol' is " +
        s"${f.dataType.catalogString}, not an integral type — a " +
        "long-range update is only defined on integral keys")
    updateImpl(spark, path, "updateRange", sets,
      col(keyCol).isNotNull && col(keyCol).cast("long").between(lo, hi),
      _.mightOverlap(keyCol, lo, hi),
      added => added.forall(e => !e.mightOverlap(keyCol, lo, hi) ||
        !e.hasData(fs, s"$path/data/${e.dir}")), retries)
  }

  /** The DataFrame-valued twin of [[updateKeys]] — `UPDATE … SET …
    * WHERE keyCol IN (<frame>)` where the key set is too large to
    * exist as literals (the over-cap subquery route, mirroring
    * [[deleteKeys]]'s contract): the keys stay a DISTRIBUTED frame
    * end-to-end — ONE [[dirsHitByKeys]] prune pass scopes the rewrite
    * to dirs that might hold a key, and row matching inside the
    * touched dirs is a LEFT JOIN against the key frame (a marker
    * column drives the per-row SET gate), never an `isin` literal
    * list. Copy-on-write like every update: only touched dirs
    * rewrite, in place. Integral AND string keys (deleteKeys'
    * domain). NULL keys never match (join equality); duplicate keys
    * dedup. Returns (new version, dirs rewritten). `retries > 0`
    * rebases iff recorded stats prove every concurrently-added dir
    * cannot hold a batch key. */
  def updateKeysFrame(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame, sets: Seq[(String, org.apache.spark.sql.Column)],
      retries: Int = 0,
      residual: Option[org.apache.spark.sql.Column] = None,
      residualConjuncts: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression] = Nil)
      : (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(sys.error(
      s"ManifestTable.updateKeysFrame: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val f = schema.fields.find(_.name == keyCol).getOrElse(sys.error(
      s"ManifestTable.updateKeysFrame: no column '$keyCol' in the " +
        s"table schema (${schema.fieldNames.mkString(", ")})"))
    val isStr = f.dataType == org.apache.spark.sql.types.StringType
    require(isStr || isIntegral(f.dataType),
      s"ManifestTable.updateKeysFrame: '$keyCol' is " +
        s"${f.dataType.catalogString} — keyed updates are defined on " +
        "integral and string keys")
    require(!sets.exists(_._1 == keyCol),
      s"ManifestTable.updateKeysFrame: SET touches the key column " +
        s"'$keyCol' itself — a frame-keyed update cannot re-derive " +
        "its own match set; use updateWhere")
    val kf = keys.schema.fields.find(_.name == keyCol).getOrElse(
      sys.error(s"ManifestTable.updateKeysFrame: keys frame has no " +
        s"column '$keyCol'"))
    require(kf.dataType.catalogString == f.dataType.catalogString,
      s"ManifestTable.updateKeysFrame: keys column '$keyCol' is " +
        s"${kf.dataType.catalogString} but the table's is " +
        s"${f.dataType.catalogString} — a lossy cast could patch the " +
        "wrong rows; cast explicitly at the call site")
    // an optional RESIDUAL row predicate (the over-cap subquery route
    // with extra conjuncts): a row patches only when it is a key
    // match AND the residual is TRUE (NULL keeps the row's values).
    // Must type-check boolean before any work.
    residual.foreach { r =>
      val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val dt = probe.select(r).schema.head.dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"ManifestTable.updateKeysFrame: the residual predicate has " +
          s"type ${dt.catalogString}, not boolean")
    }
    val mightRes = graft.sources.ManifestFileIndex.entryProbe(
      residualConjuncts, partitionSpecOf(spark, path, prev))
    val batch = keys.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct().localCheckpoint()
    val (touch0, envelope, nKeys) =
      dirsHitByKeys(spark, path, entries, batch, keyCol, isStr)
    if (nKeys == 0) return (prev, 0)
    val hit = "__graft_key_hit"
    require(!schema.fieldNames.contains(hit),
      s"ManifestTable.updateKeysFrame: column name '$hit' is " +
        "reserved for frame-keyed matching — rename the column")
    // the row-level matcher: marker left-join against the key frame;
    // updateImpl's applySets gates each SET on rowPred, which here is
    // the marker's presence (AND the residual when given) — and drops
    // the marker before the write. Dir pruning is the INTERSECTION of
    // the key prune and the residual's conjunct probe.
    updateImpl(spark, path, "updateKeysFrame", sets,
      residual.fold(col(hit).isNotNull)(r =>
        col(hit).isNotNull && coalesce(r, lit(false))),
      e => touch0.exists(_.dir == e.dir) && mightRes(e),
      added => added.forall(e => !envelope(e) || !mightRes(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")), retries,
      preTransform = df => df
        .join(batch.withColumn(hit, lit(true)), Seq(keyCol), "left"),
      dropAfter = Seq(hit))
  }

  /** Copy-on-write `UPDATE … SET … WHERE keyCol IN (keys…)` on a
    * STRING key (the reference's hottest row address — the per-cveId
    * statement shape of /root/reference/chatbot_pg/main.py:89): dirs
    * prune by recorded string bounds (ASCII-guarded point probes)
    * AND per-dir string Bloom filters — the prune that works on
    * interleaved key layouts. Returns (new version, dirs
    * rewritten). */
  def updateKeys(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[String], sets: Seq[(String, org.apache.spark.sql.Column)],
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.updateKeys: no committed version at $path"))
    val schema = tableSchema(spark, path, prev, entriesOf(spark, path, prev))
    val f = schema.fields.find(_.name == keyCol).getOrElse(sys.error(
      s"ManifestTable.updateKeys: no column '$keyCol' in the table " +
        s"schema (${schema.fieldNames.mkString(", ")})"))
    require(f.dataType == org.apache.spark.sql.types.StringType,
      s"ManifestTable.updateKeys: '$keyCol' is " +
        s"${f.dataType.catalogString} — keyed string updates are " +
        "defined on string keys; integral ranges go through " +
        "updateRange")
    val ks = keys.filter(_ != null).distinct
    if (ks.isEmpty) return (prev, 0)
    def mightHold(e: Entry): Boolean = ks.exists(k =>
      e.mightOverlapStr(keyCol, k, k) && e.mightContainPointStr(keyCol, k))
    updateImpl(spark, path, "updateKeys", sets,
      col(keyCol).isin(ks: _*), mightHold,
      added => added.forall(e => !mightHold(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")), retries)
  }

  /** Copy-on-write whole-table `UPDATE … SET …` (no WHERE): every
    * data dir rewrites in ONE staged job. Returns (new version, dirs
    * rewritten). Rebase refuses any concurrently-added data dir —
    * its rows would have been updated too. */
  def updateAll(spark: SparkSession, path: String,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    updateImpl(spark, path, "updateAll", sets, lit(true), _ => true,
      added => added.forall(e => !e.hasData(fs, s"$path/data/${e.dir}")),
      retries)
  }

  /** COLUMN-WISE copy-on-write MERGE — the `WHEN MATCHED THEN UPDATE
    * SET col = expr` statement (the single most common warehouse
    * upsert the reference's users would type next to the whole-row
    * form): matched target rows get `sets` applied IN PLACE — same
    * dirs, same row order, clustering survives, nothing is
    * anti-joined out and re-appended — and, when `insertNotMatched`,
    * source rows whose key the table lacks land as ONE appended dir
    * (partition-pure on a partitioned table, like [[merge]]'s).
    * Contrast with [[merge]]: whole-row upsert REPLACES matched rows
    * (removed from their dirs, re-appended in the batch dir), which
    * is right when the source carries complete rows; column-wise
    * update PATCHES them where they live, which is right when the
    * source carries deltas — and strictly cheaper, since matched
    * rows never migrate out of their clustered dirs.
    *
    * `sets` expressions may reference target columns by name and
    * source columns as `_src_<name>` (the join aliases every source
    * column with that prefix; table columns must not collide with
    * it). Dir pruning, broadcast guard, null/duplicate source-key
    * rejection, and the rebase gate all mirror [[merge]]. When
    * `insertNotMatched`, the source must carry every table column
    * (the INSERT * contract); otherwise just the key plus whatever
    * `sets` references. CHECK constraints are enforced on the
    * patched rows AND the inserted rows before any staging work.
    * Returns (new version, dirs rewritten). */
  def mergeUpdate(spark: SparkSession, source: DataFrame, path: String,
      keyCol: String, sets: Seq[(String, org.apache.spark.sql.Column)],
      insertNotMatched: Boolean, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, maxBroadcastKeys: Long = 4000000L,
      retries: Int = 0): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.mergeUpdate: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val keyField = schema.fields.find(_.name == keyCol).getOrElse(
      sys.error(s"ManifestTable.mergeUpdate: no column '$keyCol' in " +
        s"the table schema (${schema.fieldNames.mkString(", ")})"))
    val isStr =
      keyField.dataType == org.apache.spark.sql.types.StringType
    require(isStr || isIntegral(keyField.dataType),
      s"ManifestTable.mergeUpdate: key '$keyCol' is " +
        s"${keyField.dataType.catalogString} — merge is defined on " +
        "integral and string keys")
    require(source.columns.contains(keyCol),
      s"ManifestTable.mergeUpdate: source has no column '$keyCol'")
    require(sets.nonEmpty || insertNotMatched,
      "ManifestTable.mergeUpdate: no SET columns and no " +
        "insertNotMatched — the statement can have no effect")
    if (insertNotMatched)
      require(source.columns.toSet == schema.fieldNames.toSet,
        "ManifestTable.mergeUpdate(insertNotMatched): source columns " +
          source.columns.toSeq.sorted.mkString("[", ", ", "]") +
          " must equal the table's " +
          schema.fieldNames.toSeq.sorted.mkString("[", ", ", "]") +
          " — inserted rows are inserted whole")
    val srcPrefix = "_src_"
    val collide = schema.fieldNames.filter(_.startsWith(srcPrefix))
    require(collide.isEmpty,
      s"ManifestTable.mergeUpdate: table column(s) " +
        collide.mkString("'", "', '", "'") + s" collide with the " +
        s"'$srcPrefix' source-alias prefix — rename the column")
    val fieldsByName = schema.fields.map(f => f.name -> f).toMap
    require(sets.map(_._1).distinct.size == sets.size,
      "ManifestTable.mergeUpdate: duplicate SET column in " +
        sets.map(_._1).mkString("[", ", ", "]"))
    sets.foreach { case (c, _) =>
      require(fieldsByName.contains(c),
        s"ManifestTable.mergeUpdate: SET column '$c' is not in the " +
          s"table schema (${schema.fieldNames.mkString(", ")})")
      require(c != keyCol,
        "ManifestTable.mergeUpdate: SET must not assign the merge " +
          s"key '$keyCol' — the key is the row's identity")
    }
    val pSrcs = partitionSpecOf(spark, path, prev).map(_.src).toSet
    val clash = sets.map(_._1).filter(pSrcs)
    require(clash.isEmpty,
      "ManifestTable.mergeUpdate: SET touches partition-source " +
        s"column(s) ${clash.mkString("'", "', '", "'")} — an in-place " +
        "update cannot re-derive partition metadata; use whole-row " +
        "merge, which re-partitions the replaced rows")
    // the source key must arrive at the table's exact type (or widen
    // losslessly): a lossy coercion could match the wrong rows
    val skf = source.schema.fields.find(_.name == keyCol).get
    require(skf.dataType.catalogString == keyField.dataType.catalogString
        || widens(skf.dataType, keyField.dataType),
      s"ManifestTable.mergeUpdate: source key '$keyCol' is " +
        s"${skf.dataType.catalogString} but the table's is " +
        s"${keyField.dataType.catalogString} — cast explicitly")
    val batch = (if (insertNotMatched) alignToTable(source, schema)
        .select(schema.fieldNames.map(col).toSeq: _*)
      else source.withColumn(keyCol,
        col(keyCol).cast(keyField.dataType))).localCheckpoint()
    if (batch.head(1).isEmpty) return (prev, 0)
    require(batch.filter(col(keyCol).isNull).head(1).isEmpty,
      s"ManifestTable.mergeUpdate: source carries null '$keyCol' " +
        "keys — a null key matches no row and would re-insert on " +
        "every run; assign keys or route null-key rows through append")
    val dupKeys = batch.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupKeys.isEmpty,
      s"ManifestTable.mergeUpdate: source carries duplicate key " +
        s"${dupKeys.headOption.map(_.get(0))} — no defined winner")
    // type-check SET expressions against a zero-row frame carrying
    // the table's columns plus the _src_-aliased source columns
    val joinedShape = org.apache.spark.sql.types.StructType(
      schema.fields ++ batch.schema.fields.map(f =>
        f.copy(name = srcPrefix + f.name)))
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], joinedShape)
    sets.foreach { case (c, e) =>
      val dt = probe.select(e).schema.head.dataType
      val want = fieldsByName(c).dataType
      require(dt.catalogString == want.catalogString || widens(dt, want),
        s"ManifestTable.mergeUpdate: SET '$c' expression has type " +
          s"${dt.catalogString} but the column is " +
          s"${want.catalogString} — cast explicitly at the call site")
    }
    val (touch, envOverlap, nKeys) =
      dirsHitByKeys(spark, path, entries, batch, keyCol, isStr)
    val srcAliased = batch.select(batch.columns.map(c =>
      col(c).as(srcPrefix + c)).toSeq: _*)
    val probeSrc =
      if (nKeys <= maxBroadcastKeys) broadcast(srcAliased) else srcAliased
    val setMap = sets.toMap
    val tableCols = schema.fieldNames.toSet
    val matched = col(srcPrefix + keyCol).isNotNull
    def patch(df: DataFrame): DataFrame = {
      // left join: unmatched rows pass through verbatim (`when`
      // falls to otherwise on the null probe key); a null target key
      // never equals anything and passes through too
      val joined = df.join(probeSrc,
        col(keyCol) === col(srcPrefix + keyCol), "left")
      val cols = schema.fieldNames.map { c =>
        setMap.get(c) match {
          case Some(e) => when(matched,
            e.cast(fieldsByName(c).dataType)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }
      val extra = df.columns.filterNot(tableCols).map(col)
      joined.select((cols ++ extra).toSeq: _*)
    }
    // not-matched inserts: matched keys can only live in touched dirs
    // (the prune is a conservative superset), so ONE column-pruned,
    // dv-applied scan of exactly those dirs decides membership
    val newRows =
      if (!insertNotMatched) None
      else {
        val nr =
          if (touch.isEmpty) batch
          else batch.join(
            readableFrame(spark, path, schema, touch).select(col(keyCol)),
            Seq(keyCol), "left_anti").localCheckpoint()
        if (nr.head(1).isEmpty) None else Some(nr)
      }
    val cs = constraintsOf(spark, path, prev)
    if (cs.nonEmpty) {
      // the whole patched frame is checked (unmatched rows passed at
      // their own commit and addConstraint validated the table, so
      // only patched rows can fail — re-checking the rest is free
      // correctness margin, not a semantic change)
      if (touch.nonEmpty && sets.nonEmpty)
        enforceConstraints(patch(readableFrame(spark, path, schema,
          touch)), cs, s"ManifestTable.mergeUpdate($path)")
      newRows.foreach(nr => enforceConstraints(nr, cs,
        s"ManifestTable.mergeUpdate($path)"))
    }
    val v = prev + 1
    val rewritten: Seq[Entry] =
      if (sets.isEmpty) Seq.empty // insert-if-absent: nothing to patch
      else stagedRewrite(spark, path, v, schema, touch, "mergeUpdate",
        patch, extraRestatCols = (sets.map(_._1) :+ keyCol).distinct)
    val mSpec = partitionSpecOf(spark, path, prev)
    val inserted: Seq[Entry] = newRows match {
      case None => Seq.empty
      case Some(nr0) =>
        val nr = stampIds(spark, nr0, schema)
        if (mSpec.isEmpty) Seq(writeDirEntry(spark, nr, path, v, -1L,
          (statsCols :+ keyCol).distinct, bloomCols))
        else writePartitionedEntries(spark, nr, path, v, -1L,
          (statsCols :+ keyCol).distinct, bloomCols, mSpec,
          provenance = Seq.empty)
    }
    val consumed = if (sets.isEmpty) Set.empty[String]
      else touch.map(_.dir).toSet
    val committed = commitRewrite(spark, path, "mergeUpdate", prev,
      entries, consumed, rewritten ++ inserted, schema,
      (statsCols :+ keyCol).distinct, bloomCols, retries,
      added => added.forall(e => !envOverlap(e) ||
        !e.hasData(fs, s"$path/data/${e.dir}")))
    (committed, if (sets.isEmpty) 0 else touch.size)
  }

  /** One MERGE clause's effect on a row its group claims. */
  sealed trait MergeClauseAction
  object MergeClauseAction {
    /** Patch the row IN PLACE: SET columns from expressions that may
      * reference the target's columns by name and (in WHEN MATCHED
      * clauses) the source row's as `_src_<name>`. */
    final case class Update(
        sets: Seq[(String, org.apache.spark.sql.Column)])
        extends MergeClauseAction
    /** Drop the row. */
    case object Delete extends MergeClauseAction
  }

  /** The FULL ordered-clause MERGE statement — the general engine
    * behind `MERGE INTO … [WHEN MATCHED [AND p] THEN UPDATE/DELETE]…
    * [WHEN NOT MATCHED [AND p] THEN INSERT *]… [WHEN NOT MATCHED BY
    * SOURCE [AND p] THEN UPDATE/DELETE]…`, with a COMPOSITE key:
    * `keyCols` join the source to the table conjunctively, and each
    * row takes the FIRST clause of its group (matched / not-matched /
    * not-matched-by-source) whose condition evaluates true — exactly
    * ANSI's ordered-clause rule (a null condition is false; a row no
    * clause claims is untouched; unique source keys guarantee ANSI's
    * one-match rule by construction).
    *
    * Cost shape: matched-row updates/deletes PATCH dirs in place via
    * the shared staged-rewrite engine — with no BY SOURCE clause,
    * only dirs the composite key prune admits
    * ([[dirsHitByKeysMulti]]: per-column envelope AND per-row
    * conjunction AND Bloom tuples) are rewritten. A BY SOURCE clause
    * can touch any target row, so it rewrites every data dir — the
    * honest cost of that statement on any engine; Delta's is the
    * same. Inserted rows land as ONE appended dir (partition-pure on
    * a partitioned table). Everything commits atomically as one new
    * version.
    *
    * Conditions: matched-clause conditions may reference target
    * columns by name and source columns as `_src_<name>`;
    * not-matched (insert) conditions reference SOURCE columns by
    * plain name; by-source conditions and SET values reference
    * TARGET columns only. Each clause group may omit the condition
    * only on its LAST clause (an unconditional clause earlier would
    * make the rest unreachable — refused, like Delta). When any
    * insert clause exists the source must carry every table column
    * (the INSERT * contract). All boundary rules mirror
    * [[mergeUpdate]]: null/duplicate source keys, SETs on key or
    * partition-source columns, type drift — all loud. Returns
    * (new version, dirs rewritten). */
  def mergeClauses(spark: SparkSession, source: DataFrame, path: String,
      keyCols: Seq[String],
      matched: Seq[(Option[org.apache.spark.sql.Column],
        MergeClauseAction)] = Nil,
      notMatchedInsert: Seq[Option[org.apache.spark.sql.Column]] = Nil,
      notMatchedBySource: Seq[(Option[org.apache.spark.sql.Column],
        MergeClauseAction)] = Nil,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      maxBroadcastKeys: Long = 4000000L, retries: Int = 0,
      insertValues: Seq[
        Option[Seq[(String, org.apache.spark.sql.Column)]]] = Nil)
      : (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    // `insertValues` aligns 1:1 with `notMatchedInsert` when given:
    // None = INSERT * (the source row, whole), Some(sets) = a
    // PARTIAL-COLUMN insert — listed columns take their (source-
    // scoped) expressions, omitted columns take explicit typed NULLs,
    // which is legitimate exactly when every omitted column is
    // nullable (enforced below: an implicit null in a non-nullable
    // column is an accident, not semantics)
    require(insertValues.isEmpty ||
      insertValues.length == notMatchedInsert.length,
      s"ManifestTable.mergeClauses: insertValues (${insertValues.length})" +
        s" must align with notMatchedInsert (${notMatchedInsert.length})")
    val iv: Seq[Option[Seq[(String, org.apache.spark.sql.Column)]]] =
      if (insertValues.isEmpty) notMatchedInsert.map(_ => None)
      else insertValues
    require(matched.nonEmpty || notMatchedInsert.nonEmpty ||
      notMatchedBySource.nonEmpty,
      "ManifestTable.mergeClauses: no clauses — the statement can " +
        "have no effect")
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"ManifestTable.mergeClauses: key columns must be non-empty " +
        s"and distinct, got ${keyCols.mkString(", ")}")
    def lastOnlyUnconditional(
        g: Seq[Option[org.apache.spark.sql.Column]], what: String): Unit =
      require(g.isEmpty || g.init.forall(_.isDefined),
        s"ManifestTable.mergeClauses: only the LAST $what clause may " +
          "omit its condition — an earlier unconditional clause makes " +
          "the rest unreachable")
    lastOnlyUnconditional(matched.map(_._1), "WHEN MATCHED")
    lastOnlyUnconditional(notMatchedInsert, "WHEN NOT MATCHED")
    lastOnlyUnconditional(notMatchedBySource.map(_._1),
      "WHEN NOT MATCHED BY SOURCE")
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.mergeClauses: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val schema = tableSchema(spark, path, prev, entries)
    val fieldsByName = schema.fields.map(f => f.name -> f).toMap
    val keyFields = keyCols.map(k => fieldsByName.getOrElse(k,
      sys.error(s"ManifestTable.mergeClauses: no column '$k' in the " +
        s"table schema (${schema.fieldNames.mkString(", ")})")))
    keyFields.foreach(f => require(
      f.dataType == org.apache.spark.sql.types.StringType ||
        isIntegral(f.dataType),
      s"ManifestTable.mergeClauses: key '${f.name}' is " +
        s"${f.dataType.catalogString} — merge keys are integral or " +
        "string"))
    keyCols.foreach(k => require(source.columns.contains(k),
      s"ManifestTable.mergeClauses: source has no key column '$k'"))
    val insert = notMatchedInsert.nonEmpty
    // any INSERT * clause inserts the SOURCE ROW whole — the source
    // must then be exactly table-width; a statement whose every
    // insert clause lists explicit values only needs the keys (and
    // whatever columns its expressions reference)
    val wholeSrc = insert && iv.exists(_.isEmpty)
    if (wholeSrc)
      require(source.columns.toSet == schema.fieldNames.toSet,
        "ManifestTable.mergeClauses(INSERT): source columns " +
          source.columns.toSeq.sorted.mkString("[", ", ", "]") +
          " must equal the table's " +
          schema.fieldNames.toSeq.sorted.mkString("[", ", ", "]") +
          " — inserted rows are inserted whole")
    // explicit insert clauses: listed columns exist once each, and
    // every OMITTED column is nullable — the partial insert's nulls
    // are explicit semantics only when the schema says null is legal
    iv.flatten.foreach { sets =>
      require(sets.map(_._1).distinct.size == sets.size,
        "ManifestTable.mergeClauses: duplicate INSERT column in " +
          sets.map(_._1).mkString("[", ", ", "]"))
      sets.foreach { case (c, _) =>
        require(fieldsByName.contains(c),
          s"ManifestTable.mergeClauses: INSERT column '$c' is not " +
            s"in the table schema (${schema.fieldNames.mkString(", ")})")
      }
      val given = sets.map(_._1).toSet
      val badOmit = schema.fields.filterNot(f => given(f.name))
        .filterNot(_.nullable)
      require(badOmit.isEmpty,
        "ManifestTable.mergeClauses: a partial-column INSERT omits " +
          s"non-nullable column(s) ${badOmit.map(_.name)
            .mkString("'", "', '", "'")} — an implicit NULL there is " +
          "an accident, not semantics; list every non-nullable column")
    }
    val srcPrefix = "_src_"
    val collide = schema.fieldNames.filter(_.startsWith(srcPrefix))
    require(collide.isEmpty,
      s"ManifestTable.mergeClauses: table column(s) " +
        collide.mkString("'", "', '", "'") + s" collide with the " +
        s"'$srcPrefix' source-alias prefix — rename the column")
    // every SET column across every Update action: exists, not a key,
    // not a partition source; per-action duplicate SETs are loud
    val pSrcs = partitionSpecOf(spark, path, prev).map(_.src).toSet
    val allSets = (matched ++ notMatchedBySource).collect {
      case (_, MergeClauseAction.Update(sets)) => sets }
    // an EMPTY-set Update is legal: it claims the row (blocking later
    // clauses, exactly ANSI's ordered-clause rule) and changes
    // nothing — the shape `UPDATE SET *` takes when every column is
    // a key, or `SET c = c` after identity-dropping
    allSets.foreach { sets =>
      require(sets.map(_._1).distinct.size == sets.size,
        "ManifestTable.mergeClauses: duplicate SET column in " +
          sets.map(_._1).mkString("[", ", ", "]"))
      sets.foreach { case (c, _) =>
        require(fieldsByName.contains(c),
          s"ManifestTable.mergeClauses: SET column '$c' is not in " +
            s"the table schema (${schema.fieldNames.mkString(", ")})")
        require(!keyCols.contains(c),
          s"ManifestTable.mergeClauses: SET must not assign merge " +
            s"key '$c' — the key is the row's identity")
        require(!pSrcs.contains(c),
          s"ManifestTable.mergeClauses: SET touches partition-source " +
            s"column '$c' — an in-place update cannot re-derive " +
            "partition metadata; use whole-row merge or overwrite")
      }
    }
    // source keys arrive at the table's exact types (or widen)
    keyFields.foreach { kf =>
      val sk = source.schema.fields.find(_.name == kf.name).get
      require(sk.dataType.catalogString == kf.dataType.catalogString ||
          widens(sk.dataType, kf.dataType),
        s"ManifestTable.mergeClauses: source key '${kf.name}' is " +
          s"${sk.dataType.catalogString} but the table's is " +
          s"${kf.dataType.catalogString} — cast explicitly")
    }
    val batch = (if (wholeSrc) alignToTable(source, schema)
        .select(schema.fieldNames.map(col).toSeq: _*)
      else keyFields.foldLeft(source)((df, kf) =>
        df.withColumn(kf.name, col(kf.name).cast(kf.dataType))))
      .localCheckpoint()
    val srcEmpty = batch.head(1).isEmpty
    // an empty source is a no-op UNLESS a BY SOURCE clause exists:
    // then every target row is "not matched by source" and the
    // statement still has work to do
    if (srcEmpty && notMatchedBySource.isEmpty) return (prev, 0)
    if (!srcEmpty) {
      val nullKey = keyCols.map(k => col(k).isNull).reduce(_ || _)
      require(batch.filter(nullKey).head(1).isEmpty,
        s"ManifestTable.mergeClauses: source carries null key " +
          s"component(s) in (${keyCols.mkString(", ")}) — a null key " +
          "matches no row; assign keys or route those rows through " +
          "append")
      val dup = batch.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"ManifestTable.mergeClauses: source carries duplicate key " +
          s"${dup.headOption.map(r => keyCols.indices.map(r.get))} — " +
          "no defined winner (ANSI's one-match rule)")
    }
    // zero-row probe frame: table columns + _src_-aliased source
    // columns — types every condition and SET expression must check
    // against before any data work
    val joinedShape = org.apache.spark.sql.types.StructType(
      schema.fields ++ batch.schema.fields.map(f =>
        f.copy(name = srcPrefix + f.name)))
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], joinedShape)
    def checkBool(c: Option[org.apache.spark.sql.Column],
        what: String): Unit = c.foreach { cond =>
      val dt = probe.select(cond).schema.head.dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"ManifestTable.mergeClauses: $what condition has type " +
          s"${dt.catalogString}, not boolean")
    }
    matched.foreach(c => checkBool(c._1, "WHEN MATCHED"))
    notMatchedBySource.foreach(c =>
      checkBool(c._1, "WHEN NOT MATCHED BY SOURCE"))
    notMatchedInsert.foreach { c => c.foreach { cond =>
      val dt = batch.limit(0).select(cond).schema.head.dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        "ManifestTable.mergeClauses: WHEN NOT MATCHED condition has " +
          s"type ${dt.catalogString}, not boolean")
    }}
    // explicit insert VALUES type-check against the SOURCE scope
    // (they fire on unmatched source rows); a NULL literal passes —
    // it casts losslessly into any nullable column
    iv.flatten.foreach(_.foreach { case (c, e) =>
      val dt = batch.limit(0).select(e).schema.head.dataType
      val want = fieldsByName(c).dataType
      require(dt == org.apache.spark.sql.types.NullType ||
          dt.catalogString == want.catalogString || widens(dt, want),
        s"ManifestTable.mergeClauses: INSERT value for '$c' has type " +
          s"${dt.catalogString} but the column is " +
          s"${want.catalogString} — cast explicitly at the call site")
    })
    allSets.foreach(_.foreach { case (c, e) =>
      val dt = probe.select(e).schema.head.dataType
      val want = fieldsByName(c).dataType
      require(dt.catalogString == want.catalogString || widens(dt, want),
        s"ManifestTable.mergeClauses: SET '$c' expression has type " +
          s"${dt.catalogString} but the column is " +
          s"${want.catalogString} — cast explicitly at the call site")
    })
    val keySpec = keyFields.map(f => (f.name,
      f.dataType == org.apache.spark.sql.types.StringType))
    val (keyTouch, envOverlap, nKeys) =
      if (srcEmpty) (Seq.empty[Entry], (_: Entry) => false, 0L)
      else dirsHitByKeysMulti(spark, path, entries, batch, keySpec)
    // a BY SOURCE clause can claim ANY target row: every data dir is
    // in scope — the statement's honest cost on any engine
    val rowClauses = matched.nonEmpty || notMatchedBySource.nonEmpty
    val touch =
      if (!rowClauses) Seq.empty
      else if (notMatchedBySource.nonEmpty) entries.filter(e =>
        e.hasData(fs, s"$path/data/${e.dir}"))
      else keyTouch
    val srcAliased = batch.select(batch.columns.map(c =>
      col(c).as(srcPrefix + c)).toSeq: _*)
    val probeSrc =
      if (nKeys <= maxBroadcastKeys) broadcast(srcAliased) else srcAliased
    val rowMatched = col(srcPrefix + keyCols.head).isNotNull
    val firedM = "_graft_mfired"
    val firedS = "_graft_sfired"
    require(!schema.fieldNames.contains(firedM) &&
      !schema.fieldNames.contains(firedS),
      "ManifestTable.mergeClauses: column names _graft_mfired/" +
        "_graft_sfired are reserved for clause staging")
    def firedChain(
        clauses: Seq[(Option[org.apache.spark.sql.Column], MergeClauseAction)])
        : org.apache.spark.sql.Column =
      clauses.zipWithIndex.foldRight(
        lit(null).cast("int"): org.apache.spark.sql.Column) {
        case (((cond, _), i), acc) =>
          when(cond.getOrElse(lit(true)), lit(i)).otherwise(acc)
      }
    def deleteIdx(
        clauses: Seq[(Option[org.apache.spark.sql.Column], MergeClauseAction)])
        : Seq[Int] =
      clauses.zipWithIndex.collect {
        case ((_, MergeClauseAction.Delete), i) => i }
    val tableCols = schema.fieldNames.toSet
    def patch(df: DataFrame): DataFrame = {
      val joined = df.join(probeSrc,
        keyCols.map(k => col(k) === col(srcPrefix + k)).reduce(_ && _),
        "left")
        .withColumn(firedM,
          when(rowMatched, firedChain(matched)))
        .withColumn(firedS,
          when(!rowMatched, firedChain(notMatchedBySource)))
      def survives(fired: String, dels: Seq[Int])
          : org.apache.spark.sql.Column =
        if (dels.isEmpty) lit(true)
        else col(fired).isNull || !col(fired).isin(dels: _*)
      val kept = joined.filter(survives(firedM, deleteIdx(matched)) &&
        survives(firedS, deleteIdx(notMatchedBySource)))
      def patched(c: String): org.apache.spark.sql.Column = {
        val want = fieldsByName(c).dataType
        def overlay(fired: String,
            clauses: Seq[(Option[org.apache.spark.sql.Column],
              MergeClauseAction)],
            base: org.apache.spark.sql.Column)
            : org.apache.spark.sql.Column =
          clauses.zipWithIndex.foldLeft(base) {
            case (acc, ((_, MergeClauseAction.Update(sets)), i)) =>
              sets.find(_._1 == c) match {
                case Some((_, e)) =>
                  when(col(fired) === i, e.cast(want)).otherwise(acc)
                case None => acc
              }
            case (acc, _) => acc
          }
        overlay(firedS, notMatchedBySource,
          overlay(firedM, matched, col(c))).as(c)
      }
      val cols = schema.fieldNames.map(patched)
      val extra = df.columns.filterNot(tableCols).map(col)
      kept.select((cols ++ extra).toSeq: _*)
    }
    // not-matched inserts: the key prune is a conservative superset,
    // so ONE column-pruned scan of exactly the key-touched dirs
    // decides membership. With only INSERT * clauses the ordered
    // conditions reduce to their disjunction (WHICH clause fires
    // cannot change the inserted row); with explicit-VALUES clauses
    // the first-true clause index picks each row's column
    // expressions — same codegen'd when-chain shape as the matched
    // clauses' dispatch, still ONE pass over the unmatched rows
    val newRows =
      if (!insert || srcEmpty) None
      else {
        val absent =
          if (keyTouch.isEmpty) batch
          else batch.join(
            readableFrame(spark, path, schema, keyTouch)
              .select(keyCols.map(col): _*),
            keyCols, "left_anti")
        val nr0 =
          if (iv.forall(_.isEmpty)) {
            val pred = notMatchedInsert.map(_.getOrElse(lit(true)))
              .reduce(_ || _)
            absent.filter(pred)
          } else {
            val firedI = "_graft_ifired"
            require(!absent.columns.contains(firedI),
              "ManifestTable.mergeClauses: column name _graft_ifired " +
                "is reserved for clause staging — rename the column")
            val fired = notMatchedInsert.zipWithIndex.foldRight(
              lit(null).cast("int"): org.apache.spark.sql.Column) {
              case ((cond, i), acc) =>
                when(cond.getOrElse(lit(true)), lit(i)).otherwise(acc)
            }
            val withF = absent.withColumn(firedI, fired)
              .filter(col(firedI).isNotNull)
            val cols = schema.fieldNames.map { c =>
              val want = fieldsByName(c).dataType
              iv.zipWithIndex.foldLeft(
                lit(null).cast(want): org.apache.spark.sql.Column) {
                case (acc, (values, i)) =>
                  val e = values match {
                    // INSERT *: the source row's own column
                    case None => col(c).cast(want)
                    case Some(sets) => sets.find(_._1 == c)
                      .map(_._2.cast(want))
                      .getOrElse(lit(null).cast(want))
                  }
                  when(col(firedI) === i, e).otherwise(acc)
              }.as(c)
            }
            withF.select(cols.toSeq: _*)
          }
        val nr = nr0.localCheckpoint()
        if (nr.head(1).isEmpty) None else Some(nr)
      }
    val cs = constraintsOf(spark, path, prev)
    if (cs.nonEmpty) {
      if (touch.nonEmpty)
        enforceConstraints(patch(readableFrame(spark, path, schema,
          touch)), cs, s"ManifestTable.mergeClauses($path)")
      newRows.foreach(nr => enforceConstraints(nr, cs,
        s"ManifestTable.mergeClauses($path)"))
    }
    val v = prev + 1
    val restatCols = (allSets.flatten.map(_._1) ++ keyCols).distinct
    val rewritten: Seq[Entry] =
      if (touch.isEmpty) Seq.empty
      else stagedRewrite(spark, path, v, schema, touch, "mergeClauses",
        patch, extraRestatCols = restatCols)
    val mSpec = partitionSpecOf(spark, path, prev)
    val inserted: Seq[Entry] = newRows match {
      case None => Seq.empty
      case Some(nr0) =>
        val nr = stampIds(spark, nr0, schema)
        if (mSpec.isEmpty) Seq(writeDirEntry(spark, nr, path, v, -1L,
          (statsCols ++ keyCols).distinct, bloomCols))
        else writePartitionedEntries(spark, nr, path, v, -1L,
          (statsCols ++ keyCols).distinct, bloomCols, mSpec,
          provenance = Seq.empty)
    }
    if (rewritten.isEmpty && inserted.isEmpty && touch.isEmpty)
      return (prev, 0) // nothing claimed a row and nothing inserts
    // rebase gate: with a BY SOURCE clause any concurrently-added row
    // would have been claimed too — only data-less additions rebase;
    // otherwise stats must prove added dirs disjoint from the key
    // envelope on at least one key column
    val addedSafe: Seq[Entry] => Boolean =
      if (notMatchedBySource.nonEmpty)
        added => added.forall(e => !e.hasData(fs, s"$path/data/${e.dir}"))
      else
        added => added.forall(e => !envOverlap(e) ||
          !e.hasData(fs, s"$path/data/${e.dir}"))
    val committed = commitRewrite(spark, path, "mergeClauses", prev,
      entries, touch.map(_.dir).toSet, rewritten ++ inserted, schema,
      (statsCols ++ keyCols).distinct, bloomCols, retries, addedSafe)
    (committed, touch.size)
  }

}
