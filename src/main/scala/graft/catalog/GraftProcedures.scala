package graft.catalog

import graft.sinks.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL maintenance entry points — `CALL <cat>.system.compact(…)`
  * and friends (Spark 4 stored procedures, the Iceberg
  * `CALL system.…` shape) — so the cadence ops (compaction,
  * clustering, vacuum, deletion-vector materialization, rollback,
  * tagging) are reachable from PURE SQL like every read and DML
  * statement already is. Each procedure addresses its table by
  * catalog NAME (`'ns.table'`) or, for un-registered tables, by
  * path, runs the corresponding [[ManifestTable]] op, and returns
  * the op's summary as one result row — the numbers an operator's
  * cadence job logs.
  *
  * Why the ops live behind `CALL` and not OPTIMIZE-style statements:
  * procedures bind through the catalog (no parser extension to
  * maintain), argument names/types/defaults are declared metadata
  * (`DESCRIBE PROCEDURE` works), and the result row is a real
  * relation a maintenance DAG can inspect. */
private[catalog] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One procedure: declared parameters + a body returning
    * (result schema, result rows). Unbound and bound are the same
    * object — binding is a no-op because the parameter list is
    * static. */
  private final case class Proc(procName: String, doc: String,
      params: Seq[ProcedureParameter],
      body: (SparkSession, GraftCatalog, InternalRow) =>
        (StructType, Seq[InternalRow]))
      extends UnboundProcedure with BoundProcedure {
    // bound at load time by loadProcedure — the catalog the name
    // resolves through
    private[GraftProcedures] var owner: GraftCatalog = _
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (outSchema, outRows) = body(SparkSession.active, owner, input)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = outRows.toArray
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft.$procName result"
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def str(r: InternalRow, i: Int): String = {
    require(!r.isNullAt(i), s"argument ${i + 1} must not be NULL")
    r.getUTF8String(i).toString
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.map {
      case s: String => UTF8String.fromString(s)
      case x => x.asInstanceOf[AnyRef]
    }.toArray[Any])

  private def versionRow(v: Long): (StructType, Seq[InternalRow]) =
    (StructType(Seq(StructField("version", LongType, nullable = false))),
      Seq(row(v)))

  private val all: Seq[Proc] = Seq(
    Proc("compact",
      "compact(table[, target_file_bytes][, min_files]) - bin-pack " +
        "small data dirs toward target_file_bytes; returns the new " +
        "version (unchanged when nothing needed compaction).",
      Seq(p("table", StringType),
        pd("target_file_bytes", LongType, (128L << 20).toString),
        pd("min_files", IntegerType, "1")),
      (spark, cat, in) => versionRow(ManifestTable.compact(spark,
        cat.resolveTablePath(str(in, 0)), in.getLong(1), in.getInt(2)))),
    Proc("cluster",
      "cluster(table, stats_col, n_dirs) - rewrite the table into " +
        "n_dirs dirs range-clustered on stats_col so its recorded " +
        "min/max prune; returns the new version.",
      Seq(p("table", StringType), p("stats_col", StringType),
        p("n_dirs", IntegerType)),
      (spark, cat, in) => versionRow(ManifestTable.cluster(spark,
        cat.resolveTablePath(str(in, 0)), str(in, 1), in.getInt(2)))),
    Proc("cluster_z",
      "cluster_z(table, col_a, col_b, n_dirs) - rewrite into n_dirs " +
        "dirs Z-order-clustered on two columns (both prune); returns " +
        "the new version.",
      Seq(p("table", StringType), p("col_a", StringType),
        p("col_b", StringType), p("n_dirs", IntegerType)),
      (spark, cat, in) => versionRow(ManifestTable.clusterZ(spark,
        cat.resolveTablePath(str(in, 0)), str(in, 1), str(in, 2),
        in.getInt(3)))),
    Proc("vacuum",
      "vacuum(table[, keep_versions]) - drop snapshots older than " +
        "the newest keep_versions (tagged snapshots always survive) " +
        "and reap every unreferenced data dir; returns " +
        "(manifests_dropped, dirs_reaped).",
      Seq(p("table", StringType), pd("keep_versions", IntegerType, "1")),
      (spark, cat, in) => {
        val (m, d) = ManifestTable.vacuum(spark,
          cat.resolveTablePath(str(in, 0)), in.getInt(1))
        (StructType(Seq(
          StructField("manifests_dropped", IntegerType, nullable = false),
          StructField("dirs_reaped", IntegerType, nullable = false))),
          Seq(row(m, d)))
      }),
    Proc("expire_snapshots",
      "expire_snapshots(table, older_than_millis) - drop snapshots " +
        "whose commit time is older than the given epoch-millis " +
        "cutoff (the newest and tagged snapshots always survive) and " +
        "reap unreferenced dirs; returns (manifests_dropped, " +
        "dirs_reaped).",
      Seq(p("table", StringType), p("older_than_millis", LongType)),
      (spark, cat, in) => {
        val r = ManifestTable.vacuumOlderThan(spark,
          cat.resolveTablePath(str(in, 0)), in.getLong(1))
        (StructType(Seq(
          StructField("manifests_dropped", IntegerType, nullable = false),
          StructField("dirs_reaped", IntegerType, nullable = false))),
          Seq(row(r.manifestsDropped, r.dirsReaped)))
      }),
    Proc("rewrite_deletes",
      "rewrite_deletes(table) - materialize every pending deletion " +
        "vector (merge-on-read tombstones anti-joined out, dirs " +
        "re-statted exact); returns (version, dirs_rewritten).",
      Seq(p("table", StringType)),
      (spark, cat, in) => {
        val (v, n) = ManifestTable.rewriteDeletes(spark,
          cat.resolveTablePath(str(in, 0)))
        (StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("dirs_rewritten", IntegerType, nullable = false))),
          Seq(row(v, n)))
      }),
    Proc("restore",
      "restore(table, version) - roll the table back by committing a " +
        "NEW version whose content is exactly the retained snapshot " +
        "`version` (no data movement; history keeps the bad commits " +
        "visible); returns the new version.",
      Seq(p("table", StringType), p("version", LongType)),
      (spark, cat, in) => versionRow(ManifestTable.restore(spark,
        cat.resolveTablePath(str(in, 0)), in.getLong(1)))),
    Proc("create_tag",
      "create_tag(table, tag, version) - pin snapshot `version` under " +
        "an immutable name that survives vacuum (the reproducibility " +
        "primitive); returns the tagged version.",
      Seq(p("table", StringType), p("tag", StringType),
        p("version", LongType)),
      (spark, cat, in) => {
        ManifestTable.createTag(spark,
          cat.resolveTablePath(str(in, 0)), str(in, 1), in.getLong(2))
        versionRow(in.getLong(2))
      }),
    Proc("create_branch",
      "create_branch(table, branch[, from_version]) - fork a MUTABLE " +
        "ref at the given (default: latest) snapshot; stage commits " +
        "onto it with the appendToBranch API, audit with readBranch, " +
        "then fast_forward_branch or abandon_branch. Returns the " +
        "base version.",
      Seq(p("table", StringType), p("branch", StringType),
        pd("from_version", LongType, "-1")),
      (spark, cat, in) => versionRow(ManifestTable.createBranch(spark,
        cat.resolveTablePath(str(in, 0)), str(in, 1),
        Some(in.getLong(2)).filter(_ >= 0L)))),
    Proc("fast_forward_branch",
      "fast_forward_branch(table, branch) - publish every audited " +
        "branch commit onto main as ONE atomic commit (zero data " +
        "movement; validated against the table as it is NOW); " +
        "consumes the branch. Returns the committed version.",
      Seq(p("table", StringType), p("branch", StringType)),
      (spark, cat, in) => versionRow(ManifestTable.fastForwardBranch(
        spark, cat.resolveTablePath(str(in, 0)), str(in, 1)))),
    Proc("abandon_branch",
      "abandon_branch(table, branch) - discard a branch without " +
        "publishing (the audit's reject path); its dirs become " +
        "orphans the next vacuum reaps. Returns the table's current " +
        "version.",
      Seq(p("table", StringType), p("branch", StringType)),
      (spark, cat, in) => {
        val path = cat.resolveTablePath(str(in, 0))
        ManifestTable.abandonBranch(spark, path, str(in, 1))
        versionRow(ManifestTable.latestVersion(spark, path)
          .getOrElse(-1L))
      }),
    // branch-scoped DML: the audit FIXES a staged batch from SQL
    // instead of abandoning it — predicates/expressions arrive as
    // SQL strings and type-check against each branch commit's
    // schema before any data work
    Proc("delete_from_branch",
      "delete_from_branch(table, branch, predicate) - delete the " +
        "matching rows the BRANCH ADDED (its staged commits; base " +
        "rows are untouched — they are shared with main). The " +
        "predicate is a SQL boolean expression over the staged " +
        "columns. Returns the number of staged dirs rewritten.",
      Seq(p("table", StringType), p("branch", StringType),
        p("predicate", StringType)),
      (spark, cat, in) => countRow("dirs_rewritten",
        ManifestTable.deleteFromBranch(spark,
          cat.resolveTablePath(str(in, 0)), str(in, 1),
          org.apache.spark.sql.functions.expr(str(in, 2))).toLong)),
    Proc("update_branch",
      "update_branch(table, branch, predicate, set_col, set_expr) - " +
        "patch the matching staged rows IN PLACE: set_col takes the " +
        "SQL expression set_expr where the predicate is true (base " +
        "rows untouched). Returns the number of staged dirs " +
        "rewritten.",
      Seq(p("table", StringType), p("branch", StringType),
        p("predicate", StringType), p("set_col", StringType),
        p("set_expr", StringType)),
      (spark, cat, in) => countRow("dirs_rewritten",
        ManifestTable.updateBranch(spark,
          cat.resolveTablePath(str(in, 0)), str(in, 1),
          org.apache.spark.sql.functions.expr(str(in, 2)),
          Seq(str(in, 3) ->
            org.apache.spark.sql.functions.expr(str(in, 4)))).toLong)),
    Proc("compact_branch",
      "compact_branch(table, branch) - consolidate the branch's " +
        "staged commits into ONE (schemas fold additively, data " +
        "coalesces into a fresh dir set, a one-file pointer flip " +
        "commits it); the long-audit maintenance op. Returns " +
        "(commits_before, commits_after) - after is 1, or 0 when " +
        "every staged commit was empty (nothing left to stage).",
      Seq(p("table", StringType), p("branch", StringType)),
      (spark, cat, in) => {
        val (before, after) = ManifestTable.compactBranch(spark,
          cat.resolveTablePath(str(in, 0)), str(in, 1))
        (StructType(Seq(
          StructField("commits_before", LongType, nullable = false),
          StructField("commits_after", LongType, nullable = false))),
          Seq(new GenericInternalRow(
            Array[Any](before.toLong, after.toLong))))
      }),
    Proc("merge_to_branch",
      "merge_to_branch(table, branch, source_view, key_col) - " +
        "upsert the named view/table into the branch's STAGED " +
        "content by key: matching staged rows patch column-wise, " +
        "keys matching nothing in the branch state append as a new " +
        "branch commit, keys matching only BASE rows are refused " +
        "(the base is shared with main). Returns (dirs_rewritten, " +
        "rows_appended).",
      Seq(p("table", StringType), p("branch", StringType),
        p("source_view", StringType), p("key_col", StringType)),
      (spark, cat, in) => {
        val (touched, appended) = ManifestTable.mergeToBranch(spark,
          spark.table(str(in, 2)),
          cat.resolveTablePath(str(in, 0)), str(in, 1), str(in, 3))
        (StructType(Seq(
          StructField("dirs_rewritten", LongType, nullable = false),
          StructField("rows_appended", LongType, nullable = false))),
          Seq(new GenericInternalRow(
            Array[Any](touched.toLong, appended))))
      }),
    Proc("ann_index_drift",
      "ann_index_drift(index_path[, appended_max][, hot_cell_factor]" +
        "[, residual_factor]) - quantizer-drift report for a " +
        "persisted IVF-PQ index (appended fraction, occupancy skew, " +
        "residual ratio of appended vs base rows); " +
        "rebuild_recommended composes the thresholds and reasons " +
        "says which fired. Alarm on it and CALL rebuild_index.",
      Seq(p("index_path", StringType),
        pd("appended_max", DoubleType, "0.5"),
        pd("hot_cell_factor", DoubleType, "4.0"),
        pd("residual_factor", DoubleType, "1.5")),
      (spark, _, in) => {
        val r = graft.vector.IvfPq.driftReport(spark, str(in, 0),
          in.getDouble(1), in.getDouble(2), in.getDouble(3))
        (StructType(Seq(
          StructField("rows", LongType, nullable = false),
          StructField("cells", LongType, nullable = false),
          StructField("appended_fraction", DoubleType, nullable = false),
          StructField("max_cell_fraction", DoubleType, nullable = false),
          StructField("mean_residual_base", DoubleType, nullable = false),
          StructField("mean_residual_appended", DoubleType,
            nullable = false),
          StructField("rebuild_recommended", BooleanType,
            nullable = false),
          StructField("reasons", StringType, nullable = false))),
          Seq(row(r.rows, r.cells, r.appendedFraction,
            r.maxCellFraction, r.meanResidualBase,
            r.meanResidualAppended, r.rebuildRecommended,
            r.reasons.mkString("; "))))
      }),
    Proc("rebuild_index",
      "rebuild_index(index_path, m, k, n_centroids[, km_iters]) - " +
        "re-train both quantizers (k-means++ coarse + fresh PQ " +
        "codebooks) over the index's LIVE rows and rebuild in place " +
        "- what a fired ann_index_drift recommends; tombstoned rows " +
        "physically leave. Returns (rows, cells).",
      Seq(p("index_path", StringType), p("m", IntegerType),
        p("k", IntegerType), p("n_centroids", IntegerType),
        pd("km_iters", IntegerType, "4")),
      (spark, _, in) => {
        val (rows0, cells) = graft.vector.IvfPq.rebuild(spark,
          str(in, 0), in.getInt(1), in.getInt(2), in.getInt(3),
          in.getInt(4))
        (StructType(Seq(
          StructField("rows", LongType, nullable = false),
          StructField("cells", LongType, nullable = false))),
          Seq(row(rows0, cells)))
      }))

  private def countRow(name: String, n: Long)
      : (StructType, Seq[InternalRow]) =
    (StructType(Seq(StructField(name, LongType, nullable = false))),
      Seq(new GenericInternalRow(Array[Any](n))))

  def names: Seq[String] = all.map(_.procName)

  def load(owner: GraftCatalog, name: String): Option[UnboundProcedure] =
    all.find(_.procName == name).map { proc =>
      // a fresh instance per load: `owner` must never leak across
      // two catalog instances resolving concurrently
      val bound = proc.copy()
      bound.owner = owner
      bound
    }
}
