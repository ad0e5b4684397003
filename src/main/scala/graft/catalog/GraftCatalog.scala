package graft.catalog

import graft.sinks.{ManifestTable, PartitionTransform}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** The NAME front door for `graft-manifest` tables: a DataSourceV2
  * [[TableCatalog]] mapping `catalog.namespace.table` names to table
  * paths, so users address tables the way the reference's users do —
  * `cve.CVE_RECORDS` by name (/root/reference/chatbot_pg/main.py:89,
  * /root/reference/processor.py:55) — with `CREATE TABLE` /
  * `SELECT` / `INSERT` / `UPDATE` / `DELETE` / `MERGE` and no
  * per-path temp-view ceremony.
  *
  * Register with
  * `spark.sql.catalog.<name> = graft.catalog.GraftCatalog` and
  * `spark.sql.catalog.<name>.warehouse = <dir>`. The catalog stores
  * ONE small ref file per table (`<warehouse>/<ns…>/<table>.graftref`
  * — `path=` + `external=` lines); all table state lives in the
  * manifest table itself, so the catalog never becomes a second
  * source of truth that can drift from the data (the Iceberg
  * HadoopCatalog shape). `CREATE TABLE … PARTITIONED BY (days(ts),
  * bucket(16, id), …)` maps the standard v2 transforms onto this
  * format's hidden-partitioning [[PartitionTransform]] spec;
  * `TBLPROPERTIES ('statsCols'='…', 'bloomCols'='…')` seeds the
  * pruning discipline.
  *
  * Query planning: [[GraftV2Table]] carries no read/write capability
  * on purpose — [[graft.plans.ManifestCatalogRules]] (injected by
  * [[graft.GraftExtensions]]) swaps every resolved catalog relation
  * for the battle-tested V1 manifest relation
  * ([[graft.sources.ManifestFileIndex]] behind a HadoopFsRelation),
  * so stats/Bloom dir pruning, deletion-vector rewrites,
  * metadata-only aggregates, and the whole SQL DML surface work
  * IDENTICALLY by name and by path: one read path, not two to keep
  * correct. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.trim)
      .filter(_.nonEmpty).getOrElse(sys.error(
        s"graft catalog '$name': set spark.sql.catalog.$name.warehouse " +
          "to the directory that holds the catalog's table refs"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Namespace levels and table names become directory entries: the
    * same charset guard as every other name-to-path surface here, so
    * a crafted name can never traverse outside the warehouse. */
  private def segment(s: String, what: String): String = {
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' ||
      c == '-' || c == '.') && s != "." && s != "..",
      s"graft catalog: $what '$s' must be [A-Za-z0-9._-]+ (not . or ..)" +
        " — it becomes a directory entry")
    s
  }

  private def nsDir(ns: Array[String]): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      (warehouse +: ns.map(segment(_, "namespace level")).toSeq)
        .mkString("/"))

  private def refFile(ident: Identifier): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(nsDir(ident.namespace()),
      segment(ident.name(), "table name") + ".graftref")

  private def readRef(ident: Identifier): Option[(String, Boolean)] = {
    val f = refFile(ident)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString finally in.close()
      val kv = body.linesIterator.map(_.trim).filter(_.contains("="))
        .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
        .toMap
      val path = kv.getOrElse("path", sys.error(
        s"graft catalog: corrupt ref $f — no path= line"))
      Some((path, kv.get("external").exists(_.toBoolean)))
    }
  }

  private def writeRef(ident: Identifier, path: String,
      external: Boolean): Unit = {
    val f = refFile(ident)
    val out = fs.create(f, false) // no overwrite: create races are loud
    try out.write(s"path=$path\nexternal=$external\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Every ref in the warehouse, as (dotted name, recorded path,
    * external) — the ownership index the aliasing guards consult.
    * One recursive listing of tiny ref files; CREATE/DROP/RENAME are
    * rare enough that O(tables) here is the right trade against the
    * silent data loss an unchecked alias causes. */
  private def allRefs(): Seq[(String, String, Boolean)] = {
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(warehouse))
    if (!fs.exists(root)) return Seq.empty
    val out = Seq.newBuilder[(String, String, Boolean)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".graftref")) {
        val in = fs.open(st.getPath)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString finally in.close()
        val kv = body.linesIterator.map(_.trim).filter(_.contains("="))
          .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
          .toMap
        kv.get("path").foreach { p =>
          // both sides qualified through the SAME fs, so relativize
          // is exact whatever scheme spelling the warehouse used
          val rel = root.toUri
            .relativize(fs.makeQualified(st.getPath).toUri).getPath
          val name = rel.stripSuffix(".graftref").replace('/', '.')
          out += ((name, p, kv.get("external").exists(_.toBoolean)))
        }
      }
    }
    out.result()
  }

  /** Both sides qualified through the warehouse FileSystem so string
    * spelling (`/x` vs `file:/x`) never defeats an ownership check. */
  private def qualified(p: String): String =
    fs.makeQualified(new org.apache.hadoop.fs.Path(p)).toString

  private def samePath(a: String, b: String): Boolean =
    qualified(a) == qualified(b)

  private def pathUnder(p: String, dir: org.apache.hadoop.fs.Path)
      : Boolean = {
    val d = fs.makeQualified(dir).toString
    val q = qualified(p)
    q == d || q.startsWith(d + "/")
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(dir).filter(st => !st.isDirectory &&
        st.getPath.getName.endsWith(".graftref"))
      .map(st => Identifier.of(namespace,
        st.getPath.getName.stripSuffix(".graftref")))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    readRef(ident).isDefined

  override def loadTable(ident: Identifier): Table = {
    val (path, _) = readRef(ident).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq) :+ ident.name()))
    GraftV2Table(fullName(ident), path, None, None)
  }

  /** `VERSION AS OF <v>` time travel by name — the pinned version
    * rides into the V1 relation's `versionAsOf` read option. A
    * non-numeric version is a TAG name (Iceberg's ref-based time
    * travel: `VERSION AS OF 'pre-migration'`), resolved to its
    * pinned snapshot here so the pin survives vacuum exactly like
    * the numeric form. A NUMERIC string resolves as a snapshot
    * number only when that snapshot is actually retained — otherwise
    * it falls back to the tag map (an all-digit tag name like '2024'
    * stays reachable) and only then is loud, naming both the
    * retained range and the live tags (a mistyped number gets the
    * helpful error instead of a late scan failure). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (path, _) = readRef(ident).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq) :+ ident.name()))
    def asTag: Option[Long] =
      ManifestTable.tags(spark, path).get(version.trim)
    val v = version.trim.toLongOption match {
      case Some(n)
          if ManifestTable.versions(spark, path).contains(n) => n
      case Some(n) => asTag.getOrElse {
        val retained = ManifestTable.versions(spark, path)
        sys.error(s"graft catalog: $n is not a retained snapshot of " +
          s"${fullName(ident)} (retained: " +
          s"${retained.headOption.getOrElse(-1L)}.." +
          s"${retained.lastOption.getOrElse(-1L)}) and no tag is " +
          s"named '$version' — tags: " + ManifestTable.tags(spark, path)
            .keys.toSeq.sorted.mkString(", "))
      }
      case None => asTag.getOrElse(sys.error(
        s"graft catalog: '${version}' is neither a version number " +
          s"nor a tag of ${fullName(ident)} — tags: " +
          ManifestTable.tags(spark, path)
            .keys.toSeq.sorted.mkString(", ")))
    }
    GraftV2Table(fullName(ident), path, Some(v.toString), None)
  }

  /** `TIMESTAMP AS OF <t>` time travel by name — Spark hands the
    * instant as MICROseconds since epoch; the manifest read option
    * takes milliseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long)
      : Table = {
    val (path, _) = readRef(ident).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq) :+ ident.name()))
    GraftV2Table(fullName(ident), path, None,
      Some(Math.floorDiv(timestampMicros, 1000L)))
  }

  private def fullName(ident: Identifier): String =
    ((catalogName +: ident.namespace().toSeq) :+ ident.name())
      .mkString(".")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    val provider = props.get(TableCatalog.PROP_PROVIDER)
    require(provider.forall(_.equalsIgnoreCase("graft-manifest")),
      s"graft catalog: USING ${provider.get} is not this catalog's " +
        "format — every table here is 'graft-manifest'")
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val ns = nsDir(ident.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(
      catalogName +: ident.namespace().toSeq)
    val external = props.get(TableCatalog.PROP_LOCATION)
    val path = external.getOrElse(
      new org.apache.hadoop.fs.Path(ns,
        segment(ident.name(), "table name")).toString)
    val spec = partitions.map(v2Transform).toSeq
    def listProp(k: String): Seq[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    ManifestTable.latestVersion(spark, path) match {
      case Some(v) =>
        // adopting an EXISTING manifest table under a name: the
        // table's own persisted schema/spec govern — a conflicting
        // CREATE schema is refused, never silently rewritten
        val owners = allRefs().filter(r => samePath(r._2, path))
        require(owners.isEmpty,
          s"graft catalog: the committed table at $path is already " +
            s"registered as ${owners.map(_._1).mkString(", ")} — two " +
            "names for one data dir make every DROP a data-loss " +
            "hazard; DROP the existing name first (or point LOCATION " +
            "elsewhere)")
        val existing = ManifestTable.schemaOf(spark, path, v).getOrElse(
          sys.error(s"graft catalog: no schema sidecar at $path"))
        require(schema.isEmpty ||
          schema.fields.map(f => (f.name, f.dataType)).toSeq ==
            existing.fields.map(f => (f.name, f.dataType)).toSeq,
          s"graft catalog: CREATE TABLE schema does not match the " +
            s"committed table at $path — omit the column list to " +
            "adopt the existing schema, or evolve through the write " +
            "path")
        require(partitions.isEmpty,
          "graft catalog: PARTITIONED BY on an existing table is not " +
            "supported — the table's own persisted spec governs")
        // statsCols/bloomCols TBLPROPERTIES on adoption: honored via
        // one empty metadata commit that unions them into the
        // table's persisted pruning discipline (append unions, never
        // replaces) — silently ignoring them would leave the user
        // believing the discipline was seeded
        val (adoptStats, adoptBloom) =
          (listProp("statsCols"), listProp("bloomCols"))
        if (adoptStats.nonEmpty || adoptBloom.nonEmpty) {
          val (haveS, haveB) = ManifestTable.pruningOf(spark, path, v)
          if (!adoptStats.forall(haveS.contains) ||
              !adoptBloom.forall(haveB.contains)) {
            val empty = spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              existing)
            ManifestTable.append(spark, empty, path,
              statsCols = adoptStats, bloomCols = adoptBloom)
          }
        }
      case None =>
        require(schema.nonEmpty,
          s"graft catalog: CREATE TABLE at fresh location $path needs " +
            "a column list (there is no committed schema to adopt)")
        // the creating commit: an empty v1 snapshot carrying the
        // schema, the partition spec, and the pruning discipline —
        // exactly what the first INSERT resolves against
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        ManifestTable.append(spark, empty, path,
          statsCols = listProp("statsCols"),
          bloomCols = listProp("bloomCols"), partitionSpec = spec)
    }
    writeRef(ident, path, external.isDefined)
    GraftV2Table(fullName(ident), path, None, None)
  }

  /** One standard v2 partition transform → this format's
    * [[PartitionTransform]]. Loud on anything unmapped — a silently
    * dropped transform would create an unpartitioned table the user
    * believes is partitioned. */
  private def v2Transform(t: Transform): PartitionTransform = {
    def oneCol: String = t.references() match {
      case Array(r) if r.fieldNames().length == 1 => r.fieldNames()(0)
      case _ => sys.error(s"graft catalog: transform $t must " +
        "reference exactly one top-level column")
    }
    def intArg: Int = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] =>
        l.value().asInstanceOf[Number].intValue()
    }.getOrElse(sys.error(
      s"graft catalog: transform $t needs an integer literal argument"))
    t.name() match {
      case "identity" => PartitionTransform.PIdentity(oneCol)
      case "days" => PartitionTransform.PDays(oneCol)
      case "months" => PartitionTransform.PMonths(oneCol)
      case "years" => PartitionTransform.PYears(oneCol)
      case "hours" => PartitionTransform.PHours(oneCol)
      case "bucket" => PartitionTransform.PBucket(intArg, oneCol)
      case "truncate" => PartitionTransform.PTruncate(intArg, oneCol)
      case other => sys.error(
        s"graft catalog: unsupported partition transform '$other' — " +
          "supported: identity, days, months, years, hours, " +
          "bucket(n), truncate(len)")
    }
  }

  /** `ALTER TABLE … ADD COLUMN(S)` — the ONE alter this format can
    * honor exactly: additive, nullable, top-level columns commit as
    * an empty evolving append (one metadata commit; existing dirs
    * read the new column as null, the standard evolution-on-read).
    * Every other change — drops, renames, type changes, positions,
    * NOT NULL — is refused loudly: each would rewrite or reinterpret
    * committed data, which belongs to explicit table ops. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val (path, _) = readRef(ident).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq) :+ ident.name()))
    // RENAME/DROP COLUMN are single-change metadata commits on the
    // field-id mapping (ManifestTable.renameColumn/dropColumn) —
    // routed before the additive-ADD path below
    changes match {
      // RENAME/DROP accept NESTED paths (meta.n): the field-id map is
      // per-leaf, so the leaf renames inside its struct and old files
      // resolve it by id
      case Seq(r: TableChange.RenameColumn) =>
        ManifestTable.renameColumn(spark, path,
          r.fieldNames().mkString("."), r.newName())
        return loadTable(ident)
      case Seq(d: TableChange.DeleteColumn) =>
        ManifestTable.dropColumn(spark, path,
          d.fieldNames().mkString("."))
        return loadTable(ident)
      // ALTER COLUMN ... TYPE: Spark's analyzer admits only up-casts
      // here (Cast.canUpCast); the table accepts the strictly
      // value-preserving subset (int chain -> bigint, float ->
      // double) as one metadata commit — old files read widened,
      // anything else is loud (ManifestTable.widenColumnType)
      // a NESTED add (meta.x) is its own metadata commit — the
      // evolve-append below only expresses top-level addition
      case Seq(a: TableChange.AddColumn) if a.fieldNames().length > 1 =>
        require(a.isNullable,
          s"graft catalog: ADD COLUMN ${a.fieldNames().mkString(".")}" +
            " must be nullable — existing rows have no value for it")
        require(a.position() == null,
          "graft catalog: ADD COLUMN position clauses are not " +
            "supported — new fields append at the end of their struct")
        ManifestTable.addNestedColumn(spark, path,
          a.fieldNames().init.mkString("."), a.fieldNames().last,
          a.dataType())
        return loadTable(ident)
      // accepts NESTED dotted paths too — the leaf widens in place
      // inside its struct (widenColumnType resolves dotted names)
      case Seq(u: TableChange.UpdateColumnType) =>
        ManifestTable.widenColumnType(spark, path,
          u.fieldNames().mkString("."), u.newDataType())
        return loadTable(ident)
      case _ =>
    }
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "graft catalog: a NESTED add must be its own statement " +
            s"(one field per ALTER), got ${a.fieldNames().mkString(".")}")
        require(a.isNullable,
          s"graft catalog: ADD COLUMN ${a.fieldNames()(0)} must be " +
            "nullable — existing rows have no value for it")
        require(a.position() == null,
          "graft catalog: ADD COLUMN position clauses are not " +
            "supported — new columns append at the end")
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)
      case other => sys.error(
        s"graft catalog: unsupported ALTER TABLE change $other — " +
          "only additive nullable ADD COLUMN is metadata-exact; " +
          "row-changing alters go through the table's own ops")
    }
    val v = ManifestTable.latestVersion(spark, path).getOrElse(
      sys.error(s"graft catalog: no committed version at $path"))
    val base = ManifestTable.schemaOf(spark, path, v).getOrElse(
      sys.error(s"graft catalog: no schema sidecar at $path"))
    adds.foreach(f => require(!base.fieldNames.contains(f.name),
      s"graft catalog: column '${f.name}' already exists"))
    val evolved = StructType(base.fields ++ adds)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evolved)
    val (statsCols, bloomCols) = ManifestTable.pruningOf(spark, path, v)
    ManifestTable.append(spark, empty, path, statsCols = statsCols,
      evolveSchema = true, bloomCols = bloomCols)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    readRef(ident) match {
      case None => false
      case Some((path, external)) =>
        // managed data is dropped with the name; an EXTERNAL location
        // only loses its name (the LOCATION's owner keeps the data).
        // Belt-and-braces against a legacy alias (two refs recording
        // one path — impossible to create since the adoption guard,
        // but a pre-guard warehouse may carry one): deleting the data
        // would destroy the OTHER name's table, so refuse loudly.
        if (!external) {
          val me = fullName(ident).stripPrefix(catalogName + ".")
          val others = allRefs().filter(r =>
            r._1 != me && samePath(r._2, path))
          require(others.isEmpty,
            s"graft catalog: the managed data at $path is also " +
              s"registered as ${others.map(_._1).mkString(", ")} — " +
              "dropping this name would destroy that table; drop the " +
              "alias ref first")
          fs.delete(new org.apache.hadoop.fs.Path(path), true)
        }
        fs.delete(refFile(ident), false)
    }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val (path, external) = readRef(oldIdent).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: oldIdent.namespace().toSeq) :+ oldIdent.name()))
    if (!fs.exists(nsDir(newIdent.namespace())))
      throw new NoSuchNamespaceException(
        catalogName +: newIdent.namespace().toSeq)
    // crash-window RE-RUN of this exact rename: the forward ref is
    // written BEFORE the data moves (see below), so a crash between
    // the two leaves a new ref whose managed target dir does not
    // exist yet — provably our residue, never a live table (a
    // managed table's ref always resolves to its data dir). The
    // re-run RESUMES the move instead of failing TableAlreadyExists
    // (which would force a manual ref delete — the exact recovery
    // this ordering was built to avoid).
    val expectedTo = new org.apache.hadoop.fs.Path(
      nsDir(newIdent.namespace()),
      segment(newIdent.name(), "table name"))
    val resuming = !external && readRef(newIdent).exists {
      case (np, ext2) => !ext2 &&
        samePath(np, expectedTo.toString) && !fs.exists(expectedTo)
    }
    if (tableExists(newIdent) && !resuming)
      throw new TableAlreadyExistsException(
        (catalogName +: newIdent.namespace().toSeq) :+ newIdent.name())
    if (external) {
      // an EXTERNAL location is owned by whoever supplied it: only
      // the ref moves, the data stays at its address
      writeRef(newIdent, path, external)
      fs.delete(refFile(oldIdent), false)
    } else {
      // MANAGED data moves WITH the name. Leaving it behind at
      // <ns>/<oldName> would let a later CREATE TABLE with the old
      // name silently adopt this table's live data (two refs, one
      // dir — every DROP a data-loss hazard) and would let DROP
      // NAMESPACE CASCADE on the old namespace delete data the
      // surviving ref still serves. fs.rename is the move primitive
      // everywhere else here (staging promotion); on a true object
      // store it costs a copy — the price of never aliasing.
      val from = new org.apache.hadoop.fs.Path(path)
      val to = expectedTo
      require(!fs.exists(to),
        s"graft catalog: rename target dir $to already exists — " +
          "refusing to adopt or overwrite it")
      // the NEW ref is written BEFORE the data moves, so every crash
      // point leaves at least one ref resolving to the live data:
      // crash before the move = old ref still serves it (the new ref
      // dangles at an empty path — the `resuming` branch above picks
      // the re-run up here and finishes the move); crash after = the
      // new ref serves it. The old order (move, then write ref)
      // had a window where the only ref pointed at the moved-away
      // path: an unreadable table with no automatic recovery.
      if (!resuming) writeRef(newIdent, to.toString, external = false)
      try require(fs.rename(from, to),
        s"graft catalog: could not move managed data $from -> $to")
      catch {
        case e: Throwable =>
          // the move failed OUTRIGHT (same-process): retract the
          // forward ref rather than leave a dangling name (on a
          // resume the residual ref was equally dangling — retracting
          // it returns the warehouse to the plain pre-rename state)
          fs.delete(refFile(newIdent), false)
          throw e
      }
      fs.delete(refFile(oldIdent), false)
    }
    ()
  }

  // ---- procedures: CALL <cat>.system.<op>(…) ----

  /** A procedure argument's table address: a registered
    * `ns.table` name in THIS catalog, or (for un-registered tables)
    * a raw path — distinguished by the path separator, which the
    * name charset guard forbids in names. */
  private[catalog] def resolveTablePath(table: String): String =
    if (table.contains("/")) table
    else {
      val parts = table.split('.')
      require(parts.length >= 2,
        s"graft catalog: procedure table argument '$table' must be " +
          "'namespace.table' (a name in this catalog) or a path")
      val ident = Identifier.of(parts.init, parts.last)
      readRef(ident).map(_._1).getOrElse(
        throw new NoSuchTableException(
          (catalogName +: parts.init.toSeq) :+ parts.last))
    }

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft catalog: procedures live in the 'system' namespace — " +
        s"CALL $catalogName.system.<op>(…), got " +
        ident.namespace().mkString("."))
    GraftProcedures.load(this, ident.name()).getOrElse(sys.error(
      s"graft catalog: no procedure '${ident.name()}' — available: " +
        GraftProcedures.names.mkString(", ")))
  }

  // ---- namespaces ----

  private def isNamespaceDir(p: org.apache.hadoop.fs.Path): Boolean =
    fs.getFileStatus(p).isDirectory &&
      !fs.exists(new org.apache.hadoop.fs.Path(p, "manifest"))

  override def listNamespaces(): Array[Array[String]]  = {
    val root = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(st => st.isDirectory &&
        isNamespaceDir(st.getPath))
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(dir).filter(st => st.isDirectory &&
        isNamespaceDir(st.getPath))
      .map(st => namespace :+ st.getPath.getName)
      .sortBy(_.mkString("."))
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    Map(SupportsNamespaces.PROP_LOCATION ->
      nsDir(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(
        (catalogName +: namespace.toSeq).toArray)
    fs.mkdirs(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    sys.error("graft catalog: ALTER NAMESPACE is not supported — the " +
      "namespace is a directory, nothing more")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) return false
    if (!cascade)
      require(fs.listStatus(dir).isEmpty,
        s"graft catalog: namespace ${namespace.mkString(".")} is not " +
          "empty — use CASCADE to drop its tables (managed data " +
          "included)")
    else {
      // cascade drops the WHOLE subtree the way per-entity drops
      // would: nested namespaces recurse first, then this level's
      // tables (each through dropTable, which honors EXTERNAL and
      // refuses legacy aliases) — never a blind recursive delete
      listNamespaces(namespace).foreach(child =>
        dropNamespace(child, cascade = true))
      listTables(namespace).foreach(dropTable)
    }
    // ownership guard before the recursive delete: a ref OUTSIDE this
    // namespace may record a data dir under it (a legacy pre-move
    // rename, a crafted LOCATION) — deleting the dir would destroy
    // that table while its ref dangles
    val strays = allRefs().filter(r => pathUnder(r._2, dir))
    require(strays.isEmpty,
      s"graft catalog: table(s) ${strays.map(_._1).mkString(", ")} " +
        s"still record data under ${namespace.mkString(".")} — " +
        "dropping the namespace dir would destroy them; DROP or " +
        "relocate those tables first")
    fs.delete(dir, true)
  }
}

/** A named `graft-manifest` table as the catalog surfaces it: pure
  * METADATA (name, path, schema/partitioning read from the table's
  * own sidecars, optional pinned version/timestamp) with NO
  * capabilities — [[graft.plans.ManifestCatalogRules]] swaps every
  * resolved reference for the V1 manifest relation before any
  * capability check runs, so reads, writes, and DML all travel the
  * one proven path. */
final case class GraftV2Table(tableName: String, path: String,
    versionAsOf: Option[String], timestampAsOfMillis: Option[Long])
    extends Table
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  override def name(): String = tableName

  /** `TRUNCATE TABLE <name>` — the one DML statement that executes
    * through the v2 table itself (no plan rewrite to intercept): one
    * atomic empty overwrite, exactly `DELETE FROM t` without a WHERE
    * (old snapshots survive until vacuum; the pruning discipline and
    * watermark carry). Loud on a time-travel pin — history is
    * immutable. */
  override def truncateTable(): Boolean = {
    require(versionAsOf.isEmpty && timestampAsOfMillis.isEmpty,
      s"graft catalog: cannot TRUNCATE a time-travel pin of " +
        s"$tableName — snapshots are immutable")
    graft.plans.GraftManifestFullDeleteCommand(path)
      .run(SparkSession.active)
    true
  }

  /** The snapshot every metadata read resolves against: the
    * TIME-TRAVEL pin when the reference carries one (the table may
    * have evolved since), else the latest commit. */
  private def resolvedVersion(spark: SparkSession): Option[Long] =
    versionAsOf.map(_.toLong)
      .orElse(timestampAsOfMillis.map(ms =>
        ManifestTable.versionAtTimestamp(spark, path, ms)))
      .orElse(ManifestTable.latestVersion(spark, path))

  override def schema(): StructType = {
    val spark = SparkSession.active
    val v = resolvedVersion(spark).getOrElse(sys.error(
      s"graft catalog: no committed version at $path — was the " +
        "table's data deleted out from under its name?"))
    ManifestTable.schemaOf(spark, path, v).getOrElse(
      sys.error(s"graft catalog: no schema sidecar at $path ${v}"))
  }

  override def partitioning(): Array[Transform] = {
    // resolved exactly like schema(): a pinned read's EXPLAIN/DESCRIBE
    // must surface the PINNED snapshot's spec, not the latest
    val spark = SparkSession.active
    resolvedVersion(spark).toSeq
      .flatMap(v => ManifestTable.partitionSpecOf(spark, path, v))
      .map {
        case PartitionTransform.PIdentity(s) => Expressions.identity(s)
        case PartitionTransform.PDays(s) => Expressions.days(s)
        case PartitionTransform.PMonths(s) => Expressions.months(s)
        case PartitionTransform.PYears(s) => Expressions.years(s)
        case PartitionTransform.PHours(s) => Expressions.hours(s)
        case PartitionTransform.PBucket(n, s) => Expressions.bucket(n, s)
        case PartitionTransform.PTruncate(len, s) => Expressions.apply(
          "truncate", Expressions.literal(len), Expressions.column(s))
      }.toArray
  }

  override def properties(): java.util.Map[String, String] = {
    // surface the pruning discipline too, so SHOW TBLPROPERTIES
    // answers "which columns prune" without reading the manifest API.
    // Resolved via the TIME-TRAVEL pin like schema()/partitioning():
    // a pinned read's DESCRIBE must describe the pinned snapshot,
    // not whatever the table evolved into since.
    val spark = SparkSession.active
    val pruning = resolvedVersion(spark)
      .map(v => ManifestTable.pruningOf(spark, path, v))
      .getOrElse((Nil, Nil))
    (Map(TableCatalog.PROP_LOCATION -> path,
      TableCatalog.PROP_PROVIDER -> "graft-manifest") ++
      (if (pruning._1.nonEmpty)
        Map("statsCols" -> pruning._1.mkString(",")) else Map.empty) ++
      (if (pruning._2.nonEmpty)
        Map("bloomCols" -> pruning._2.mkString(",")) else Map.empty))
      .asJava
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.emptySet()
}
