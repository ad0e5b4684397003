package graft.plans

import graft.catalog.GraftV2Table
import graft.sinks.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Bridges the catalog's NAME world onto the V1 manifest read path:
  * every resolved [[DataSourceV2Relation]] over a [[GraftV2Table]] is
  * swapped — exprIds preserved, so references already resolved above
  * stay valid — for the same `HadoopFsRelation(ManifestFileIndex)`
  * relation a path read produces. One read path: the stats/Bloom dir
  * pruning, deletion-vector rewrite ([[ManifestApplyDeletes]]),
  * metadata-only aggregates ([[ManifestMetadataAggs]]), and the whole
  * SQL DML surface ([[ManifestSqlRules]] — whose ManifestTarget then
  * matches the swapped relation inside DELETE/UPDATE/MERGE targets)
  * work identically by name and by path, with no v2 reimplementation
  * to keep correct.
  *
  * INSERT needs its own cases: Spark's ResolveInsertInto converts
  * `InsertIntoStatement` over a v2 relation into [[AppendData]] /
  * [[OverwriteByExpression]] in the same resolution batch (the
  * relation is NOT a child of those commands, so the swap above never
  * reaches it) — once the analyzer has aligned the query to the
  * table schema (`outputResolved`), those commands map onto the same
  * [[GraftManifestInsertCommand]] the path-addressed INSERT uses. */
object ManifestCatalogRules extends Rule[LogicalPlan] {

  /** The v2 relation's GraftV2Table, when that is what it is. */
  private object GraftRelation {
    def unapply(plan: LogicalPlan): Option[(GraftV2Table,
        Seq[AttributeReference])] = plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftV2Table => Some((t, r.output))
        case _ => None
      }
      case _ => None
    }
  }

  /** The V1 manifest relation for `t`, re-identified to the v2
    * relation's attribute ids. Schema drift between loadTable and
    * this swap (a concurrent evolve) is loud, never coerced. A table
    * carrying PENDING DELETION VECTORS analyzes to the dv rewrite
    * ([[ManifestApplyDeletes]]'s tagged root), not a bare
    * LogicalRelation — bridged by re-aliasing its output to the v2
    * ids and carrying the rewrite tag forward, so named reads see
    * tombstoned rows filtered exactly like path reads and named DML
    * still recognizes its target. */
  private def v1Relation(t: GraftV2Table,
      output: Seq[AttributeReference]): LogicalPlan = {
    val spark = SparkSession.active
    var reader = spark.read.format("graft-manifest")
    t.versionAsOf.foreach(v => reader = reader.option("versionAsOf", v))
    t.timestampAsOfMillis.foreach(ms =>
      reader = reader.option("timestampAsOf", ms.toString))
    val analyzed = reader.load(t.path).queryExecution.analyzed
    def checkSchema(p: LogicalPlan): Unit =
      require(p.output.map(a => (a.name, a.dataType)) ==
          output.map(a => (a.name, a.dataType)),
        s"graft catalog: table '${t.tableName}' changed schema between " +
          s"name resolution and planning (now ${p.schema.catalogString})" +
          " — re-run the statement")
    analyzed match {
      case l: LogicalRelation =>
        checkSchema(l)
        l.copy(output = output.toIndexedSeq)
      case p if p.getTagValue(ManifestApplyDeletes.DvRewriteTag)
          .isDefined =>
        checkSchema(p)
        val aliased = Project(p.output.zip(output).map { case (a, o) =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, o.name)(
            exprId = o.exprId)
        }, p)
        aliased.setTagValue(ManifestApplyDeletes.DvRewriteTag,
          p.getTagValue(ManifestApplyDeletes.DvRewriteTag).get)
        aliased
      case other => sys.error("graft catalog: the path read planned " +
        s"as ${other.nodeName}, not a LogicalRelation — cannot bridge")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case GraftRelation(t, output) => v1Relation(t, output)

      // `spark.readStream.table("g.db.docs")` — the streaming twin of
      // the batch swap: the name resolves to the SAME V1 stream
      // source `readStream.format("graft-manifest").load(path)`
      // builds (exactly-once version-range micro-batches, rate
      // limits, readChangeFeed — all options pass through). Table
      // columns keep the v2 relation's exprIds; the change-feed
      // metadata columns (absent from the table schema) append as
      // the v1 source's own attributes.
      case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if s.table.isInstanceOf[GraftV2Table] =>
        val t = s.table.asInstanceOf[GraftV2Table]
        require(t.versionAsOf.isEmpty && t.timestampAsOfMillis.isEmpty,
          "graft catalog: time travel on a streaming read is not " +
            "supported — a stream's position is its checkpoint")
        val spark = SparkSession.active
        import scala.jdk.CollectionConverters._
        val ds = org.apache.spark.sql.execution.datasources.DataSource(
          spark, className = "graft-manifest",
          options = s.extraOptions.asScala.toMap + ("path" -> t.path))
        val v1 = org.apache.spark.sql.execution.streaming.runtime
          .StreamingRelation(ds)
        val byName: Map[String, Attribute] =
          s.output.map(a => a.name -> (a: Attribute)).toMap
        val out: Seq[Attribute] = v1.output.map(a =>
          byName.get(a.name) match {
            case Some(prev) =>
              require(prev.dataType == a.dataType,
                s"graft catalog: table '${t.tableName}' changed schema " +
                  "between name resolution and stream planning — " +
                  "re-run the statement")
              prev
            case None => a
          })
        v1.copy(output = out)

      case a: AppendData if a.query.resolved && a.outputResolved =>
        a.table match {
          case GraftRelation(t, _) =>
            // the analyzer aligned the query to the table schema
            // (names + store-assignment casts), so by-name alignment
            // in the command is exact for both INSERT flavors
            GraftManifestInsertCommand(t.path, a.query,
              overwrite = false, byName = true)
          case _ => a
        }

      case o: OverwriteByExpression if o.query.resolved &&
          o.outputResolved =>
        o.table match {
          case GraftRelation(t, _) =>
            o.deleteExpr match {
              case Literal(true, _) =>
                GraftManifestInsertCommand(t.path, o.query,
                  overwrite = true, byName = true)
              case other => sys.error(
                "graft catalog: INSERT OVERWRITE with a static " +
                  s"partition filter (${other.sql}) is not supported " +
                  "— this format overwrites whole tables; partition " +
                  "retention goes through DELETE / dropPartitions")
            }
          case _ => o
        }

      case d: OverwritePartitionsDynamic =>
        d.table match {
          case GraftRelation(t, _) => sys.error(
            "graft catalog: dynamic partition overwrite on " +
              s"'${t.tableName}' is not supported — this format " +
              "overwrites whole tables; use MERGE for row-level " +
              "replacement")
          case _ => d
        }

      // CREATE TABLE … AS SELECT: Spark's v2 exec path writes through
      // table capabilities this catalog deliberately doesn't expose —
      // route it as createTable + the same one-commit append the SQL
      // INSERT command uses instead (both halves are the proven
      // primitives; a crash between them leaves an empty created
      // table, never a half-written one)
      case c: CreateTableAsSelect if c.query.resolved =>
        (c.name, c.tableSpec) match {
          case (org.apache.spark.sql.catalyst.analysis
              .ResolvedIdentifier(cat: graft.catalog.GraftCatalog,
                ident), ts: TableSpec) =>
            GraftCatalogCtasCommand(cat, ident, c.partitioning,
              ts.properties ++
                ts.provider.map(
                  org.apache.spark.sql.connector.catalog.TableCatalog
                    .PROP_PROVIDER -> _) ++
                ts.location.map(
                  org.apache.spark.sql.connector.catalog.TableCatalog
                    .PROP_LOCATION -> _),
              c.query, c.ignoreIfExists)
          case _ => c
        }
    }
}

/** `CREATE TABLE g.ns.t [PARTITIONED BY (…)] [TBLPROPERTIES (…)]
  * AS SELECT …` against the graft catalog: create the (empty,
  * schema-carrying) table through the catalog's own createTable —
  * partition transforms and pruning properties apply exactly as in
  * plain CREATE — then append the query's rows as one manifest
  * commit. */
final case class GraftCatalogCtasCommand(
    catalog: graft.catalog.GraftCatalog,
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
    properties: Map[String, String], query: LogicalPlan,
    ignoreIfExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (catalog.name() +: ident.namespace().toSeq) :+ ident.name())
    }
    import scala.jdk.CollectionConverters._
    val df = org.apache.spark.sql.GraftSqlBridge.ofRows(session, query)
    val t = catalog.createTable(ident, df.schema, partitioning.toArray,
      properties.asJava).asInstanceOf[graft.catalog.GraftV2Table]
    val v = ManifestTable.latestVersion(session, t.path).getOrElse(
      sys.error(s"graft catalog CTAS: create left no version at ${t.path}"))
    val (statsCols, bloomCols) = ManifestTable.pruningOf(session, t.path, v)
    ManifestTable.append(session, df, t.path, statsCols = statsCols,
      bloomCols = bloomCols)
    Seq.empty
  }
}
