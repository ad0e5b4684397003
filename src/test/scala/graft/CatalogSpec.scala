package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The name front door (graft.catalog.GraftCatalog +
  * plans.ManifestCatalogRules): CREATE/SHOW/DROP/RENAME by name,
  * SELECT + every DML statement against `catalog.ns.table` with NO
  * temp view, time travel by name, v2 PARTITIONED BY transforms onto
  * hidden partitioning — all on the one V1 read path (the swap rule
  * preserves exprIds, so this suite is also the pin that named and
  * path-addressed plans are the same plans).
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-catalog-wh").toString
    s.conf.set("spark.sql.catalog.g",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    s
  }
  import spark.implicits._

  test("create, insert, select, update, delete, merge — all by name") {
    spark.sql(
      """CREATE TABLE g.db.t (id BIGINT, s STRING)
        |USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')""".stripMargin)
    spark.sql("INSERT INTO g.db.t VALUES (1, 'a'), (2, 'b'), (10, 'c')")
    assert(spark.sql("SELECT * FROM g.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (10L, "c")))
    // SHOW TABLES sees it
    assert(spark.sql("SHOW TABLES IN g.db").collect()
      .map(_.getString(1)).contains("t"))
    // UPDATE by name routes the manifest in-place patch
    spark.sql("UPDATE g.db.t SET s = 'B' WHERE id BETWEEN 2 AND 2")
    // DELETE by name
    spark.sql("DELETE FROM g.db.t WHERE id >= 10")
    // MERGE by name (whole-row upsert + column-wise patch)
    Seq((1L, "A!"), (7L, "g")).toDF("id", "s")
      .createOrReplaceTempView("cat_updates")
    spark.sql(
      """MERGE INTO g.db.t t USING cat_updates u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT * FROM g.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "A!"), (2L, "B"), (7L, "g")))
    // INSERT OVERWRITE replaces atomically; the name still resolves
    spark.sql("INSERT OVERWRITE g.db.t VALUES (99, 'z')")
    assert(spark.sql("SELECT * FROM g.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((99L, "z")))
    // time travel BY NAME: the pre-overwrite snapshot
    val versions = spark.sql("SELECT * FROM g.db.t VERSION AS OF 2")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(versions == Seq((1L, "a"), (2L, "b"), (10L, "c")))
    // metadata-only aggregate fires through the name too: COUNT(*)
    // reads zero data files (the swap is the SAME v1 relation)
    val agg = spark.sql("SELECT COUNT(*) AS n FROM g.db.t")
    assert(agg.collect().head.getLong(0) == 1L)
    assert(!agg.queryExecution.executedPlan.toString.contains("FileScan"),
      "named COUNT(*) must answer from the manifest alone")
  }

  test("PARTITIONED BY (days(ts), bucket) maps onto hidden partitioning") {
    spark.sql(
      """CREATE TABLE g.db.ev (id BIGINT, ts TIMESTAMP)
        |USING `graft-manifest` PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """INSERT INTO g.db.ev VALUES
        |(1, TIMESTAMP '2024-01-25 06:00:00'),
        |(2, TIMESTAMP '2024-01-26 07:00:00')""".stripMargin)
    // the catalog table reports its partitioning...
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val t = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "ev"))
    assert(t.partitioning().map(_.toString).toSeq == Seq("days(ts)"))
    // ...and the data landed partition-pure: a day slice by name
    // prunes to one dir
    val q = spark.sql(
      "SELECT id FROM g.db.ev WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val files = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }
    q.collect()
    assert(files.isDefined)
    // unsupported transform is loud at CREATE
    val ex = intercept[Exception] {
      spark.sql(
        """CREATE TABLE g.db.bad (id BIGINT)
          |USING `graft-manifest` PARTITIONED BY (sorted_bucket(id))"""
          .stripMargin)
    }
    assert(ex.getMessage.contains("transform") ||
      ex.getMessage.contains("sorted_bucket"))
  }

  test("external LOCATION adopts an existing table; DROP keeps its data") {
    val ext = s"${Files.createTempDirectory("graft-cat-ext")}/t"
    ManifestTable.append(spark, Seq((1L, "x")).toDF("id", "s"), ext,
      statsCols = Seq("id"))
    // a conflicting column list is refused, never silently rewritten
    val ex = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE g.db.adopted2 (wrong INT)
           |USING `graft-manifest` LOCATION '$ext'""".stripMargin)
    }
    assert(ex.getMessage.contains("does not match"))
    spark.sql(
      s"CREATE TABLE g.db.adopted USING `graft-manifest` LOCATION '$ext'")
    assert(spark.sql("SELECT * FROM g.db.adopted").count() == 1)
    // DROP of an EXTERNAL table only loses the name
    spark.sql("DROP TABLE g.db.adopted")
    assert(ManifestTable.latestVersion(spark, ext).isDefined,
      "external data must survive its name")
    assert(intercept[Exception](
      spark.sql("SELECT * FROM g.db.adopted").collect())
      .getMessage.contains("adopted"))
    // DROP of a MANAGED table drops data with the name
    spark.sql("CREATE TABLE g.db.mg (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.db.mg VALUES (5)")
    val mgPath = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "mg"))
      .properties().get("location")
    spark.sql("DROP TABLE g.db.mg")
    assert(!new java.io.File(mgPath).exists(),
      "managed data must drop with the name")
  }

  test("CTAS creates, partitions, and fills the table in one statement") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.ctas")
    Seq((1L, "en", java.sql.Timestamp.valueOf("2024-01-25 06:00:00")),
      (2L, "de", java.sql.Timestamp.valueOf("2024-01-26 07:00:00")))
      .toDF("id", "lang", "ts").createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE g.ctas.t USING `graft-manifest`
        |PARTITIONED BY (days(ts))
        |TBLPROPERTIES ('statsCols'='id')
        |AS SELECT * FROM ctas_src""".stripMargin)
    assert(spark.sql("SELECT id FROM g.ctas.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // the created table carries the partition spec AND the stats
    // discipline the statement declared
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val t = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ctas"), "t"))
    assert(t.partitioning().map(_.toString).toSeq == Seq("days(ts)"))
    val path = t.properties().get("location")
    val entries = ManifestTable.entriesOf(spark,
      path, ManifestTable.latestVersion(spark, path).get)
      .filter(_.rows.exists(_ > 0)) // the CREATE seed dir is empty
    assert(entries.nonEmpty &&
      entries.forall(e => e.partition.contains("ts_day") &&
        e.statMin.contains("id")),
      s"CTAS dirs must be partition-pure and statted: $entries")
    // IF NOT EXISTS over an existing table is a silent no-op;
    // without it, loud
    spark.sql(
      """CREATE TABLE IF NOT EXISTS g.ctas.t USING `graft-manifest`
        |AS SELECT 99 AS x""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM g.ctas.t").collect()
      .head.getLong(0) == 2L)
    val ex = intercept[Exception] {
      spark.sql(
        """CREATE TABLE g.ctas.t USING `graft-manifest`
          |AS SELECT 99 AS x""".stripMargin)
    }
    assert(ex.getMessage.toLowerCase.contains("exists"))
  }

  test("ALTER TABLE ADD COLUMN evolves; time travel pins the OLD schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.ev")
    spark.sql("CREATE TABLE g.ev.t (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.ev.t VALUES (1)")           // v2
    spark.sql("ALTER TABLE g.ev.t ADD COLUMN s STRING")  // v3
    spark.sql("INSERT INTO g.ev.t VALUES (2, 'b')")      // v4
    // old rows read null in the new column
    assert(spark.sql("SELECT * FROM g.ev.t ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, Some("b"))))
    // VERSION AS OF a PRE-evolution snapshot resolves against the
    // pinned schema — one column, no spurious drift error
    val old = spark.sql("SELECT * FROM g.ev.t VERSION AS OF 2")
    assert(old.columns.toSeq == Seq("id"))
    assert(old.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // RENAME/DROP COLUMN route the field-id mapping (positive
    // coverage in ManifestColumnMapSpec); other alters stay loud
    def msg(stmt: String): String =
      intercept[Exception](spark.sql(stmt)).getMessage
    assert(msg("ALTER TABLE g.ev.t ADD COLUMN id BIGINT")
      .toLowerCase.contains("exists"))
    assert(msg("ALTER TABLE g.ev.t ALTER COLUMN s TYPE INT")
      .contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      "type changes stay loud (Spark rejects before the catalog)")
    spark.sql("ALTER TABLE g.ev.t RENAME COLUMN s TO s2")
    assert(spark.sql("SELECT * FROM g.ev.t ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, Some("b"))),
      "renamed column must keep reading its old files by field id")
    assert(spark.table("g.ev.t").columns.toSeq == Seq("id", "s2"))
  }

  test("DROP NAMESPACE: loud when non-empty, CASCADE drops managed data") {
    spark.sql("CREATE NAMESPACE g.dropme")
    spark.sql("CREATE TABLE g.dropme.t (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.dropme.t VALUES (1)")
    val mgPath = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("dropme"), "t"))
      .properties().get("location")
    // non-empty without CASCADE is loud; nothing is lost
    val ex = intercept[Exception] {
      spark.sql("DROP NAMESPACE g.dropme")
    }
    assert(ex.getMessage.toLowerCase.contains("empty") ||
      ex.getMessage.toLowerCase.contains("cascade"))
    assert(spark.sql("SELECT * FROM g.dropme.t").count() == 1)
    // CASCADE drops the tables like per-table drops would
    // (managed data included) and the namespace itself
    spark.sql("DROP NAMESPACE g.dropme CASCADE")
    assert(!new java.io.File(mgPath).exists(),
      "cascade must drop managed table data")
    assert(!spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).contains("dropme"))
  }

  test("rename moves the name (and managed data); namespaces are real") {
    spark.sql("CREATE TABLE g.db.rn (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.db.rn VALUES (42)")
    spark.sql("ALTER TABLE g.db.rn RENAME TO db.rn2")
    assert(spark.sql("SELECT * FROM g.db.rn2").collect()
      .map(_.getLong(0)).toSeq == Seq(42L))
    assert(!spark.sql("SHOW TABLES IN g.db").collect()
      .map(_.getString(1)).contains("rn"))
    // namespace listing and duplicate-create loudness
    assert(spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).contains("db"))
    val ex = intercept[Exception] {
      spark.sql("CREATE NAMESPACE g.db")
    }
    assert(ex.getMessage.toLowerCase.contains("exists"))
    // a table in a missing namespace is loud
    val ex2 = intercept[Exception] {
      spark.sql("CREATE TABLE g.nope.t (id BIGINT) USING `graft-manifest`")
    }
    assert(ex2.getMessage.contains("nope"))
  }

  test("a managed table's data can never be aliased by two names") {
    def locOf(ns: String, t: String): String =
      spark.sessionState.catalogManager.catalog("g")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(ns), t)).properties().get("location")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.alias")
    spark.sql("CREATE TABLE g.alias.a (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.alias.a VALUES (1), (2)")
    val before = locOf("alias", "a")
    // RENAME of a MANAGED table moves its data dir with the name:
    // nothing is left behind at <ns>/a for a later CREATE to adopt
    spark.sql("ALTER TABLE g.alias.a RENAME TO alias.b")
    val after = locOf("alias", "b")
    assert(after != before && !new java.io.File(before).exists(),
      s"managed rename must move the data dir ($before -> $after)")
    assert(spark.sql("SELECT * FROM g.alias.b").count() == 2)
    // re-CREATE under the old name: a FRESH, EMPTY table — never a
    // silent adoption of the renamed table's live data
    spark.sql("CREATE TABLE g.alias.a (id BIGINT) USING `graft-manifest`")
    assert(spark.sql("SELECT * FROM g.alias.a").count() == 0)
    spark.sql("DROP TABLE g.alias.a") // must not touch b's data
    assert(spark.sql("SELECT * FROM g.alias.b").count() == 2)
    // registering an ALREADY-NAMED path under a second name is loud:
    // two refs to one dir make every DROP a data-loss hazard
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE g.alias.c USING `graft-manifest` " +
        s"LOCATION '$after'")
    }
    assert(ex.getMessage.contains("already registered"),
      s"got: ${ex.getMessage}")
  }

  test("DROP NAMESPACE CASCADE recurses and refuses to eat strangers") {
    // nested namespaces drop recursively, innermost tables included
    spark.sql("CREATE NAMESPACE g.deep")
    spark.sql("CREATE NAMESPACE g.deep.er")
    spark.sql("CREATE TABLE g.deep.er.t (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.deep.er.t VALUES (7)")
    spark.sql("DROP NAMESPACE g.deep CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).contains("deep"))
    // a table REGISTERED ELSEWHERE whose LOCATION sits inside the
    // namespace dir: CASCADE must refuse the recursive delete rather
    // than destroy it while its ref dangles
    spark.sql("CREATE NAMESPACE g.host")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    val hostDir = spark.conf.get("spark.sql.catalog.g.warehouse") +
      "/host/guest_data"
    spark.sql("CREATE TABLE g.db.guest (id BIGINT) " +
      s"USING `graft-manifest` LOCATION '$hostDir'")
    spark.sql("INSERT INTO g.db.guest VALUES (9)")
    val ex = intercept[Exception] {
      spark.sql("DROP NAMESPACE g.host CASCADE")
    }
    assert(ex.getMessage.contains("guest"), s"got: ${ex.getMessage}")
    assert(spark.sql("SELECT * FROM g.db.guest").count() == 1)
  }

  test("named reads and DML still work over pending deletion vectors") {
    spark.sql("CREATE TABLE g.db.dv (id BIGINT, s STRING) " +
      "USING `graft-manifest` " +
      "TBLPROPERTIES ('statsCols'='s', 'bloomCols'='s')")
    spark.sql("INSERT INTO g.db.dv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    // a string point DELETE routes merge-on-read: the table now
    // carries a pending tombstone, and the NAMED read path must
    // bridge the dv rewrite, not just a bare relation
    spark.sql("DELETE FROM g.db.dv WHERE s = 'b'")
    val t = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "dv")).properties().get("location")
    assert(ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).exists(_.dv.nonEmpty),
      "precondition: the delete must be merge-on-read")
    assert(spark.sql("SELECT * FROM g.db.dv").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // named DML through the dv-rewritten relation still routes
    spark.sql("UPDATE g.db.dv SET s = 'C' WHERE id BETWEEN 3 AND 3")
    assert(spark.sql("SELECT * FROM g.db.dv WHERE id = 3").collect()
      .map(_.getString(1)).toSeq == Seq("C"))
    // the tombstoned row stays dead through the update's rewrite
    assert(spark.sql("SELECT COUNT(*) FROM g.db.dv").collect()
      .head.getLong(0) == 2L)
  }

  test("adoption honors statsCols TBLPROPERTIES via a metadata commit") {
    val ext = s"${Files.createTempDirectory("graft-cat-prop")}/t"
    ManifestTable.append(spark, Seq((1L, "x")).toDF("id", "s"), ext)
    val v0 = ManifestTable.latestVersion(spark, ext).get
    assert(!ManifestTable.pruningOf(spark, ext, v0)._1.contains("id"))
    spark.sql("CREATE TABLE g.db.propadopt USING `graft-manifest` " +
      s"LOCATION '$ext' " +
      "TBLPROPERTIES ('statsCols'='id', 'bloomCols'='s')")
    val v1 = ManifestTable.latestVersion(spark, ext).get
    val (st, bl) = ManifestTable.pruningOf(spark, ext, v1)
    assert(st.contains("id") && bl.contains("s"),
      s"adoption must seed the declared pruning discipline: $st / $bl")
    // and later INSERTs through the name record those stats
    spark.sql("INSERT INTO g.db.propadopt VALUES (50, 'q')")
    val v2 = ManifestTable.latestVersion(spark, ext).get
    val newest = ManifestTable.entriesOf(spark, ext, v2)
      .filter(_.rows.exists(_ > 0)).maxBy(_.dir)
    assert(newest.statMin.contains("id") || newest.strMin.contains("id"))
  }

  test("VERSION AS OF accepts a TAG name (ref-based time travel)") {
    spark.sql("CREATE TABLE g.db.tagv (id BIGINT) " +
      "USING `graft-manifest`")
    spark.sql("INSERT INTO g.db.tagv VALUES (1)")         // v2
    val path = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "tagv")).properties().get("location")
    ManifestTable.createTag(spark, path, "first", 2L)
    spark.sql("INSERT INTO g.db.tagv VALUES (2)")         // v3
    assert(spark.sql("SELECT * FROM g.db.tagv VERSION AS OF 'first'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT * FROM g.db.tagv VERSION AS OF 3")
      .count() == 2)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM g.db.tagv VERSION AS OF 'nope'")
        .collect()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("neither a version")),
      s"got ${msgs(ex)}")
    // an ALL-DIGIT tag name stays reachable: the numeric reading is
    // tried first but falls back to the tag map when the number is
    // not a retained snapshot
    ManifestTable.createTag(spark, path, "2024", 2L)
    assert(spark.sql("SELECT * FROM g.db.tagv VERSION AS OF '2024'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "an all-digit tag must resolve through the tag fallback")
    // a mistyped numeric version is loud AT RESOLUTION with the
    // retained range, not a late scan failure
    val ex2 = intercept[Exception] {
      spark.sql("SELECT * FROM g.db.tagv VERSION AS OF 9999").collect()
    }
    assert(msgs(ex2).exists(m => m.contains("not a retained snapshot")),
      s"got ${msgs(ex2)}")
  }

  test("TRUNCATE TABLE empties atomically; history and pruning " +
      "discipline survive; time-travel pins are immutable") {
    spark.sql("CREATE TABLE g.db.trunc (id BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    spark.sql("INSERT INTO g.db.trunc VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE g.db.trunc")
    assert(spark.sql("SELECT count(*) FROM g.db.trunc")
      .head.getLong(0) == 0L)
    // old snapshots survive until vacuum
    assert(spark.sql("SELECT count(*) FROM g.db.trunc VERSION AS OF 2")
      .head.getLong(0) == 2L)
    // the pruning discipline carried through the emptying overwrite
    spark.sql("INSERT INTO g.db.trunc VALUES (9)")
    val path = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "trunc")).properties().get("location")
    val es = ManifestTable.entriesOf(spark, path,
      ManifestTable.latestVersion(spark, path).get)
    assert(es.exists(_.statMin.contains("id")),
      "stats discipline must survive TRUNCATE")
  }

  test("rename RE-RUN after a crash between ref write and data move " +
      "resumes instead of TableAlreadyExists") {
    spark.sql("CREATE TABLE g.db.ren1 (id BIGINT) USING `graft-manifest`")
    spark.sql("INSERT INTO g.db.ren1 VALUES (1), (2)")
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    def ident(n: String) = org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("db"), n)
    val oldPath = cat.loadTable(ident("ren1")).properties()
      .get("location")
    // reconstruct the crash residue by hand, exactly as renameTable's
    // forward-ref-first ordering leaves it: the NEW ref exists and
    // points at the managed target dir, but the data never moved
    // (ref layout: <warehouse>/<ns>/<table>.graftref beside the dir)
    val nsDir = new org.apache.hadoop.fs.Path(oldPath).getParent
    val fs = nsDir.getFileSystem(spark.sessionState.newHadoopConf())
    val danglingTo = new org.apache.hadoop.fs.Path(nsDir, "ren2")
    val out = fs.create(new org.apache.hadoop.fs.Path(
      nsDir, "ren2.graftref"), false)
    out.write(s"path=$danglingTo\nexternal=false\n".getBytes("UTF-8"))
    out.close()
    assert(!fs.exists(danglingTo)) // the crash-window state
    // the re-run must RESUME the move, not throw TableAlreadyExists
    spark.sql("ALTER TABLE g.db.ren1 RENAME TO db.ren2")
    assert(spark.sql("SELECT count(*) FROM g.db.ren2").head.getLong(0)
      == 2L, "the resumed rename must serve the moved data")
    assert(!cat.tableExists(ident("ren1")))
    // and a rename onto a LIVE table still fails loudly
    spark.sql("CREATE TABLE g.db.ren3 (id BIGINT) USING `graft-manifest`")
    intercept[Exception] {
      spark.sql("ALTER TABLE g.db.ren3 RENAME TO db.ren2")
    }
  }

  test("properties() resolves through the time-travel pin") {
    val ext = s"${Files.createTempDirectory("graft-cat-pin")}/t"
    // v1 records NO pruning discipline; the adoption commit (v2)
    // seeds statsCols=id — so the pinned and latest snapshots
    // genuinely disagree about `properties()`
    ManifestTable.append(spark, Seq((1L, "x")).toDF("id", "s"), ext)
    spark.sql("CREATE TABLE g.db.pinprops USING `graft-manifest` " +
      s"LOCATION '$ext' TBLPROPERTIES ('statsCols'='id')")
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "pinprops")
    assert(cat.loadTable(ident).properties()
      .get("statsCols") == "id")
    // pinned at v1: the pre-adoption snapshot had no statsCols — a
    // DESCRIBE of the pin must say so, consistently with schema()
    assert(cat.loadTable(ident, "1").properties()
      .get("statsCols") == null,
      "pinned properties() must reflect the PINNED snapshot")
  }
}
