package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SQL maintenance entry points (GraftCatalog as a ProcedureCatalog):
  * `CALL g.system.compact/cluster/vacuum/rewrite_deletes/restore/
  * create_tag(…)` — the cadence ops reachable from pure SQL, each
  * returning its summary as one result row, with history recording
  * the op's provenance.
  */
class ProcedureSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-proc-wh").toString
    s.conf.set("spark.sql.catalog.gp",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gp.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")
    s
  }
  import spark.implicits._

  private def pathOf(t: String): String =
    spark.sessionState.catalogManager.catalog("gp")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), t)).properties().get("location")

  test("CALL compact bin-packs; vacuum reaps; both report by name") {
    spark.sql("CREATE TABLE gp.db.c (id BIGINT, s STRING) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO gp.db.c VALUES ($i, 'r$i')"))
    val t = pathOf("c")
    val before = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
      .count(_.rows.exists(_ > 0))
    assert(before == 4)
    val v = spark.sql("CALL gp.system.compact('db.c')").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(6L),
      s"compact must return the new version, got ${v.toSeq}")
    assert(ManifestTable.entriesOf(spark, t, 6L)
      .count(_.rows.exists(_ > 0)) == 1,
      "4 tiny dirs must bin-pack into one")
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.c").collect()
      .head.getLong(0) == 4L)
    // vacuum: drop all but the newest snapshot, reap the old dirs
    val r = spark.sql("CALL gp.system.vacuum('db.c')").collect().head
    assert(r.getInt(0) > 0 && r.getInt(1) > 0,
      s"vacuum must drop manifests and reap dirs, got $r")
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.c").collect()
      .head.getLong(0) == 4L)
  }

  test("CALL cluster orders the layout; named args work") {
    spark.sql("CREATE TABLE gp.db.cl (id BIGINT, s STRING) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    // two interleaved commits: each dir spans the whole id range
    spark.sql("INSERT INTO gp.db.cl SELECT id * 2, 'a' " +
      "FROM range(0, 500) AS t(id)")
    spark.sql("INSERT INTO gp.db.cl SELECT id * 2 + 1, 'b' " +
      "FROM range(0, 500) AS t(id)")
    spark.sql(
      "CALL gp.system.cluster(`table` => 'db.cl', " +
        "stats_col => 'id', n_dirs => 4)").collect()
    val t = pathOf("cl")
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
      .filter(_.rows.exists(_ > 0))
    assert(entries.size == 4)
    // clustered: dirs now have DISJOINT id ranges
    val ranges = entries.map(e =>
      (e.statMin("id"), e.statMax("id"))).sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"clustered dirs must be range-disjoint: $ranges")
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.cl").collect()
      .head.getLong(0) == 1000L)
  }

  test("CALL rewrite_deletes materializes tombstones; restore rolls back; tags pin") {
    spark.sql("CREATE TABLE gp.db.rd (id BIGINT, s STRING) " +
      "USING `graft-manifest` " +
      "TBLPROPERTIES ('statsCols'='s', 'bloomCols'='s')")
    spark.sql("INSERT INTO gp.db.rd SELECT id, CONCAT('k', id) " +
      "FROM range(0, 100) AS t(id)")                         // v2
    spark.sql("DELETE FROM gp.db.rd WHERE s = 'k7'")         // v3: dv
    val t = pathOf("rd")
    assert(ManifestTable.entriesOf(spark, t, 3L).exists(_.dv.nonEmpty),
      "the string point delete must be merge-on-read")
    val r = spark.sql("CALL gp.system.rewrite_deletes('db.rd')")
      .collect().head
    assert(r.getLong(0) == 4L && r.getInt(1) >= 1)
    assert(ManifestTable.entriesOf(spark, t, 4L).forall(_.dv.isEmpty))
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.rd").collect()
      .head.getLong(0) == 99L)
    // tag the pre-delete snapshot, then restore to it
    spark.sql("CALL gp.system.create_tag('db.rd', 'pre-del', 2)")
    val v = spark.sql("CALL gp.system.restore('db.rd', 2)")
      .collect().head.getLong(0)
    assert(v == 5L)
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.rd").collect()
      .head.getLong(0) == 100L)
    // the restore is a NEW commit: history keeps the delete visible,
    // and each CALL's provenance is recorded as its operation name
    assert(ManifestTable.versions(spark, t).contains(3L))
    val ops = ManifestTable.history(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ops(4L) == "rewriteDeletes" && ops(5L) == "restore",
      s"history must carry op provenance, got $ops")
  }

  test("SHOW/DESCRIBE PROCEDURE surface the declared metadata") {
    val shown = spark.sql("SHOW PROCEDURES IN gp.system").collect()
      .map(_.toString)
    assert(Seq("compact", "cluster", "vacuum", "rewrite_deletes",
      "restore", "create_tag", "expire_snapshots")
      .forall(p => shown.exists(_.contains(p))),
      s"got ${shown.toSeq}")
    val desc = spark.sql("DESCRIBE PROCEDURE gp.system.compact")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("compact"), s"got $desc")
    // SHOW TBLPROPERTIES surfaces the pruning discipline by name
    spark.sql("CREATE TABLE gp.db.props (id BIGINT, s STRING) " +
      "USING `graft-manifest` " +
      "TBLPROPERTIES ('statsCols'='id', 'bloomCols'='s')")
    val props = spark.sql("SHOW TBLPROPERTIES gp.db.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("statsCols").contains("id") &&
      props.get("bloomCols").contains("s"), s"got $props")
  }

  test("procedures resolve through the catalog: loud on unknowns") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val ex = intercept[Exception] {
      spark.sql("CALL gp.system.optimize('db.c')").collect()
    }
    assert(msgs(ex).exists(m => m.contains("no procedure 'optimize'") ||
      m.toLowerCase.contains("routine")), s"got: ${msgs(ex)}")
    val ex2 = intercept[Exception] {
      spark.sql("CALL gp.maint.compact('db.c')").collect()
    }
    assert(msgs(ex2).exists(_.contains("system")), s"got: ${msgs(ex2)}")
    val ex3 = intercept[Exception] {
      spark.sql("CALL gp.system.compact('db.nope')").collect()
    }
    assert(msgs(ex3).exists(_.toLowerCase.contains("nope")),
      s"got: ${msgs(ex3)}")
  }

  test("CALL create_branch / fast_forward_branch / abandon_branch by name") {
    spark.sql("CREATE TABLE gp.db.br (id BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    spark.sql("INSERT INTO gp.db.br VALUES (1), (2)")
    val t = pathOf("br")
    val base = spark.sql("CALL gp.system.create_branch('db.br', 'b1')")
      .collect().head.getLong(0)
    assert(base == 2L) // CREATE = v1, INSERT = v2
    ManifestTable.appendToBranch(spark, Seq(10L).toDF("id"), t, "b1",
      statsCols = Seq("id"))
    // main oblivious until the fast-forward
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.br").head.getLong(0)
      == 2L)
    val v = spark.sql(
      "CALL gp.system.fast_forward_branch('db.br', 'b1')")
      .collect().head.getLong(0)
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.br").head.getLong(0)
      == 3L)
    // provenance: the fast-forward is ONE history entry
    val ops = ManifestTable.history(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ops(v) == "fastForwardBranch", s"got $ops")
    // the reject path by name
    spark.sql("CALL gp.system.create_branch('db.br', 'b2')")
    ManifestTable.appendToBranch(spark, Seq(99L).toDF("id"), t, "b2")
    spark.sql("CALL gp.system.abandon_branch('db.br', 'b2')")
    assert(ManifestTable.branchNames(spark, t).isEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM gp.db.br").head.getLong(0)
      == 3L)
  }

  test("CALL delete_from_branch / update_branch / merge_to_branch " +
      "fix a staged batch from SQL") {
    spark.sql("CREATE TABLE gp.db.bfix (id BIGINT, st STRING, " +
      "n BIGINT) USING `graft-manifest` " +
      "TBLPROPERTIES ('statsCols'='id')")
    spark.sql("INSERT INTO gp.db.bfix VALUES (1, 'ok', 10)")
    val t = pathOf("bfix")
    spark.sql("CALL gp.system.create_branch('db.bfix', 'fix')")
    ManifestTable.appendToBranch(spark,
      Seq((10L, "ok", 100L), (11L, "bad", 110L))
        .toDF("id", "st", "n"), t, "fix", statsCols = Seq("id"))
    val del = spark.sql("CALL gp.system.delete_from_branch(" +
      "'db.bfix', 'fix', 'st = \\'bad\\'')").collect()
    assert(del.head.getLong(0) == 1L, s"got ${del.toSeq}")
    val upd = spark.sql("CALL gp.system.update_branch(" +
      "'db.bfix', 'fix', 'id = 10', 'n', 'n + 1')").collect()
    assert(upd.head.getLong(0) == 1L)
    Seq((10L, "ok2", 500L), (20L, "new", 200L)).toDF("id", "st", "n")
      .createOrReplaceTempView("bfix_updates")
    val mrg = spark.sql("CALL gp.system.merge_to_branch(" +
      "'db.bfix', 'fix', 'bfix_updates', 'id')").collect()
    assert(mrg.head.getLong(0) == 1L && mrg.head.getLong(1) == 1L,
      s"got ${mrg.toSeq}")
    spark.sql("CALL gp.system.fast_forward_branch('db.bfix', 'fix')")
    val out = spark.sql(
      "SELECT id, st, n FROM gp.db.bfix ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "ok", 10L), (10L, "ok2", 500L),
      (20L, "new", 200L)), s"got $out")
  }

  test("CALL ann_index_drift reports; CALL rebuild_index re-trains " +
      "over the live rows") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val idx = s"${Files.createTempDirectory("graft-proc-ann")}/index"
    graft.vector.IvfPq.ensureBuilt(spark, corpus, m = 4, k = 16,
      nCentroids = 8, kmIters = 2, idx)
    val d = spark.sql(
      s"CALL gp.system.ann_index_drift('$idx')").collect().head
    assert(d.getAs[Long]("rows") == corpus.count())
    assert(!d.getAs[Boolean]("rebuild_recommended") &&
      d.getAs[String]("reasons").isEmpty,
      s"fresh build must be healthy, got $d")
    // delete a slice, then rebuild: the dead rows physically leave
    // and the report stays healthy on the fresh quantizers
    graft.vector.IvfPq.delete(spark, idx, corpus
      .filter(org.apache.spark.sql.functions
        .col("vec_id") % 5 === 0).select("vec_id"))
    val r = spark.sql(
      s"CALL gp.system.rebuild_index('$idx', 4, 16, 8)")
      .collect().head
    val liveN = corpus.filter(org.apache.spark.sql.functions
      .col("vec_id") % 5 =!= 0).count()
    assert(r.getAs[Long]("rows") == liveN &&
      r.getAs[Long]("cells") == 8L, s"got $r")
    assert(spark.read.parquet(idx).count() == liveN,
      "rebuild must physically drop tombstoned rows")
    val d2 = spark.sql(
      s"CALL gp.system.ann_index_drift('$idx')").collect().head
    assert(d2.getAs[Long]("rows") == liveN &&
      !d2.getAs[Boolean]("rebuild_recommended"))
  }
}
