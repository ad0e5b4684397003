package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SQL DML on `graft-manifest` views (ManifestSqlRules): INSERT
  * appends a manifest commit (never a raw file write into the data
  * root), DELETE maps exactly onto the range/keys/partition-drop
  * primitives or fails loudly, UPDATE routes range/keys/whole-table
  * to the in-place patch engine, MERGE routes the whole-row upsert
  * AND the column-wise patch form — and every unsupported shape is
  * rejected at analysis, never approximated.
  */
class ManifestDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def register(t: String, name: String): Unit =
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView(name)

  test("INSERT INTO a manifest view commits manifest versions, not raw files") {
    val t = s"${Files.createTempDirectory("graft-dmlins")}/t"
    ManifestTable.append(spark, Seq((1L, "a")).toDF("id", "s"), t,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    register(t, "dml_ins")
    spark.sql("INSERT INTO dml_ins VALUES (2, 'b'), (3, 'c')")
    spark.sql("INSERT INTO dml_ins SELECT 10, 'd'")
    // each INSERT is one committed version; positional ints were cast
    // to the table's long column
    assert(ManifestTable.versions(spark, t) == Seq(1L, 2L, 3L))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 10L))
    // the SQL-ingested commits INHERIT the table's stats/bloom
    // discipline: they prune like API-ingested ones
    val entries = ManifestTable.entriesOf(spark, t, 3L)
    assert(entries.forall(e => e.statMin.contains("id") &&
      e.bloom.contains("id")))
    // and NO unreferenced debris was written into the data root (the
    // raw HadoopFsRelation insert path would have dumped files there)
    val dataRoot = new java.io.File(s"$t/data")
    assert(dataRoot.listFiles().forall(_.isDirectory),
      s"loose files in data root: ${dataRoot.listFiles().toSeq}")
    assert(ManifestTable.read(spark, t).count() == 4)
    // INSERT OVERWRITE replaces content atomically (old snapshots
    // survive until vacuum)
    spark.sql("INSERT OVERWRITE dml_ins VALUES (99, 'z')")
    assert(ids(ManifestTable.read(spark, t)) == Seq(99L))
    assert(ids(ManifestTable.readVersion(spark, t, 3L)) ==
      Seq(1L, 2L, 3L, 10L))
    // a CHECK constraint reaches the SQL path too (INSERT routes
    // through append): the violating statement is refused with the
    // constraint named, and no version committed
    ManifestTable.addConstraint(spark, t, "id_pos", "id > 0")
    val vBefore = ManifestTable.latestVersion(spark, t).get
    val exCheck = intercept[IllegalArgumentException] {
      spark.sql("INSERT INTO dml_ins VALUES (-1, 'neg')")
    }
    assert(exCheck.getMessage.contains("id_pos") &&
      ManifestTable.latestVersion(spark, t).contains(vBefore))
    spark.sql("INSERT INTO dml_ins VALUES (100, 'ok')")
    assert(ids(ManifestTable.read(spark, t)) == Seq(99L, 100L))
    // arity mismatch is loud, not silently padded
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO dml_ins VALUES (7)")
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(m => m.contains("column") ||
      m.contains("INSERT")))
  }

  test("DELETE FROM maps exactly onto deleteRange; unsupported shapes are loud") {
    val t = s"${Files.createTempDirectory("graft-dmldel")}/t"
    ManifestTable.append(spark, Seq(1L, 5L).toDF("id"), t,
      statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(10L, 15L).toDF("id"), t,
      statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(20L, 25L).toDF("id"), t,
      statsCols = Seq("id"))
    register(t, "dml_del")
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    spark.sql("DELETE FROM dml_del WHERE id BETWEEN 12 AND 22")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 5L, 10L, 25L))
    // only the overlapping dirs were rewritten: the first dir's files
    // survive physically
    val after = ManifestTable.read(spark, t).inputFiles.toSet
    assert(after.intersect(before).nonEmpty)
    // strict bounds normalize exactly on integers: id > 24 == id >= 25
    spark.sql("DELETE FROM dml_del WHERE id > 24")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 5L, 10L))
    // point delete
    spark.sql("DELETE FROM dml_del WHERE id = 5")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L))
    // a provably-empty range is a no-op (no new version)
    val v0 = ManifestTable.latestVersion(spark, t).get
    spark.sql("DELETE FROM dml_del WHERE id > 100 AND id < 50")
    assert(ManifestTable.latestVersion(spark, t).get == v0)
    // shapes the exact fast paths can't denote route the GENERAL
    // predicate path now (deleteWhere) — they run verbatim, they
    // don't fail; truly un-runnable shapes stay loud below
    spark.sql("DELETE FROM dml_del WHERE id + 1 = 2") // deletes id=1
    assert(ids(ManifestTable.read(spark, t)) == Seq(10L))
    spark.sql("DELETE FROM dml_del WHERE id = 3 OR id = 10")
    assert(ids(ManifestTable.read(spark, t)) == Seq())
    spark.sql("INSERT INTO dml_del VALUES (1), (10)")
    // non-deterministic and CORRELATED-subquery predicates fail
    // LOUDLY — the rewrite would re-evaluate them per dir / cannot
    // host them (uncorrelated subqueries materialize at rule time —
    // see the subquery-predicate test below)
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    Seq(
      "DELETE FROM dml_del WHERE rand() < 0.5",
      "DELETE FROM dml_del d WHERE EXISTS " +
        "(SELECT 1 FROM dml_del i WHERE i.id = d.id + 1)"
    ).foreach { stmt =>
      val ex = intercept[Exception] { spark.sql(stmt) }
      assert(msgs(ex).exists(m => m.contains("unsupported WHERE") ||
        m.contains("programmatic API") || m.contains("CORRELATED")),
        s"$stmt should be rejected loudly, got ${msgs(ex)}")
    }
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 10L))
    // DELETE without WHERE empties the table atomically; schema and
    // watermark survive
    spark.sql("DELETE FROM dml_del")
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 0 && r.columns.toSeq == Seq("id"))
  }

  test("pruning discipline survives SQL DML: overwrite, full delete, merge") {
    val t = s"${Files.createTempDirectory("graft-dmldisc")}/t"
    ManifestTable.append(spark, Seq((1L, "k-1")).toDF("id", "k"), t,
      statsCols = Seq("id", "k"), bloomCols = Seq("id", "k"))
    register(t, "dml_disc")
    def latestEntries() = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    def disciplined(e: ManifestTable.Entry): Boolean =
      e.statMin.contains("id") && e.strMin.contains("k") &&
        e.bloom.contains("id") && e.strBloom.contains("k")
    // INSERT OVERWRITE keeps the discipline on its own commit...
    spark.sql("INSERT OVERWRITE dml_disc VALUES (2, 'k-2')")
    assert(latestEntries().forall(disciplined))
    // ...and later INSERTs still inherit it (the sidecar, not the
    // possibly-bare entries, is the source of truth)
    spark.sql("INSERT INTO dml_disc VALUES (3, 'k-3')")
    assert(latestEntries().forall(disciplined))
    // a FULL delete empties the table but must not erase the
    // discipline for the table's remaining lifetime
    spark.sql("DELETE FROM dml_disc")
    spark.sql("INSERT INTO dml_disc VALUES (4, 'k-4')")
    // the emptying overwrite's own dir has zero rows (nothing to
    // stat); the post-emptying INSERT's dir must still be disciplined
    assert(latestEntries().exists(e => disciplined(e) &&
      e.statMin.get("id").contains(4L)),
      s"post-emptying inserts lost discipline: ${latestEntries()}")
    // a SQL MERGE's batch dir records filters too — without it every
    // merge would leave one filter-less dir point lookups read forever
    Seq((4L, "K-4!"), (9L, "k-9")).toDF("id", "k")
      .createOrReplaceTempView("dml_disc_up")
    spark.sql(
      """MERGE INTO dml_disc t USING dml_disc_up u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(latestEntries().exists(e => disciplined(e) &&
      e.statMin.get("id").contains(4L) &&
      e.statMax.get("id").contains(9L)),
      s"merge batch dir lost discipline: ${latestEntries()}")
    // duplicate output names are legal in positional INSERT
    val t2 = s"${Files.createTempDirectory("graft-dmldup")}/t"
    ManifestTable.append(spark, Seq((1L, "x")).toDF("a", "b"), t2)
    spark.read.format("graft-manifest").load(t2)
      .createOrReplaceTempView("dml_dup")
    spark.sql("INSERT INTO dml_dup SELECT id, id FROM (SELECT 4 AS id)")
    assert(ManifestTable.read(spark, t2).count() == 2)
  }

  test("MERGE INTO routes whole-row upsert AND column-wise patch; other forms are loud") {
    val t = s"${Files.createTempDirectory("graft-dmlmerge")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, statsCols = Seq("id"))
    ManifestTable.append(spark,
      Seq((10L, "c")).toDF("id", "s"), t, statsCols = Seq("id"))
    register(t, "dml_m")
    Seq((2L, "B!"), (20L, "e")).toDF("id", "s")
      .createOrReplaceTempView("dml_m_updates")
    spark.sql(
      """MERGE INTO dml_m t USING dml_m_updates u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "B!"), (10L, "c"), (20L, "e")))
    // the COLUMN-WISE patch form routes too (mergeUpdate): matched
    // rows are patched IN PLACE — the untouched dir keeps its files —
    // and without an INSERT action unmatched source keys do nothing
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    Seq((2L, "B2"), (999L, "nope")).toDF("id", "s")
      .createOrReplaceTempView("dml_m_patch")
    spark.sql(
      """MERGE INTO dml_m t USING dml_m_patch u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET s = u.s""".stripMargin)
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "B2"), (10L, "c"), (20L, "e")))
    val filesAfter = ManifestTable.read(spark, t).inputFiles.toSet
    assert(filesAfter.intersect(filesBefore).nonEmpty,
      "dirs not containing the matched key must keep physical identity")
    // ...and combines with WHEN NOT MATCHED THEN INSERT * — a SET
    // expression may mix target and source columns
    Seq((1L, "A?"), (30L, "f")).toDF("id", "s")
      .createOrReplaceTempView("dml_m_patch2")
    spark.sql(
      """MERGE INTO dml_m t USING dml_m_patch2 u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET s = concat(t.s, u.s)
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "aA?"), (2L, "B2"), (10L, "c"), (20L, "e"), (30L, "f")))
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // composite ON keys, DELETE actions, per-action conditions, and
    // NOT MATCHED BY SOURCE now route the general ordered-clause
    // engine — positive coverage lives in ManifestMergeClausesSpec;
    // the forms with NO manifest mapping stay LOUD:
    // a non-deterministic SET expression (would patch different rows
    // to different values per rewrite pass)
    val ex5 = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_m t USING dml_m_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE
          |SET s = CAST(rand() AS STRING)""".stripMargin)
    }
    assert(msgs(ex5).exists(_.contains("unsupported SET expression")))
    // SET assigning the merge key itself — the row's identity
    val ex6 = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_m t USING dml_m_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET id = u.id + 1""".stripMargin)
    }
    assert(msgs(ex6).exists(_.contains("must not assign the merge key")))
    // nothing above mutated the table
    assert(ManifestTable.read(spark, t).count() == 5)
  }

  test("UPDATE routes range/keys/whole-table; unsupported shapes are loud") {
    val t = s"${Files.createTempDirectory("graft-dmlupd")}/t"
    ManifestTable.append(spark,
      Seq((1L, "k-1", 10L), (5L, "k-5", 10L)).toDF("id", "k", "n"), t,
      statsCols = Seq("id", "k"))
    ManifestTable.append(spark,
      Seq((10L, "k-10", 10L), (15L, "k-15", 10L)).toDF("id", "k", "n"),
      t, statsCols = Seq("id", "k"))
    register(t, "dml_u")
    def state(): Seq[(Long, String, Long)] =
      ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sorted.toSeq
    // integral range WHERE → updateRange: only the overlapping dir
    // rewrites, the other keeps its files
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    spark.sql("UPDATE dml_u SET n = n + 1 WHERE id BETWEEN 10 AND 12")
    assert(state() == Seq((1L, "k-1", 10L), (5L, "k-5", 10L),
      (10L, "k-10", 11L), (15L, "k-15", 10L)))
    assert(ManifestTable.read(spark, t).inputFiles.toSet
      .intersect(before).nonEmpty,
      "the non-overlapping dir must keep physical identity")
    // string point/set WHERE → updateKeys; SET may reference columns
    spark.sql("UPDATE dml_u SET n = id * 2 WHERE k IN ('k-1', 'k-15')")
    assert(state() == Seq((1L, "k-1", 2L), (5L, "k-5", 10L),
      (10L, "k-10", 11L), (15L, "k-15", 30L)))
    // no WHERE → updateAll
    spark.sql("UPDATE dml_u SET n = n + 100")
    assert(state().map(_._3) == Seq(102L, 110L, 111L, 130L))
    // a provably-empty range is an analysis-time no-op: no new version
    val v0 = ManifestTable.latestVersion(spark, t).get
    spark.sql("UPDATE dml_u SET n = 0 WHERE id > 100 AND id < 50")
    assert(ManifestTable.latestVersion(spark, t).contains(v0))
    // identity-only SET (the analyzer pads untouched columns this
    // way) is a no-op too, not a whole-table rewrite to equal bytes
    spark.sql("UPDATE dml_u SET n = n")
    assert(ManifestTable.latestVersion(spark, t).contains(v0))
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // shapes the exact fast paths can't denote route the GENERAL
    // predicate path (updateWhere) and run verbatim; only
    // non-deterministic / CORRELATED-subquery WHEREs stay loud (same
    // contract as DELETE's — see the general-predicate test below)
    Seq(
      "UPDATE dml_u SET n = 0 WHERE rand() < 2",
      "UPDATE dml_u SET n = 0 WHERE id IN " +
        "(SELECT id FROM dml_u i WHERE i.n = dml_u.n)"
    ).foreach { stmt =>
      val ex = intercept[Exception] { spark.sql(stmt) }
      assert(msgs(ex).exists(m => m.contains("unsupported WHERE") ||
        m.contains("programmatic API") || m.contains("CORRELATED")),
        s"$stmt should be rejected loudly, got ${msgs(ex)}")
    }
    // a non-deterministic SET is loud
    val exNd = intercept[Exception] {
      spark.sql("UPDATE dml_u SET n = CAST(rand() * 10 AS BIGINT)")
    }
    assert(msgs(exNd).exists(_.contains("unsupported SET expression")))
    // a SET on a partition-source column is loud (in-place patch
    // cannot re-derive partition metadata)
    val tp = s"${Files.createTempDirectory("graft-dmlupdp")}/t"
    ManifestTable.append(spark,
      Seq((1L, "en"), (2L, "de")).toDF("id", "lang"), tp,
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("lang")))
    register(tp, "dml_up")
    val exP = intercept[Exception] {
      spark.sql("UPDATE dml_up SET lang = 'fr' WHERE id = 1")
    }
    assert(msgs(exP).exists(_.contains("partition-source")))
    assert(state().map(_._3) == Seq(102L, 110L, 111L, 130L),
      "no rejected statement may have mutated the table")
  }

  test("DELETE on an identity-partition column is a metadata-only drop") {
    val t = s"${Files.createTempDirectory("graft-dmlpart")}/t"
    ManifestTable.append(spark,
      Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang"), t,
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("lang")))
    register(t, "dml_part")
    val before = ManifestTable.entriesOf(spark, t, 1L).map(_.dir).toSet
    spark.sql("DELETE FROM dml_part WHERE lang = 'de'")
    register(t, "dml_part")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 3L))
    // metadata-only: no tombstone was written, no dir rewritten —
    // the kept entry is PHYSICALLY the pre-delete dir, and the
    // dropped dir still exists for older snapshots
    assert(!new java.io.File(s"$t/deletes").exists(),
      "partition delete must not write tombstones")
    val after = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).map(_.dir).toSet
    assert(after.subsetOf(before), "no dir may be rewritten")
    assert(before.forall(d => new java.io.File(s"$t/data/$d").exists()))
    // a blind dir (cluster output) downgrades the SAME statement to
    // the exact row-level path instead of guessing
    ManifestTable.cluster(spark, t, "id", nDirs = 1)
    register(t, "dml_part")
    spark.sql("DELETE FROM dml_part WHERE lang = 'en'")
    assert(ManifestTable.read(spark, t).count() == 0)
    // an IN delete over partition values is ONE atomic commit (no
    // per-value version a reader could observe torn)
    val t3 = s"${Files.createTempDirectory("graft-dmlpart3")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "par"),
      t3, partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("par")))
    register(t3, "dml_part3")
    val vBefore3 = ManifestTable.latestVersion(spark, t3).get
    spark.sql("DELETE FROM dml_part3 WHERE par IN ('a', 'c')")
    assert(ManifestTable.latestVersion(spark, t3).contains(vBefore3 + 1),
      "multi-value partition delete must be one commit")
    assert(ids(ManifestTable.read(spark, t3)) == Seq(2L, 4L))
    assert(!new java.io.File(s"$t3/deletes").exists())
    // the integral point form routes too: fresh identity(id) table
    val t2 = s"${Files.createTempDirectory("graft-dmlpart2")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t2,
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PIdentity("id")))
    register(t2, "dml_part2")
    spark.sql("DELETE FROM dml_part2 WHERE id = 2")
    assert(ids(ManifestTable.read(spark, t2)) == Seq(1L))
    assert(!new java.io.File(s"$t2/deletes").exists())
  }

  test("general-predicate DELETE/UPDATE: verbatim semantics, stats-disjoint dirs untouched") {
    val t = s"${Files.createTempDirectory("graft-dmlgen")}/t"
    // three dirs with disjoint recorded (lang, n) stats: only dirs
    // that can hold a match may rewrite
    ManifestTable.append(spark,
      Seq((1L, "de", 100L), (2L, "de", 9000L), (3L, "de", 200L))
        .toDF("id", "lang", "n"), t,
      statsCols = Seq("id", "lang", "n"))
    ManifestTable.append(spark,
      Seq((10L, "en", 8000L), (11L, "en", 50L))
        .toDF("id", "lang", "n"), t,
      statsCols = Seq("id", "lang", "n"))
    // a dir with NULL predicate inputs: NULL rows must SURVIVE a
    // DELETE (cond evaluates null, not true)
    ManifestTable.append(spark,
      Seq((20L, null.asInstanceOf[String], 9999L), (21L, "fr", 9500L))
        .toDF("id", "lang", "n"), t,
      statsCols = Seq("id", "lang", "n"))
    register(t, "dml_gen")
    def state(): Seq[(Long, Option[String], Long)] =
      ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
        .sorted(Ordering.by((x: (Long, Option[String], Long)) => x._1))
        .toSeq
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    // the migrating user's first statement: mixed string+integral
    // conjuncts no fast path denotes
    spark.sql("DELETE FROM dml_gen WHERE lang = 'de' AND n > 5000")
    assert(state().map(_._1) == Seq(1L, 3L, 10L, 11L, 20L, 21L))
    // dirs 2 (en: lang stats disjoint) and 3 (fr/null) survived
    // PHYSICALLY — same files, never rewritten to equal bytes
    val filesAfter = ManifestTable.read(spark, t).inputFiles.toSet
    assert(filesAfter.intersect(filesBefore).size >= 2,
      s"stats-disjoint dirs must keep physical identity: " +
        s"before=${filesBefore.size} kept=${
          filesAfter.intersect(filesBefore).size}")
    // a null-evaluating predicate row survives: lang IS NULL row
    // keeps living through a lang-conditioned delete
    spark.sql("DELETE FROM dml_gen WHERE lang = 'fr' AND n > 9000")
    assert(state().map(_._1) == Seq(1L, 3L, 10L, 11L, 20L),
      "NULL-predicate rows must survive a DELETE")
    // OR predicates route too (no pruning extracted — still exact)
    spark.sql("UPDATE dml_gen SET n = n + 1 " +
      "WHERE lang = 'en' AND (n < 100 OR n > 7000)")
    assert(state() == Seq((1L, Some("de"), 100L), (3L, Some("de"), 200L),
      (10L, Some("en"), 8001L), (11L, Some("en"), 51L),
      (20L, None, 9999L)))
    // mixed-conjunct UPDATE: the de dir patches in place, the en dir
    // keeps physical identity
    val b2 = ManifestTable.read(spark, t).inputFiles.toSet
    spark.sql("UPDATE dml_gen SET n = 0 WHERE lang = 'de' AND n >= 150")
    assert(state().map(x => (x._1, x._3)) ==
      Seq((1L, 100L), (3L, 0L), (10L, 8001L), (11L, 51L), (20L, 9999L)))
    assert(ManifestTable.read(spark, t).inputFiles.toSet
      .intersect(b2).nonEmpty,
      "dirs the conjunct probe rules out must not rewrite")
    // BETWEEN mixed with a second conjunct routes too — Spark 4
    // resolves BETWEEN into a With common-subexpression node, which
    // the general path INLINES before the by-name rebuild (a plain
    // transform would crash on it)
    spark.sql("DELETE FROM dml_gen " +
      "WHERE n BETWEEN 8000 AND 9000 AND lang = 'en'")
    assert(state().map(_._1) == Seq(1L, 3L, 11L, 20L),
      s"got ${state()}")
  }

  test("partial-column INSERT pads nullable omissions with typed " +
      "NULLs; non-nullable omissions and unknown columns are loud") {
    val t = s"${Files.createTempDirectory("graft-dmlpins")}/t"
    ManifestTable.append(spark,
      Seq((1L, Some("a"), Some(10L))).toDF("id", "s", "n"), t,
      statsCols = Seq("id"))
    register(t, "dml_pins")
    // named-column insert: order differs from the table's, omitted
    // nullable column nulls explicitly
    spark.sql("INSERT INTO dml_pins (n, id) VALUES (20, 2)")
    spark.sql("INSERT INTO dml_pins (id, s) SELECT 3, 'c'")
    val got = ManifestTable.read(spark, t)
      .select("id", "s", "n").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq((1L, Some("a"), Some(10L)),
      (2L, None, Some(20L)), (3L, Some("c"), None)), s"got $got")
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // unknown column, arity mismatch, duplicate are loud
    Seq("INSERT INTO dml_pins (id, nope) VALUES (9, 9)",
      "INSERT INTO dml_pins (id, s, n) VALUES (9, 'x')",
      "INSERT INTO dml_pins (id, id) VALUES (9, 9)").foreach { stmt =>
      intercept[Exception] { spark.sql(stmt) }
    }
    assert(ManifestTable.read(spark, t).count() == 3L)
  }

  test("integral IN-list DELETE routes merge-on-read like the " +
      "string twin; single equality stays the range fast path") {
    val t = s"${Files.createTempDirectory("graft-dmlintin")}/t"
    // interleaved ids: every dir's range spans the domain, only the
    // Bloom discriminates — the scattered-key shape
    Seq(0, 1).foreach(r => ManifestTable.append(spark,
      (0L until 100L).filter(_ % 2 == r).toDF("id"), t,
      statsCols = Seq("id"), bloomCols = Seq("id")))
    register(t, "dml_intin")
    val before = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    spark.sql("DELETE FROM dml_intin WHERE id IN (3, 17, 94)")
    assert(ManifestTable.read(spark, t).count() == 97)
    val v = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.entriesOf(spark, t, v)
      .map(e => e.dir -> e.files).toMap ==
      before.map(e => e.dir -> e.files).toMap,
      "an integral IN-list delete must rewrite zero data files")
    assert(ManifestTable.commitInfoOf(spark, t, v)
      .exists(_._1 == "deleteKeys"))
    // NULLs in the list contribute nothing; values outside the
    // type's range cannot match (id is BIGINT here so both are just
    // semantics checks)
    spark.sql("DELETE FROM dml_intin WHERE id IN (5, NULL)")
    assert(ManifestTable.read(spark, t).count() == 96)
    // single equality keeps the copy-on-write range fast path
    spark.sql("DELETE FROM dml_intin WHERE id = 7")
    assert(ManifestTable.read(spark, t).count() == 95)
    assert(ManifestTable.commitInfoOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
      .exists(_._1 == "deleteRange"))
  }

  test("subquery-predicate DML: uncorrelated IN/EXISTS/scalar " +
      "materialize at rule time; correlated stays loud") {
    val t = s"${Files.createTempDirectory("graft-dmlsubq")}/t"
    val aux = s"${Files.createTempDirectory("graft-dmlsubq")}/aux"
    ManifestTable.append(spark,
      Seq((1L, "k1", 10L), (2L, "k2", 20L), (3L, "k3", 30L))
        .toDF("id", "key", "n"), t,
      statsCols = Seq("id"), bloomCols = Seq("key"))
    ManifestTable.append(spark,
      Seq((4L, "k4", 40L), (5L, "k5", 50L))
        .toDF("id", "key", "n"), t,
      statsCols = Seq("id"), bloomCols = Seq("key"))
    ManifestTable.append(spark,
      Seq(("k2", true), ("k4", true), ("k9", false))
        .toDF("k", "bad"), aux)
    register(t, "dml_sq")
    register(aux, "dml_sq_aux")
    val entriesBefore = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    // string-key IN subquery routes MERGE-ON-READ: one tombstone
    // write, ZERO data files rewritten
    spark.sql("DELETE FROM dml_sq WHERE key IN " +
      "(SELECT k FROM dml_sq_aux WHERE bad)")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 3L, 5L))
    val vDel = ManifestTable.latestVersion(spark, t).get
    val entriesAfter = ManifestTable.entriesOf(spark, t, vDel)
    assert(entriesAfter.map(e => e.dir -> e.files).toMap ==
      entriesBefore.map(e => e.dir -> e.files).toMap,
      "an IN-subquery string point delete must route merge-on-read " +
        "(zero data files rewritten)")
    assert(ManifestTable.commitInfoOf(spark, t, vDel)
      .exists(_._1 == "deleteKeys"),
      "the IN-subquery delete must have routed through deleteKeys")
    // uncorrelated scalar subquery folds to a literal and hits the
    // integral RANGE fast path
    spark.sql("DELETE FROM dml_sq WHERE id >= " +
      "(SELECT max(id) FROM dml_sq)")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 3L))
    // EXISTS folds to a boolean literal: false = no-op (no version
    // committed), true = the statement's own WHERE semantics
    val vBefore = ManifestTable.latestVersion(spark, t).get
    spark.sql("UPDATE dml_sq SET n = 0 WHERE EXISTS " +
      "(SELECT 1 FROM dml_sq_aux WHERE k = 'nope')")
    assert(ManifestTable.latestVersion(spark, t).contains(vBefore),
      "a provably-false EXISTS must be a metadata no-op")
    spark.sql("UPDATE dml_sq SET n = 0 WHERE EXISTS " +
      "(SELECT 1 FROM dml_sq_aux WHERE bad)")
    assert(ManifestTable.read(spark, t).select("n")
      .as[Long].collect().toSet == Set(0L))
    // integral IN subquery (not a string point set) routes the
    // general predicate path — exact semantics
    spark.sql("DELETE FROM dml_sq WHERE id IN " +
      "(SELECT id FROM dml_sq WHERE id > 2)")
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L))
    // NOT IN materializes too and keeps SQL's three-valued
    // semantics: the literal list splices verbatim, so a NULL in the
    // subquery result makes NOT IN match nothing (exactly what the
    // statement run against any engine would do)
    ManifestTable.append(spark,
      Seq((100L, "k100", 1L), (101L, "k101", 1L))
        .toDF("id", "key", "n"), t)
    spark.sql("DELETE FROM dml_sq WHERE id NOT IN " +
      "(SELECT id FROM dml_sq WHERE id >= 100)")
    assert(ids(ManifestTable.read(spark, t)) == Seq(100L, 101L),
      "NOT IN subquery must delete exactly the non-members")
    // uncorrelated scalar subqueries in SET VALUES materialize too —
    // UPDATE and MERGE both (the warehouse idiom `SET n = (SELECT
    // max(n) …)`)
    spark.sql("UPDATE dml_sq SET n = " +
      "(SELECT count(*) FROM dml_sq_aux) WHERE id = 100")
    assert(ManifestTable.read(spark, t).filter(col("id") === 100)
      .select("n").as[Long].head() == 3L)
    Seq(101L).toDF("id")
      .createOrReplaceTempView("dml_sq_m")
    spark.sql("MERGE INTO dml_sq t USING dml_sq_m u ON t.id = u.id " +
      "WHEN MATCHED THEN UPDATE SET n = " +
      "(SELECT count(*) FROM dml_sq_aux WHERE bad)")
    assert(ManifestTable.read(spark, t).filter(col("id") === 101)
      .select("n").as[Long].head() == 2L)
    // correlated subqueries stay loud
    val ex = intercept[Exception] {
      spark.sql("DELETE FROM dml_sq WHERE EXISTS " +
        "(SELECT 1 FROM dml_sq_aux a WHERE a.k = dml_sq.key)")
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("CORRELATED")),
      s"got: ${msgs(ex).mkString(" | ")}")
  }

  test("over-cap IN subquery AUTO-ROUTES merge-on-read; the knob and " +
      "non-canonical shapes keep the loud MERGE remedy") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-dmlsqcap")}/t"
    Seq(0L, 1L).foreach { r =>
      ManifestTable.append(spark,
        (0L until 20L).filter(_ % 2 == r)
          .map(i => (i, s"k$i", i * 10L)).toDF("id", "key", "n"), t,
        statsCols = Seq("id"), bloomCols = Seq("key"))
    }
    register(t, "dml_sqcap")
    val capK = "spark.graft.dml.maxInlineSubqueryKeys"
    val routeK = "spark.graft.dml.subqueryJoinRoute"
    spark.conf.set(capK, "3") // force every set below over the cap
    try {
      val before = ManifestTable.entriesOf(spark, t,
        ManifestTable.latestVersion(spark, t).get)
      // canonical retention shape (the IN is the whole WHERE, plain
      // column): routes the DataFrame-valued merge-on-read delete
      spark.sql("DELETE FROM dml_sqcap WHERE key IN " +
        "(SELECT key FROM dml_sqcap WHERE id % 4 = 0)")
      assert(ids(ManifestTable.read(spark, t)) ==
        (0L until 20L).filterNot(_ % 4 == 0))
      val v = ManifestTable.latestVersion(spark, t).get
      assert(ManifestTable.commitInfoOf(spark, t, v)
        .exists(_._1 == "deleteKeys"),
        "the over-cap route must be deleteKeys (merge-on-read)")
      assert(ManifestTable.entriesOf(spark, t, v)
        .map(e => e.dir -> e.files).toMap ==
        before.map(e => e.dir -> e.files).toMap,
        "the over-cap route must rewrite zero data files")
      // the INTEGRAL twin routes too (deleteKeys spans both key kinds)
      spark.sql("DELETE FROM dml_sqcap WHERE id IN " +
        "(SELECT id FROM dml_sqcap WHERE id >= 14)")
      assert(ids(ManifestTable.read(spark, t)) ==
        (0L until 14L).filterNot(_ % 4 == 0))
      // over-cap UPDATE routes the frame-keyed COPY-ON-WRITE update:
      // only key-overlapping dirs rewrite, SET exprs may reference
      // target columns, non-matching rows keep their values
      spark.sql("UPDATE dml_sqcap SET n = n + 1000 WHERE key IN " +
        "(SELECT key FROM dml_sqcap WHERE id < 6)")
      val vu = ManifestTable.latestVersion(spark, t).get
      assert(ManifestTable.commitInfoOf(spark, t, vu)
        .exists(_._1 == "updateKeysFrame"),
        "the over-cap UPDATE must route through updateKeysFrame")
      val got = ManifestTable.read(spark, t)
        .select("id", "n").as[(Long, Long)].collect().toMap
      (0L until 14L).filterNot(_ % 4 == 0).foreach { i =>
        val want = if (i < 6) i * 10 + 1000 else i * 10
        assert(got(i) == want, s"id=$i: got ${got(i)}, want $want")
      }
      // DETERMINISTIC residual conjuncts beside the IN route the
      // frame-keyed copy-on-write paths: membership is the key-frame
      // join, the residual gates rows — and a member row failing the
      // residual SURVIVES (the bug a membership-only route would
      // introduce)
      val beforeRes = ids(ManifestTable.read(spark, t))
      spark.sql("DELETE FROM dml_sqcap WHERE key IN " +
        "(SELECT key FROM dml_sqcap) AND id >= 10")
      val vr = ManifestTable.latestVersion(spark, t).get
      assert(ManifestTable.commitInfoOf(spark, t, vr)
        .exists(_._1 == "deleteKeysFrameWhere"),
        "the over-cap residual DELETE must route deleteKeysFrameWhere")
      assert(ids(ManifestTable.read(spark, t)) ==
        beforeRes.filter(_ < 10),
        "member rows failing the residual must survive")
      spark.sql("UPDATE dml_sqcap SET n = 0 WHERE key IN " +
        "(SELECT key FROM dml_sqcap) AND id % 2 = 1")
      val vru = ManifestTable.latestVersion(spark, t).get
      assert(ManifestTable.commitInfoOf(spark, t, vru)
        .exists(_._1 == "updateKeysFrame"),
        "the over-cap residual UPDATE must route updateKeysFrame")
      val got2 = ManifestTable.read(spark, t)
        .select("id", "n").as[(Long, Long)].collect().toMap
      got2.foreach { case (i, nv) =>
        if (i % 2 == 1) assert(nv == 0L, s"id=$i must be patched")
        else assert(nv == got(i), s"id=$i must keep its value")
      }
      // genuinely unroutable over-cap shapes keep the loud MERGE
      // remedy: OR-joined membership ...
      val ex1 = intercept[Exception] {
        spark.sql("DELETE FROM dml_sqcap WHERE key IN " +
          "(SELECT key FROM dml_sqcap) OR id > 0")
      }
      assert(msgs(ex1).exists(_.contains("more than")),
        s"got: ${msgs(ex1).mkString(" | ")}")
      // ... and a residual carrying its own subquery
      val ex2 = intercept[Exception] {
        spark.sql("UPDATE dml_sqcap SET n = 1 WHERE key IN " +
          "(SELECT key FROM dml_sqcap) AND id IN " +
          "(SELECT id FROM dml_sqcap)")
      }
      assert(msgs(ex2).exists(_.contains("more than")),
        s"got: ${msgs(ex2).mkString(" | ")}")
      // ... and the knob restores the always-loud contract
      spark.conf.set(routeK, "false")
      val ex3 = intercept[Exception] {
        spark.sql("DELETE FROM dml_sqcap WHERE key IN " +
          "(SELECT key FROM dml_sqcap)")
      }
      assert(msgs(ex3).exists(_.contains("more than")),
        s"got: ${msgs(ex3).mkString(" | ")}")
    } finally {
      spark.conf.unset(capK)
      spark.conf.unset(routeK)
    }
  }

  test("composite-key IN subquery routes the tuple-frame paths at " +
      "ANY size; residuals gate rows; untouched dirs keep identity") {
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val t = s"${Files.createTempDirectory("graft-dmltuple")}/t"
    // two grp-disjoint dirs: the composite prune must keep the
    // untouched one physically identical
    Seq(0L, 1L).foreach { g =>
      ManifestTable.append(spark,
        (0L until 10L).map(i => (g, s"k$i", i))
          .toDF("grp", "key", "n"), t,
        statsCols = Seq("grp", "n"), bloomCols = Seq("key"))
    }
    register(t, "dml_tuple")
    def content() = ManifestTable.read(spark, t)
      .select("grp", "key", "n").as[(Long, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val before = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
    // composite DELETE scoped by the SUBQUERY to grp 0: routes the
    // tuple frame regardless of size (no cap lowering needed — a
    // composite membership is a join at any size)
    spark.sql("DELETE FROM dml_tuple WHERE (grp, key) IN " +
      "(SELECT grp, key FROM dml_tuple WHERE grp = 0 AND n % 3 = 0)")
    val v1 = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.commitInfoOf(spark, t, v1)
      .exists(_._1 == "deleteTuplesFrame"),
      "composite IN subquery DELETE must route deleteTuplesFrame")
    assert(content() == (for (g <- 0L to 1L; i <- 0L until 10L
      if !(g == 0 && i % 3 == 0)) yield (g, s"k$i", i)).toSeq)
    // the grp=1 dir is physically untouched (composite prune)
    val after1 = ManifestTable.entriesOf(spark, t, v1)
    val g1Before = before.filter(_.statMin.get("grp").contains(1L))
    assert(g1Before.nonEmpty && g1Before.forall(e =>
      after1.exists(a => a.dir == e.dir && a.files == e.files)),
      "the grp-disjoint dir must keep physical identity")
    // composite UPDATE with a residual: patch only members whose
    // residual holds
    spark.sql("UPDATE dml_tuple SET n = n + 100 WHERE (grp, key) IN " +
      "(SELECT grp, key FROM dml_tuple) AND n % 2 = 1")
    val v2 = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.commitInfoOf(spark, t, v2)
      .exists(_._1 == "updateTuplesFrame"),
      "composite IN subquery UPDATE must route updateTuplesFrame")
    assert(content() == (for (g <- 0L to 1L; i <- 0L until 10L
      if !(g == 0 && i % 3 == 0))
      yield (g, s"k$i", if (i % 2 == 1) i + 100 else i)).toSeq)
    // composite DELETE with a residual
    spark.sql("DELETE FROM dml_tuple WHERE (grp, key) IN " +
      "(SELECT grp, key FROM dml_tuple) AND grp = 1")
    val v3 = ManifestTable.latestVersion(spark, t).get
    assert(ManifestTable.commitInfoOf(spark, t, v3)
      .exists(_._1 == "deleteTuplesFrame"))
    assert(content().forall(_._1 == 0L),
      "residual-gated composite delete must only touch grp 1")
    // the knob restores the loud refusal for composite shapes too
    spark.conf.set("spark.graft.dml.subqueryJoinRoute", "false")
    try {
      val ex = intercept[Exception] {
        spark.sql("DELETE FROM dml_tuple WHERE (grp, key) IN " +
          "(SELECT grp, key FROM dml_tuple)")
      }
      assert(msgs(ex).exists(_.contains("MERGE INTO")),
        s"got: ${msgs(ex).mkString(" | ")}")
    } finally spark.conf.unset("spark.graft.dml.subqueryJoinRoute")
  }
}
