package graft

import graft.sinks.ManifestTable
import graft.sinks.ManifestTable.MergeClauseAction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The general ordered-clause MERGE engine
  * ([[ManifestTable.mergeClauses]] + the ManifestSqlRules routing):
  * conditioned WHEN MATCHED UPDATE/DELETE clauses taken first-true-
  * wins, conditioned INSERT, WHEN NOT MATCHED BY SOURCE
  * UPDATE/DELETE, composite ON keys with conjunctive dir pruning —
  * and the shapes that stay loud.
  */
class ManifestMergeClausesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(t: String): Seq[(Long, String, Long)] =
    ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq

  private def msgs(e: Throwable): Seq[String] =
    Option(e).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("ordered clauses: first true wins across UPDATE/DELETE/INSERT") {
    val t = s"${Files.createTempDirectory("graft-mc1")}/t"
    ManifestTable.append(spark, Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "grp", "n"),
      t, statsCols = Seq("id"))
    ManifestTable.append(spark, Seq(
      (4L, "b", 40L), (5L, "a", 50L)).toDF("id", "grp", "n"),
      t, statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc_t")
    // source: id 1 -> negative n (DELETE clause), id 2 -> grp 'a'
    // (ADD clause), id 3 -> grp 'b' falls through to the plain SET,
    // id 5 -> negative (DELETE beats the grp-'a' clause ORDER),
    // id 90 -> new + big (insert), id 91 -> new + small (filtered out)
    Seq((1L, "x", -1L), (2L, "x", 5L), (3L, "x", 7L), (5L, "x", -9L),
      (90L, "c", 900L), (91L, "c", 9L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc_u")
    spark.sql(
      """MERGE INTO mc_t t USING mc_u u ON t.id = u.id
        |WHEN MATCHED AND u.n < 0 THEN DELETE
        |WHEN MATCHED AND t.grp = 'a' THEN UPDATE SET n = t.n + u.n
        |WHEN MATCHED THEN UPDATE SET n = u.n
        |WHEN NOT MATCHED AND u.n > 100 THEN INSERT *""".stripMargin)
    assert(rows(t) == Seq(
      (2L, "a", 25L),   // matched, grp 'a': n = 20 + 5
      (3L, "b", 7L),    // matched, fell through: n = u.n
      (4L, "b", 40L),   // untouched (no source row)
      (90L, "c", 900L)  // inserted (only the big new key)
    ), s"got ${rows(t)}")
  }

  test("NOT MATCHED BY SOURCE retires stale rows and flags the rest") {
    val t = s"${Files.createTempDirectory("graft-mc2")}/t"
    ManifestTable.append(spark, Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("id", "grp", "n"), t, statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc2_t")
    Seq((1L, "a", 11L), (9L, "z", 90L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc2_u")
    // the retire-stale-records statement: refresh matched rows,
    // insert new ones, DELETE stale 'b' rows, zero-flag other stale
    spark.sql(
      """MERGE INTO mc2_t t USING mc2_u u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.grp = 'b' THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = 0""".stripMargin)
    assert(rows(t) == Seq(
      (1L, "a", 11L), // matched: whole-row refresh
      (2L, "a", 0L),  // not matched by source, grp 'a': zero-flagged
      (9L, "z", 90L)  // inserted; ids 3, 4 (grp 'b') retired
    ), s"got ${rows(t)}")
  }

  test("composite ON key: conjunctive pruning, exact composite upsert") {
    val t = s"${Files.createTempDirectory("graft-mc3")}/t"
    // two dirs with OVERLAPPING id ranges but DISJOINT grp ranges:
    // a single-column envelope keeps both; the conjunctive composite
    // prune must keep only the 'a' dir
    ManifestTable.append(spark, Seq(
      (1L, "a", 10L), (2L, "a", 20L)).toDF("id", "grp", "n"),
      t, statsCols = Seq("id", "grp"))
    ManifestTable.append(spark, Seq(
      (1L, "b", 30L), (2L, "b", 40L)).toDF("id", "grp", "n"),
      t, statsCols = Seq("id", "grp"))
    val dirsBefore = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).map(_.dir).toSet
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc3_t")
    Seq((1L, "a", 100L), (3L, "a", 300L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc3_u")
    spark.sql(
      """MERGE INTO mc3_t t USING mc3_u u
        |ON t.id = u.id AND t.grp = u.grp
        |WHEN MATCHED THEN UPDATE SET n = u.n
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(t) == Seq(
      (1L, "a", 100L), (1L, "b", 30L), (2L, "a", 20L), (2L, "b", 40L),
      (3L, "a", 300L)), s"got ${rows(t)}")
    // the 'b' dir was never part of the rewrite: same physical dir
    val dirsAfter = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).map(_.dir).toSet
    val survivors = dirsBefore.intersect(dirsAfter)
    assert(survivors.size == 1,
      s"exactly the grp-disjoint dir must survive untouched: " +
        s"before=$dirsBefore after=$dirsAfter")
    // (1, 'b') proves the composite match: same id, other grp, kept
  }

  test("programmatic: empty source + BY SOURCE DELETE clears the table") {
    val t = s"${Files.createTempDirectory("graft-mc4")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "n"), t)
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "grp", "n")
    val (v, touched) = ManifestTable.mergeClauses(spark, empty, t,
      Seq("id"), notMatchedBySource =
        Seq((None, MergeClauseAction.Delete)))
    assert(v == 2L && touched == 1)
    assert(ManifestTable.read(spark, t).count() == 0)
    // the pre-merge snapshot still reads
    assert(ManifestTable.readVersion(spark, t, 1L).count() == 2)
  }

  test("composite point DELETE/UPDATE route as single-tuple merges") {
    val t = s"${Files.createTempDirectory("graft-mc6")}/t"
    // two dirs: overlapping sub ranges, disjoint grp ranges — the
    // conjunctive prune must leave the 'b' dir physically untouched
    ManifestTable.append(spark, Seq(
      (1L, "a", 10L), (2L, "a", 20L)).toDF("sub", "grp", "n"),
      t, statsCols = Seq("sub", "grp"))
    ManifestTable.append(spark, Seq(
      (1L, "b", 30L), (2L, "b", 40L)).toDF("sub", "grp", "n"),
      t, statsCols = Seq("sub", "grp"))
    val dirsBefore = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).map(_.dir).toSet
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc6_t")
    spark.sql("DELETE FROM mc6_t WHERE grp = 'a' AND sub = 2")
    spark.sql("UPDATE mc6_t SET n = 99 WHERE grp = 'a' AND sub = 1")
    assert(rows(t) == Seq((1L, "a", 99L), (1L, "b", 30L), (2L, "b", 40L)),
      s"got ${rows(t)}")
    val dirsAfter = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).map(_.dir).toSet
    assert(dirsBefore.intersect(dirsAfter).size == 1,
      s"the grp-'b' dir must keep physical identity: " +
        s"$dirsBefore -> $dirsAfter")
    // an out-of-range integral literal provably matches nothing: a
    // no-op, never a wrapped cast hitting the wrong rows
    spark.sql("DELETE FROM mc6_t WHERE grp = 'b' AND " +
      "sub = 99999999999999999")
    assert(ManifestTable.read(spark, t).count() == 3)
    // a type-mismatched literal is loud
    def msgs2(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs2(x.getCause))
    val ex = intercept[Exception] { spark.sql(
      "DELETE FROM mc6_t WHERE grp = 'b' AND n = 'zzz'") }
    assert(msgs2(ex).exists(m => m.contains("integral") ||
      m.contains("unsupported WHERE") ||
      m.contains("CAST_INVALID_INPUT")), s"got ${msgs2(ex)}")
  }

  test("partitioned table: merged inserts land partition-pure") {
    val t = s"${Files.createTempDirectory("graft-mc7")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "n"), t,
      statsCols = Seq("id"),
      partitionSpec = Seq(graft.sinks.PartitionTransform.PIdentity("grp")))
    val (_, touched) = ManifestTable.mergeClauses(spark,
      Seq((1L, "a", 11L), (5L, "c", 50L), (6L, "a", 60L))
        .toDF("id", "grp", "n"), t, Seq("id"),
      matched = Seq((None,
        MergeClauseAction.Update(Seq("n" -> col("_src_n"))))),
      notMatchedInsert = Seq(None))
    assert(touched >= 1)
    val entries = ManifestTable.entriesOf(spark, t,
      ManifestTable.latestVersion(spark, t).get)
      .filter(_.rows.exists(_ > 0))
    assert(entries.forall(_.partition.contains("grp")),
      s"inserted dirs must stay partition-pure: " +
        s"${entries.map(_.partition)}")
    assert(ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq == Seq((1L, "a", 11L), (2L, "b", 20L),
        (5L, "c", 50L), (6L, "a", 60L)))
    // SET on a partition-source column is refused
    val ex = intercept[Exception] {
      ManifestTable.mergeClauses(spark,
        Seq((1L, "z", 0L)).toDF("id", "grp", "n"), t, Seq("id"),
        matched = Seq((None,
          MergeClauseAction.Update(Seq("grp" -> lit("z"))))))
    }
    assert(ex.getMessage.contains("partition-source"))
  }

  test("unsupported shapes stay loud; ANSI guardrails hold") {
    val t = s"${Files.createTempDirectory("graft-mc5")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a", 10L)).toDF("id", "grp", "n"), t)
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc5_t")
    Seq((1L, "a", 11L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc5_u")
    // an unconditional clause BEFORE a conditional one makes the
    // rest unreachable
    val ex1 = intercept[Exception] { spark.sql(
      """MERGE INTO mc5_t t USING mc5_u u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET n = u.n
        |WHEN MATCHED AND u.n < 0 THEN DELETE""".stripMargin) }
    assert(msgs(ex1).exists(m => m.contains("LAST") ||
      m.contains("unreachable") || m.contains("NON_LAST")),
      s"got ${msgs(ex1)}")
    // a partial-column INSERT that omits a NON-NULLABLE column (n)
    // is loud — an implicit NULL there is an accident, not semantics
    // (omitting a NULLABLE column routes and nulls explicitly — see
    // the partial-column INSERT test)
    val ex2 = intercept[Exception] { spark.sql(
      """MERGE INTO mc5_t t USING mc5_u u ON t.id = u.id
        |WHEN MATCHED AND u.n < 0 THEN DELETE
        |WHEN NOT MATCHED THEN INSERT (id) VALUES (u.id)""".stripMargin) }
    assert(msgs(ex2).exists(m => m.contains("non-nullable") ||
      m.contains("NULL") || m.contains("DEFAULT")), s"got ${msgs(ex2)}")
    // duplicate source keys: no defined winner (ANSI's one-match rule)
    Seq((1L, "a", 1L), (1L, "a", 2L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc5_dup")
    val ex3 = intercept[Exception] { spark.sql(
      """MERGE INTO mc5_t t USING mc5_dup u ON t.id = u.id
        |WHEN MATCHED AND u.n > 0 THEN DELETE""".stripMargin) }
    assert(msgs(ex3).exists(_.contains("duplicate key")))
    // a SET on a composite-key component is the row's identity
    val ex4 = intercept[Exception] {
      ManifestTable.mergeClauses(spark,
        Seq((1L, "a", 5L)).toDF("id", "grp", "n"), t,
        Seq("id", "grp"), matched = Seq((None,
          MergeClauseAction.Update(Seq("grp" -> lit("z"))))))
    }
    assert(msgs(ex4).exists(_.contains("identity")))
    // nothing above mutated the table
    assert(rows(t) == Seq((1L, "a", 10L)))
  }

  test("MERGE UPDATE SET on nested fields patches the leaf in place") {
    val t = s"${Files.createTempDirectory("graft-mcn")}/t"
    ManifestTable.append(spark,
      Seq((1L, ("de", 10L)), (2L, ("en", 20L))).toDF("id", "m")
        .select(col("id"), col("m._1").as("lang"), col("m._2").as("v"))
        .select(col("id"), struct(col("lang"), col("v")).as("meta")),
      t, statsCols = Seq("id"))
    // a NULL-parent row: a matched nested SET must keep it NULL
    ManifestTable.append(spark,
      Seq(Tuple1(3L)).toDF("id")
        .select(col("id"),
          lit(null).cast("struct<lang:string,v:bigint>").as("meta")),
      t, statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mcn_t")
    Seq((1L, 100L), (3L, 300L), (9L, 900L)).toDF("id", "dv")
      .createOrReplaceTempView("mcn_u")
    spark.sql(
      """MERGE INTO mcn_t t USING mcn_u u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET meta.v = u.dv""".stripMargin)
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getStruct(1))
        .map(s => (s.getString(0), s.getLong(1))))).toSeq
    assert(got == Seq(
      (1L, Some(("de", 100L))), // leaf patched, lang untouched
      (2L, Some(("en", 20L))),  // unmatched: untouched
      (3L, None)                // NULL parent stays NULL
    ), s"got $got")
  }

  test("partial-column INSERT: explicit typed NULLs, per-clause values, key required") {
    val t = s"${Files.createTempDirectory("graft-mc6")}/t"
    // grp (String) is NULLABLE; id/n (primitive Long) are not
    ManifestTable.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "n"), t,
      statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mc6_t")
    Seq((1L, "x", 5L), (30L, "c", 300L), (31L, "d", 3L))
      .toDF("id", "grp", "n").createOrReplaceTempView("mc6_u")
    // two ORDERED insert clauses with DIFFERENT column sets: the
    // fired clause decides each row's values; grp is omitted in both
    // (nullable → explicit NULL); the matched patch still sees the
    // ORIGINAL source columns
    spark.sql(
      """MERGE INTO mc6_t t USING mc6_u u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET n = t.n + u.n
        |WHEN NOT MATCHED AND u.n > 100
        |  THEN INSERT (id, n) VALUES (u.id, u.n * 2)
        |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (u.id, 0)"""
        .stripMargin)
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("a"), 15L),  // matched: n = 10 + 5
      (2L, Some("b"), 20L),  // untouched
      (30L, None, 600L),     // first insert clause: n doubled, grp NULL
      (31L, None, 0L)        // fall-through clause: n = 0
    ), s"got $got")
    // a partial insert that does NOT assign the merge key is loud
    val exKey = intercept[Exception] { spark.sql(
      """MERGE INTO mc6_t t USING mc6_u u ON t.id = u.id
        |WHEN NOT MATCHED THEN INSERT (grp, n) VALUES (u.grp, u.n)"""
        .stripMargin) }
    assert(msgs(exKey).exists(m => m.contains("merge key") ||
      m.contains("DEFAULT") || m.contains("non-nullable")),
      s"got ${msgs(exKey)}")
    // full-column EXPRESSION insert (not identity) routes the
    // general engine too
    Seq((40L, "e", 4L)).toDF("id", "grp", "n")
      .createOrReplaceTempView("mc6_v")
    spark.sql(
      """MERGE INTO mc6_t t USING mc6_v u ON t.id = u.id
        |WHEN NOT MATCHED
        |  THEN INSERT (id, grp, n) VALUES (u.id, upper(u.grp), u.n + 1)"""
        .stripMargin)
    val got2 = ManifestTable.read(spark, t)
      .filter(col("id") === 40L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got2 == Seq((40L, "E", 5L)), s"got $got2")
  }

  test("ON keys may differ in NAME: the source key renames to the " +
      "target's; collisions and ambiguous sides stay loud") {
    val t = s"${Files.createTempDirectory("graft-mckeys")}/t"
    ManifestTable.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n"), t,
      statsCols = Seq("id"))
    spark.read.format("graft-manifest").load(t)
      .createOrReplaceTempView("mck_t")
    Seq((2L, "B!", 200L), (3L, "c", 30L))
      .toDF("customer_id", "s", "n").createOrReplaceTempView("mck_u")
    // two ordered clauses force the general engine; the key names
    // differ across the ON (`t.id = u.customer_id`)
    spark.sql(
      """MERGE INTO mck_t t USING mck_u u ON t.id = u.customer_id
        |WHEN MATCHED AND u.n >= 100 THEN UPDATE SET s = u.s, n = u.n
        |WHEN NOT MATCHED THEN INSERT (id, s, n)
        |  VALUES (u.customer_id, u.s, u.n)""".stripMargin)
    val got = ManifestTable.read(spark, t)
      .select("id", "s", "n").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B!", 200L),
      (3L, "c", 30L)), s"got $got")
    // a source already carrying a column with the TARGET key's name
    // cannot rename over it — loud, never a silent shadow
    Seq((2L, 99L, "x")).toDF("customer_id", "id", "s")
      .createOrReplaceTempView("mck_bad")
    val ex = intercept[Exception] {
      spark.sql(
        """MERGE INTO mck_t t USING mck_bad u ON t.id = u.customer_id
          |WHEN MATCHED AND u.s = 'x' THEN DELETE
          |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (u.id, u.s)"""
          .stripMargin)
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("collide")),
      s"got ${msgs(ex)}")
  }
}
