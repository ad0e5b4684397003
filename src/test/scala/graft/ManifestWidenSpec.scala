package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ALTER COLUMN TYPE widening ([[ManifestTable.widenColumnType]] +
  * the catalog's UpdateColumnType routing): `int -> bigint` /
  * `float -> double` as ONE metadata commit — old files keep their
  * narrower physical type and the scan widens at read (Spark 4's
  * parquet readers promote natively, filters included), new writes
  * carry the widened type, recorded stats/Blooms stay valid (both
  * persist long-normalized), and everything narrowing or
  * cross-family stays loud.
  */
class ManifestWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def msgs(e: Throwable): Seq[String] =
    Option(e).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("int->bigint: one metadata commit, mixed-era reads, pruning intact") {
    val t = s"${Files.createTempDirectory("graft-widen1")}/t"
    // two range-disjoint INT dirs committed BEFORE the widen
    ManifestTable.append(spark,
      (0 until 50).map(i => (i.toLong, i * 10)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"), bloomCols = Seq("n"))
    ManifestTable.append(spark,
      (50 until 100).map(i => (i.toLong, i * 10)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"), bloomCols = Seq("n"))
    assert(ManifestTable.read(spark, t).schema("n").dataType ==
      IntegerType)
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    val vPre = ManifestTable.latestVersion(spark, t).get
    val v = ManifestTable.widenColumnType(spark, t, "n", LongType)
    assert(v == vPre + 1)
    // METADATA-only: zero data movement
    assert(ManifestTable.read(spark, t).inputFiles.toSet == filesBefore)
    val widened = ManifestTable.read(spark, t)
    assert(widened.schema("n").dataType == LongType)
    assert(widened.select(sum(col("n"))).head.getLong(0) ==
      (0 until 100).map(_ * 10L).sum)
    // a LONG value beyond int range appends fine post-widen; an INT
    // batch still widens at the write boundary
    ManifestTable.append(spark,
      Seq((100L, 10000000000L)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"), bloomCols = Seq("n"))
    ManifestTable.append(spark,
      Seq((101L, 7)).toDF("id", "n"), t,
      statsCols = Seq("id", "n"), bloomCols = Seq("n"))
    assert(ManifestTable.read(spark, t).count() == 102)
    assert(ManifestTable.read(spark, t)
      .filter(col("n") === 10000000000L).count() == 1)
    // pre-widen stats keep PRUNING under post-widen long filters: the
    // executed scan skips the disjoint old dir
    val df = spark.read.format("graft-manifest").load(t)
      .filter(col("n") >= 600L && col("n") <= 990L)
    assert(df.count() == 40)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    val allFiles = ManifestTable.read(spark, t).inputFiles.length
    assert(scan.metrics("numFiles").value < allFiles,
      s"pre-widen stats must prune: read " +
        s"${scan.metrics("numFiles").value} of $allFiles files")
    // in-place UPDATE straddles both eras in one staged rewrite
    ManifestTable.updateRange(spark, t, "id", 40L, 60L,
      Seq("n" -> (col("n") + lit(1L))))
    val got = ManifestTable.read(spark, t)
      .filter(col("id").between(39L, 41L))
      .select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((39L, 390L), (40L, 401L), (41L, 411L)), s"$got")
    // TIME TRAVEL pins the pre-widen schema: the old snapshot still
    // reads its int files as int
    val old = ManifestTable.readVersion(spark, t, vPre)
    assert(old.schema("n").dataType == IntegerType)
    assert(old.count() == 100)
    // compaction normalizes every era to the widened physical type
    ManifestTable.compact(spark, t)
    val cf = ManifestTable.read(spark, t)
    assert(cf.schema("n").dataType == LongType && cf.count() == 102)
  }

  test("the change feed spans a widen: eras coerce, the widen emits nothing") {
    val t = s"${Files.createTempDirectory("graft-widen-cdf")}/t"
    ManifestTable.append(spark,
      Seq((1L, 10), (2L, 20)).toDF("id", "n"), t,
      statsCols = Seq("id"))                                   // v1
    val vW = ManifestTable.widenColumnType(spark, t, "n", LongType) // v2
    ManifestTable.append(spark,
      Seq((3L, 30000000000L)).toDF("id", "n"), t,
      statsCols = Seq("id"))                                   // v3
    ManifestTable.updateRange(spark, t, "id", 1L, 1L,
      Seq("n" -> (col("n") + lit(1L))))                        // v4
    val ch = ManifestTable.readChanges(spark, t, 0L,
      ManifestTable.latestVersion(spark, t).get)
    assert(ch.schema("n").dataType == LongType,
      "the feed must surface the WIDENED type across eras")
    val rows = ch.select("id", "n", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).sortBy(x => (x._4, x._1, x._3))
      .toSeq
    assert(rows == Seq(
      (1L, 10L, "insert", 1L), (2L, 20L, "insert", 1L),
      (3L, 30000000000L, "insert", 3L),
      (1L, 10L, "delete", 4L), (1L, 11L, "insert", 4L)),
      s"got $rows")
    assert(!rows.exists(_._4 == vW),
      "the widen is metadata-only: it must emit zero change rows")
  }

  test("float->double widens; narrowing and cross-family stay loud") {
    val t = s"${Files.createTempDirectory("graft-widen2")}/t"
    ManifestTable.append(spark,
      Seq((1L, 1.5f), (2L, 2.5f)).toDF("id", "x"), t,
      statsCols = Seq("id"))
    ManifestTable.widenColumnType(spark, t, "x", DoubleType)
    val r = ManifestTable.read(spark, t)
    assert(r.schema("x").dataType == DoubleType)
    assert(r.select(sum("x")).head.getDouble(0) == 4.0)
    // loud shapes: cross-family, narrowing, lossy, no-op, unknown col
    Seq("x" -> StringType, "id" -> IntegerType, "id" -> DoubleType,
      "x" -> DoubleType).foreach { case (c, to) =>
      val ex = intercept[Exception] {
        ManifestTable.widenColumnType(spark, t, c, to)
      }
      assert(msgs(ex).exists(m => m.contains("widening") ||
        m.contains("already")), s"$c -> $to: got ${msgs(ex)}")
    }
    val exCol = intercept[Exception] {
      ManifestTable.widenColumnType(spark, t, "nope", LongType)
    }
    assert(msgs(exCol).exists(_.contains("no column")))
    // partition-source columns are refused (bucket hashing is
    // type-dependent)
    val tp = s"${Files.createTempDirectory("graft-widen2p")}/t"
    ManifestTable.append(spark,
      Seq((1, "a")).toDF("b", "s"), tp,
      partitionSpec =
        Seq(graft.sinks.PartitionTransform.PBucket(4, "b")))
    val exP = intercept[Exception] {
      ManifestTable.widenColumnType(spark, tp, "b", LongType)
    }
    assert(msgs(exP).exists(_.contains("partition-source")))
  }

  test("SQL ALTER COLUMN TYPE routes the widen; rename after widen keeps id reads") {
    val wh = Files.createTempDirectory("graft-widen-wh").toString
    spark.conf.set("spark.sql.catalog.gw",
      "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    spark.sql("CREATE TABLE gw.db.w (id BIGINT, n INT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id,n')")
    spark.sql("INSERT INTO gw.db.w VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE gw.db.w ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO gw.db.w VALUES (3, 30000000000)")
    val got = spark.sql("SELECT id, n FROM gw.db.w ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30000000000L)))
    // narrowing is refused by Spark's own up-cast gate before the
    // catalog; cross-family widening by the table's gate
    val exN = intercept[Exception] {
      spark.sql("ALTER TABLE gw.db.w ALTER COLUMN n TYPE INT")
    }
    assert(msgs(exN).exists(m => m.contains("NOT_SUPPORTED_CHANGE") ||
      m.contains("widening")), s"got ${msgs(exN)}")
    // rename AFTER the widen: old int32 files resolve the renamed
    // column by field id AND read widened
    spark.sql("ALTER TABLE gw.db.w RENAME COLUMN n TO m")
    val got2 = spark.sql("SELECT id, m FROM gw.db.w ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((1L, 10L), (2L, 20L), (3L, 30000000000L)))
    // the SQL route accepts a NESTED dotted path too
    spark.sql("CREATE TABLE gw.db.wn " +
      "(id BIGINT, meta STRUCT<lang: STRING, n: INT>) " +
      "USING `graft-manifest`")
    spark.sql("INSERT INTO gw.db.wn VALUES (1, struct('en', 10))")
    spark.sql("ALTER TABLE gw.db.wn ALTER COLUMN meta.n TYPE BIGINT")
    spark.sql("INSERT INTO gw.db.wn VALUES (2, struct('de', 30000000000))")
    assert(spark.sql("SELECT sum(meta.n) FROM gw.db.wn")
      .head.getLong(0) == 30000000010L)
  }

  test("NESTED leaf widens in place: dotted path, mixed-era reads, " +
      "pruning intact") {
    val t = s"${Files.createTempDirectory("graft-widen-nested")}/t"
    def batch(lo: Int, n: Int) = (lo until lo + n)
      .map(i => (i.toLong, ("en", i * 10))).toDF("doc_id", "kv")
      .select(col("doc_id"), struct(col("kv._1").as("lang"),
        col("kv._2").as("n")).as("meta"))
    // two range-disjoint dirs with INT leaf meta.n, nested stats on
    ManifestTable.append(spark, batch(0, 50), t,
      statsCols = Seq("doc_id", "meta.n"))
    ManifestTable.append(spark, batch(50, 50), t,
      statsCols = Seq("doc_id", "meta.n"))
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    ManifestTable.widenColumnType(spark, t, "meta.n", LongType)
    // METADATA-only, leaf widened IN PLACE, sibling untouched
    val widened = ManifestTable.read(spark, t)
    assert(widened.inputFiles.toSet == filesBefore)
    assert(widened.schema("meta").dataType
      .asInstanceOf[StructType]("n").dataType == LongType)
    assert(widened.schema("meta").dataType
      .asInstanceOf[StructType]("lang").dataType == StringType)
    // mixed-era: old int32 leaves read widened; a beyond-int value
    // appends under the new shape
    ManifestTable.append(spark,
      Seq((100L, ("de", 10000000000L))).toDF("doc_id", "kv")
        .select(col("doc_id"), struct(col("kv._1").as("lang"),
          col("kv._2").as("n")).as("meta")),
      t, statsCols = Seq("doc_id", "meta.n"))
    assert(ManifestTable.read(spark, t)
      .select(sum(col("meta.n"))).head.getLong(0) ==
      (0 until 100).map(_ * 10L).sum + 10000000000L)
    // pre-widen nested stats keep pruning under post-widen filters
    val df = spark.read.format("graft-manifest").load(t)
      .filter(col("meta.n") >= 10000000000L)
    assert(df.count() == 1)
    df.collect()
    val scanned = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.get
    assert(scanned < ManifestTable.read(spark, t).inputFiles.length,
      "pre-widen nested stats must still prune")
    // descending through a non-struct and widening a missing path
    // stay loud
    intercept[Exception] {
      ManifestTable.widenColumnType(spark, t, "doc_id.x", LongType)
    }
    intercept[Exception] {
      ManifestTable.widenColumnType(spark, t, "meta.nope", LongType)
    }
  }

  test("decimal(p,s) widens to decimal(p+k,s); scale changes stay loud") {
    val t = s"${Files.createTempDirectory("graft-widen-dec")}/t"
    ManifestTable.append(spark,
      Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("56.78")))
        .toDF("id", "amt")
        .select(col("id"), col("amt").cast("decimal(10,2)").as("amt")),
      t, statsCols = Seq("id"))
    val filesBefore = ManifestTable.read(spark, t).inputFiles.toSet
    ManifestTable.widenColumnType(spark, t, "amt", DecimalType(20, 2))
    assert(ManifestTable.read(spark, t).inputFiles.toSet == filesBefore,
      "decimal widening must be metadata-only")
    assert(ManifestTable.read(spark, t).schema("amt").dataType ==
      DecimalType(20, 2))
    // old decimal(10,2) files read widened, exact values preserved
    assert(ManifestTable.read(spark, t).select(sum(col("amt")))
      .head.getDecimal(0).compareTo(new java.math.BigDecimal("69.12"))
      == 0)
    // a beyond-p10 value appends post-widen; a narrow batch aligns
    ManifestTable.append(spark,
      Seq((3L, BigDecimal("123456789012345678.99"))).toDF("id", "amt")
        .select(col("id"),
          col("amt").cast("decimal(20,2)").as("amt")),
      t, statsCols = Seq("id"))
    ManifestTable.append(spark,
      Seq((4L, BigDecimal("1.01"))).toDF("id", "amt")
        .select(col("id"),
          col("amt").cast("decimal(10,2)").as("amt")),
      t, statsCols = Seq("id"))
    assert(ManifestTable.read(spark, t).count() == 4)
    // scale change and precision NARROWING stay loud
    val exS = intercept[Exception] {
      ManifestTable.widenColumnType(spark, t, "amt", DecimalType(22, 4))
    }
    assert(msgs(exS).exists(_.contains("not a value-preserving")),
      s"got ${msgs(exS)}")
    intercept[Exception] {
      ManifestTable.widenColumnType(spark, t, "amt", DecimalType(10, 2))
    }
  }
}
