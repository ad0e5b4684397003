package graft

import graft.sinks.Maintenance
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataFiles(p: String): Array[String] =
    new java.io.File(p).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))

  test("compactParquet merges a many-file table, content unchanged") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val path = s"$tmp/t"
    // simulate 8 one-file batch appends
    (0 until 8).foreach { b =>
      Seq.tabulate(100)(i => (b * 100L + i, s"row ${b * 100 + i}"))
        .toDF("id", "v").repartition(1)
        .write.mode("append").parquet(path)
    }
    assert(dataFiles(path).length === 8)
    val before = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val nBefore = Maintenance.compactParquet(spark, path,
      sortCols = Seq("id"))
    assert(nBefore === 8L)
    // table bytes are far below one target file -> exactly one file
    assert(dataFiles(path).length === 1)
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(after.toSeq === before.toSeq)
    // swap scaffolding cleaned up
    assert(!new java.io.File(s"$path.compacting").exists())
    assert(!new java.io.File(s"$path.precompact").exists())
    // idempotent: recompaction of a compact table is a no-op shape
    assert(Maintenance.compactParquet(spark, path) === 1L)
    assert(dataFiles(path).length === 1)
  }

  test("compactParquet splits at targetFileBytes and refuses a missing table") {
    val tmp = Files.createTempDirectory("graft-compact2").toString
    val path = s"$tmp/t"
    Seq.tabulate(2000)(i => (i.toLong, ("x" * 100) + i))
      .toDF("id", "v").repartition(4)
      .write.mode("overwrite").parquet(path)
    // tiny target -> multiple output files, rows preserved
    Maintenance.compactParquet(spark, path, targetFileBytes = 16L << 10)
    assert(dataFiles(path).length > 1)
    assert(spark.read.parquet(path).count() === 2000L)
    intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, s"$tmp/nope")
    }
  }

  test("recoverPrecompact repairs every swap crash state") {
    import org.apache.spark.sql.SaveMode
    val tmp = Files.createTempDirectory("graft-recover").toString
    val path = s"$tmp/t"
    Seq.tabulate(100)(i => (i.toLong, s"row $i")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(path)
    val rows = spark.read.parquet(path)
      .collect().map(_.getLong(0)).sorted.toSeq

    // state 1 — crash BETWEEN the two renames: live absent, the only
    // complete copy stranded under .precompact. Reading this as an
    // empty table is the silent-loss mode; recovery renames it back.
    assert(new java.io.File(path)
      .renameTo(new java.io.File(s"$path.precompact")))
    assert(Maintenance.recoverPrecompact(spark, path))
    assert(spark.read.parquet(path)
      .collect().map(_.getLong(0)).sorted.toSeq === rows)
    assert(!new java.io.File(s"$path.precompact").exists())

    // state 2 — crash AFTER the swap but before cleanup: live is the
    // finished compaction, .precompact a stale duplicate. Recovery
    // deletes the leftover and reports nothing restored.
    Seq.tabulate(10)(i => (i.toLong, "stale")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(s"$path.precompact")
    assert(!Maintenance.recoverPrecompact(spark, path))
    assert(!new java.io.File(s"$path.precompact").exists())
    assert(spark.read.parquet(path)
      .collect().map(_.getLong(0)).sorted.toSeq === rows)

    // healthy path: no-op
    assert(!Maintenance.recoverPrecompact(spark, path))

    // compactParquet on the mid-crash state repairs then compacts —
    // it must never delete the stranded copy (the old fs.delete(old)
    // preamble would have)
    assert(new java.io.File(path)
      .renameTo(new java.io.File(s"$path.precompact")))
    Maintenance.compactParquet(spark, path)
    assert(spark.read.parquet(path)
      .collect().map(_.getLong(0)).sorted.toSeq === rows)
  }

  test("compactParquet refuses a Hive-partitioned layout loudly") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val path = s"$tmp/t"
    Seq((1L, "a", 2024), (2L, "b", 2025)).toDF("id", "v", "year")
      .write.partitionBy("year").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, path)
    }
    assert(e.getMessage.contains("flat-table-only"))
    // the refused table is untouched
    assert(spark.read.parquet(path).count() === 2L)
  }

  test("compactPartitioned compacts per leaf, preserving layout and pruning") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-partcompact").toString
    val path = s"$tmp/t"
    // 3 partitions; simulate 5 one-file batch appends into each
    (0 until 5).foreach { b =>
      Seq.tabulate(60)(i => (b * 100L + i, s"row $b-$i", 2023 + i % 3))
        .toDF("id", "v", "year").repartition(1)
        .write.partitionBy("year").mode("append").parquet(path)
    }
    val leaves = Seq(2023, 2024, 2025).map(y => s"$path/year=$y")
    leaves.foreach(l => assert(dataFiles(l).length === 5))
    val before = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    val (nLeaves, nFiles) = Maintenance.compactPartitioned(spark, path,
      sortCols = Seq("id"))
    assert(nLeaves === 3L && nFiles === 15L)
    leaves.foreach(l => assert(dataFiles(l).length === 1))
    // the partition column survives AS a partition: schema identical,
    // rows identical, and a partition filter still plans
    // PartitionFilters (pruning intact — the thing a flat rewrite of
    // the root would have destroyed)
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(after === before)
    val pruned = spark.read.parquet(path).filter(col("year") === 2024)
      .select("id")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(year"))
    // already-compact leaves are skipped on the next pass (no write
    // amplification: compaction touches only appended-to partitions)
    assert(Maintenance.compactPartitioned(spark, path) === ((0L, 0L)))
    // and an append to ONE partition recompacts only that leaf
    Seq((999L, "late", 2024)).toDF("id", "v", "year").repartition(1)
      .write.partitionBy("year").mode("append").parquet(path)
    assert(Maintenance.compactPartitioned(spark, path) === ((1L, 2L)))
    assert(spark.read.parquet(path).count() === 301L)
  }

  test("compactPartitioned repairs a leaf whose swap crashed, instead of compacting the debris") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-partcrash").toString
    val path = s"$tmp/t"
    (0 until 3).foreach { b =>
      Seq.tabulate(30)(i => (b * 100L + i, 2023 + i % 2))
        .toDF("id", "year").repartition(1)
        .write.partitionBy("year").mode("append").parquet(path)
    }
    val before = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // crash state 1: between the two renames — the leaf exists ONLY
    // as .precompact (the single complete copy); plus a dead partial
    // .compacting from the same crash
    val leaf = new java.io.File(s"$path/year=2023")
    assert(leaf.renameTo(new java.io.File(s"$path/year=2023.precompact")))
    new java.io.File(s"$path/year=2024.compacting").mkdirs()
    // without repair, the enumeration would compact BOTH debris dirs
    // under their wrong names and a root read would invent partitions
    // like 'year=2023.precompact' — instead: restore, then compact
    val (nLeaves, _) = Maintenance.compactPartitioned(spark, path)
    assert(nLeaves === 2L)
    assert(leaf.exists())
    assert(!new java.io.File(s"$path/year=2023.precompact").exists())
    assert(!new java.io.File(s"$path/year=2024.compacting").exists())
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(after === before)
    // partition VALUES are exactly the two real years
    assert(spark.read.parquet(path).select("year").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(2023, 2024))
  }

  test("writeAndSwap carries underscore side files through the swap") {
    val tmp = Files.createTempDirectory("graft-sidefile").toString
    val path = s"$tmp/t"
    Seq(1L, 2L, 3L).toDF("id").repartition(3)
      .write.parquet(path)
    Seq((42L, "meta")).toDF("k", "v").repartition(1)
      .write.parquet(s"$path/_side")
    Maintenance.compactParquet(spark, path)
    // the rewrite can't reproduce _side (spark.read skips it) — the
    // shared swap must carry it over, for every writeAndSwap caller
    val side = spark.read.parquet(s"$path/_side").collect()
    assert(side.length === 1 && side.head.getLong(0) === 42L)
    assert(spark.read.parquet(path).count() === 3L)
  }

  test("compactPartitioned refuses a dir mixing data files and subdirs") {
    val tmp = Files.createTempDirectory("graft-partmix").toString
    val path = s"$tmp/t"
    Seq((1L, "a", 2024)).toDF("id", "v", "year")
      .write.partitionBy("year").parquet(path)
    // drop a stray data file next to the partition dir
    Seq((2L, "b")).toDF("id", "v").repartition(1)
      .write.parquet(s"$tmp/stray")
    val strayFile = new java.io.File(s"$tmp/stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(strayFile.toPath,
      java.nio.file.Paths.get(s"$path/${strayFile.getName}"))
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactPartitioned(spark, path)
    }
    assert(e.getMessage.contains("mixes data files and"))
  }

  test("minFiles keeps a hot table's scan parallelism after compaction") {
    val tmp = Files.createTempDirectory("graft-compact3").toString
    val path = s"$tmp/t"
    (0 until 6).foreach { b =>
      Seq.tabulate(50)(i => (b * 50L + i, s"v$i")).toDF("id", "v")
        .repartition(1).write.mode("append").parquet(path)
    }
    // bytes are far under one target file, but minFiles floors the
    // output so a later scan still gets minFiles input splits
    Maintenance.compactParquet(spark, path, minFiles = 4)
    assert(dataFiles(path).length === 4)
    assert(spark.read.parquet(path).count() === 300L)
    assert(spark.read.parquet(path).rdd.getNumPartitions >= 4)
  }
}
