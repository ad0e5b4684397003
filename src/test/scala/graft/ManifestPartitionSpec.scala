package graft

import graft.sinks.{ManifestTable, PartitionTransform}
import graft.sinks.PartitionTransform._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Hidden partitioning on the manifest table: the spec is immutable
  * table metadata, appends land partition-pure dirs, reads prune from
  * the manifest alone (and stay exact over partition-blind dirs),
  * dropPartitions is metadata-only, and repartitionTable restores
  * purity after an operation that erased it.
  */
class ManifestPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    s"${Files.createTempDirectory(prefix)}/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def entries(t: String) = ManifestTable.entriesOf(spark, t,
    ManifestTable.latestVersion(spark, t).get)

  test("spec round-trips through render/parse") {
    val spec = Seq(PIdentity("lang"), PDays("ts"), PBucket(16, "id"),
      PTruncate(3, "url"))
    assert(PartitionTransform.parseSpec(
      PartitionTransform.renderSpec(spec)) == spec)
    intercept[RuntimeException](PartitionTransform.parse("nope:x"))
  }

  test("unescapePathValue decodes Hive %xx escapes and the null sentinel") {
    assert(unescapePathValue("a%3Ab%2Fc") == Some("a:b/c"))
    assert(unescapePathValue("plain-1.2") == Some("plain-1.2"))
    assert(unescapePathValue("100%") == Some("100%")) // dangling % kept
    assert(unescapePathValue(NullValue).isEmpty)
  }

  test("partitioned append: one pure dir per value, spec persisted") {
    val t = tmp("graft-part")
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("id", "lang")
    ManifestTable.append(spark, df, t, statsCols = Seq("id"),
      partitionSpec = Seq(PIdentity("lang")))
    val es = entries(t)
    assert(es.size == 3 &&
      es.map(_.partition).toSet ==
        Set(Map("lang" -> "en"), Map("lang" -> "de"),
          Map("lang" -> "fr")))
    // stats rode the one grouped restat: exact rows + id bounds
    val en = es.find(_.partition("lang") == "en").get
    assert(en.rows.contains(2L) && en.statMin("id") == 1L &&
      en.statMax("id") == 3L)
    // hidden partitioning: the data files do NOT grow a column
    assert(ManifestTable.read(spark, t).columns.toSeq ==
      Seq("id", "lang"))
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L, 4L))
    // the spec persisted and the next append inherits it
    ManifestTable.append(spark, Seq((5L, "en")).toDF("id", "lang"), t)
    assert(entries(t).count(_.partition.get("lang").contains("en")) == 2)
    // a DIFFERENT spec on the existing table fails loudly
    val ex = intercept[IllegalArgumentException](ManifestTable.append(
      spark, Seq((6L, "en")).toDF("id", "lang"), t,
      partitionSpec = Seq(PBucket(4, "id"))))
    assert(ex.getMessage.contains("immutable"))
    // the SAME spec is an idempotent no-op
    ManifestTable.append(spark, Seq((7L, "xx")).toDF("id", "lang"), t,
      partitionSpec = Seq(PIdentity("lang")))
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 3L, 4L, 5L, 7L))
  }

  test("derived transforms: days/bucket/truncate values, nulls addressable") {
    val t = tmp("graft-part-days")
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "alpha"),
      (2L, "2024-01-01 23:59:59", "alpaca"),
      (3L, "2024-01-02 00:00:01", "beta"),
      (4L, null.asInstanceOf[String], "gamma"))
      .toDF("id", "ts", "name")
      .withColumn("ts", col("ts").cast("timestamp"))
    ManifestTable.append(spark, df, t,
      partitionSpec = Seq(PDays("ts")))
    val es = entries(t)
    assert(es.map(_.partition("ts_day")).toSet ==
      Set("2024-01-01", "2024-01-02", NullValue))
    // the null partition is addressable like any other
    val (_, dropped) = ManifestTable.dropPartitions(spark, t,
      Map("ts_day" -> NullValue))
    assert(dropped == 1 &&
      ids(ManifestTable.read(spark, t)) == Seq(1L, 2L, 3L))
    // bucket: same key -> same dir across separate appends
    val tb = tmp("graft-part-bucket")
    ManifestTable.append(spark, Seq((10L, "a")).toDF("id", "v"), tb,
      partitionSpec = Seq(PBucket(8, "id")))
    ManifestTable.append(spark, Seq((10L, "b")).toDF("id", "v"), tb)
    val bvals = entries(tb).map(_.partition("id_bucket"))
    assert(bvals.size == 2 && bvals.toSet.size == 1)
    // truncate: string prefix
    val tt = tmp("graft-part-trunc")
    ManifestTable.append(spark,
      Seq((1L, "abcdef"), (2L, "abczzz"), (3L, "xyz")).toDF("id", "s"),
      tt, partitionSpec = Seq(PTruncate(3, "s")))
    assert(entries(tt).map(_.partition("s_trunc")).toSet ==
      Set("abc", "xyz"))
  }

  test("days(ts) is session-timezone independent, write and prune sides") {
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      val t = tmp("graft-part-tz")
      // write under UTC+14: the instant 2024-01-25T20:00:00Z is
      // already Jan 26 on the writer's wall clock — the partition
      // day must still be the UTC day
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      val df = Seq((1L, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-25T20:00:00Z"))))
        .toDF("id", "ts")
      ManifestTable.append(spark, df, t,
        partitionSpec = Seq(PDays("ts")))
      assert(entries(t).head.partition("ts_day") == "2024-01-25",
        s"got ${entries(t).head.partition}")
      // read under a THIRD zone: the SQL prune converts the literal
      // by the same UTC rule, so the matching dir is kept
      spark.conf.set("spark.sql.session.timeZone",
        "America/Los_Angeles")
      val q = spark.read.format("graft-manifest").load(t)
        .filter(col("ts") >=
          lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-25T00:00:00Z"))))
      assert(q.count() == 1L,
        "cross-timezone day pruning dropped a matching row")
      // and readPartitions addresses the UTC day whatever the zone
      assert(ManifestTable.readPartitions(spark, t,
        Map("ts_day" -> "2024-01-25")).count() == 1L)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("days(NTZ) and days(DATE) derive zone-free wall-clock days") {
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      // NTZ: the wall clock IS the value — the recorded day must be
      // the wall-clock day whatever the writer's session zone. Under
      // UTC+14 the old session-zone cast would have recorded
      // 2024-01-24 (the instant's UTC day) and the wall-clock prune
      // below would silently drop the dir.
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      val tn = tmp("graft-part-ntz")
      val dfn = Seq((1L, "2024-01-25 10:00:00")).toDF("id", "ts")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      ManifestTable.append(spark, dfn, tn,
        partitionSpec = Seq(PDays("ts")))
      assert(entries(tn).head.partition("ts_day") == "2024-01-25",
        s"NTZ day not wall-clock: ${entries(tn).head.partition}")
      // prune from a different zone: NTZ literals are wall clocks,
      // zone cannot enter on either side
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val qn = spark.read.format("graft-manifest").load(tn)
        .filter(col("ts") >= lit("2024-01-25 00:00:00")
          .cast("timestamp_ntz"))
      assert(qn.count() == 1L, "NTZ day pruning dropped a matching row")
      assert(spark.read.format("graft-manifest").load(tn)
        .filter(col("ts") >= lit("2024-01-26 00:00:00")
          .cast("timestamp_ntz")).count() == 0L)
      // DATE: the value is already a day — recorded verbatim, never
      // shifted through local midnight (under UTC+14 the old cast
      // chain would have recorded the PREVIOUS day)
      val td = tmp("graft-part-date")
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      val dfd = Seq((1L, java.sql.Date.valueOf("2024-01-25")))
        .toDF("id", "d")
      ManifestTable.append(spark, dfd, td,
        partitionSpec = Seq(PDays("d")))
      assert(entries(td).head.partition("d_day") == "2024-01-25",
        s"DATE day shifted: ${entries(td).head.partition}")
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val qd = spark.read.format("graft-manifest").load(td)
        .filter(col("d") === lit(java.sql.Date.valueOf("2024-01-25")))
      assert(qd.count() == 1L, "DATE day pruning dropped a matching row")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("temporal transforms reject non-temporal sources loudly") {
    val t = tmp("graft-part-badsrc")
    val df = Seq((1L, "2024-01-01")).toDF("id", "s")
    val ex = intercept[RuntimeException](ManifestTable.append(
      spark, df, t, partitionSpec = Seq(PDays("s"))))
    assert(ex.getMessage.contains("temporal transforms"))
    val ex2 = intercept[RuntimeException](ManifestTable.append(
      spark,
      Seq((1L, java.sql.Date.valueOf("2024-01-25"))).toDF("id", "d"),
      t, partitionSpec = Seq(PHours("d"))))
    assert(ex2.getMessage.contains("hours()"))
  }

  test("months/years/hours transforms: values, pruning, retention drop") {
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      val t = tmp("graft-part-months")
      val df = Seq(
        (1L, "2023-11-30T23:30:00Z"), (2L, "2023-12-15T08:00:00Z"),
        (3L, "2024-01-05T10:00:00Z"), (4L, "2024-01-20T20:00:00Z"))
        .toDF("id", "ts")
        .withColumn("ts", to_timestamp(col("ts")))
      ManifestTable.append(spark, df, t,
        partitionSpec = Seq(PMonths("ts")))
      assert(entries(t).map(_.partition("ts_month")).toSet ==
        Set("2023-11", "2023-12", "2024-01"))
      // prune from another zone: ts range → month bounds, UTC rule
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val q = spark.read.format("graft-manifest").load(t)
        .filter(col("ts") >= lit(java.sql.Timestamp.from(
          java.time.Instant.parse("2023-12-01T00:00:00Z"))))
      assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 3L, 4L))
      assert(scanFiles(q) == 2L, "month pruning kept the 2023-11 dir")
      // monthly retention: ONE metadata-only drop per month
      val (_, dropped) = ManifestTable.dropPartitions(spark, t,
        Map("ts_month" -> "2023-11"))
      assert(dropped == 1 &&
        ids(ManifestTable.read(spark, t)) == Seq(2L, 3L, 4L))
      // years: same data, coarser grain
      val ty = tmp("graft-part-years")
      ManifestTable.append(spark, df, ty,
        partitionSpec = Seq(PYears("ts")))
      assert(entries(ty).map(_.partition("ts_year")).toSet ==
        Set("2023", "2024"))
      val qy = spark.read.format("graft-manifest").load(ty)
        .filter(col("ts") < lit(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z"))))
      assert(qy.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      assert(scanFiles(qy) == 1L, "year pruning kept the 2024 dir")
      // hours: tz-aware UTC hour values; one-hour slice reads one dir
      val th = tmp("graft-part-hours")
      val dfh = Seq(
        (1L, "2024-01-25T06:10:00Z"), (2L, "2024-01-25T06:50:00Z"),
        (3L, "2024-01-25T07:05:00Z"))
        .toDF("id", "ts")
        .withColumn("ts", to_timestamp(col("ts")))
      ManifestTable.append(spark, dfh, th,
        partitionSpec = Seq(PHours("ts")))
      assert(entries(th).map(_.partition("ts_hour")).toSet ==
        Set("2024-01-25-06", "2024-01-25-07"))
      val qh = spark.read.format("graft-manifest").load(th)
        .filter(col("ts") >= lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-25T06:00:00Z"))) &&
          col("ts") < lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-25T07:00:00Z"))))
      assert(qh.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      assert(scanFiles(qh) == 1L, "hour pruning kept the 07 dir")
      // NTZ hours are wall-clock hours
      val thn = tmp("graft-part-hours-ntz")
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      ManifestTable.append(spark,
        Seq((1L, "2024-01-25 06:10:00")).toDF("id", "ts")
          .withColumn("ts", col("ts").cast("timestamp_ntz")),
        thn, partitionSpec = Seq(PHours("ts")))
      assert(entries(thn).head.partition("ts_hour") == "2024-01-25-06")
      // spec round-trip covers the new transforms
      val spec = Seq(PMonths("a"), PYears("b"), PHours("c"))
      assert(PartitionTransform.parseSpec(
        PartitionTransform.renderSpec(spec)) == spec)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("out-of-ISO-range temporal values: derived exactly, never pruned") {
    // a negative year renders with a sign ("-0005-01-01") — not
    // lexicographically comparable with ISO bounds, so the prune side
    // must KEEP such a dir under any range filter (conservative),
    // never silently drop its rows
    val t = tmp("graft-part-ancient")
    val df = Seq(
      (1L, java.time.LocalDate.of(-5, 1, 1)),
      (2L, java.time.LocalDate.of(2024, 1, 25))).toDF("id", "d")
    ManifestTable.append(spark, df, t, partitionSpec = Seq(PDays("d")))
    val q = spark.read.format("graft-manifest").load(t)
      .filter(col("d") < lit(java.sql.Date.valueOf("2020-01-01")))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "a non-ISO-comparable partition value must not prune")
    // the reverse filter: the ancient dir is KEPT (conservative —
    // its value cannot be ordered), scanned, and filtered exactly by
    // the row-level predicate; the answer stays right either way
    val q2 = spark.read.format("graft-manifest").load(t)
      .filter(col("d") >= lit(java.sql.Date.valueOf("2020-01-01")))
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(scanFiles(q2) == 2L,
      "conservative keep: the non-comparable dir is scanned, not guessed at")
    // hours(NTZ) derives the partition value ARITHMETICALLY (date
    // cast + hour()), not by string slicing — a signed year must
    // yield "<day>-<HH>", not a shifted malformed slice
    val th = tmp("graft-part-ancient-hours")
    val dfh = df.withColumn("ts", col("d").cast("timestamp_ntz"))
      .drop("d")
    ManifestTable.append(spark, dfh, th,
      partitionSpec = Seq(PHours("ts")))
    assert(entries(th).map(_.partition("ts_hour")).toSet ==
      Set("-0005-01-01-00", "2024-01-25-00"),
      s"hours(NTZ) mis-derived: ${entries(th).map(_.partition)}")
    val qh = spark.read.format("graft-manifest").load(th)
      .filter(col("ts") <
        lit("2020-01-01 00:00:00").cast("timestamp_ntz"))
    assert(qh.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("readPartitions prunes pure dirs and stays exact over blind dirs") {
    val t = tmp("graft-part-read")
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
    ManifestTable.append(spark, df, t, statsCols = Seq("id"),
      partitionSpec = Seq(PIdentity("par")))
    val evens = ManifestTable.readPartitions(spark, t,
      Map("par" -> "even"))
    assert(ids(evens) == (2L to 40L by 2))
    // prune evidence: the read resolved exactly the one pure dir
    assert(evens.inputFiles.length ==
      entries(t).find(_.partition("par") == "even").get
        .files.get.size)
    // erase purity via clusterZ-style maintenance? cluster needs
    // integral cols; simulate a blind dir with a raw unpartitioned
    // append through the batch writer: overwrite the spec path by
    // appending BEFORE the spec exists on a second table, then union
    // — here instead exercise bind-blind via cluster on id
    ManifestTable.cluster(spark, t, "id", nDirs = 2)
    val post = entries(t)
    assert(post.forall(_.partition.isEmpty)) // cluster is partition-blind
    // reads remain EXACT: transforms re-derived as a row filter
    assert(ids(ManifestTable.readPartitions(spark, t,
      Map("par" -> "even"))) == (2L to 40L by 2))
    // dropPartitions refuses on blind dirs, loudly, naming the fix
    val ex = intercept[IllegalArgumentException](
      ManifestTable.dropPartitions(spark, t, Map("par" -> "even")))
    assert(ex.getMessage.contains("repartitionTable"))
    // repartitionTable restores purity; dropPartitions re-arms
    ManifestTable.repartitionTable(spark, t)
    assert(entries(t).filter(_.files.exists(_.nonEmpty))
      .forall(_.partition.contains("par")))
    val (_, n) = ManifestTable.dropPartitions(spark, t,
      Map("par" -> "even"))
    assert(n == 1 &&
      ids(ManifestTable.read(spark, t)) == (1L to 39L by 2))
  }

  test("dropPartitions is metadata-only; old snapshots still read the rows") {
    val t = tmp("graft-part-drop")
    ManifestTable.append(spark,
      Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "par"),
      t, partitionSpec = Seq(PIdentity("par")))
    val v1 = ManifestTable.latestVersion(spark, t).get
    val before = entries(t).map(_.dir).toSet
    val (v2, n) = ManifestTable.dropPartitions(spark, t,
      Map("par" -> "drop"))
    assert(n == 1 && v2 == v1 + 1)
    // metadata-only: every pre-drop data dir still physically exists
    val (fs, _) = {
      val p = new org.apache.hadoop.fs.Path(t)
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    assert(before.forall(d => fs.exists(
      new org.apache.hadoop.fs.Path(s"$t/data/$d"))))
    // new snapshot lost the partition; time travel still sees it
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 3L))
    assert(ids(ManifestTable.readVersion(spark, t, v1)) ==
      Seq(1L, 2L, 3L))
    // vacuum reaps the dropped dir with its snapshots
    ManifestTable.vacuum(spark, t, keepVersions = 1)
    assert(ids(ManifestTable.read(spark, t)) == Seq(1L, 3L))
    assert(!before.forall(d => fs.exists(
      new org.apache.hadoop.fs.Path(s"$t/data/$d"))))
  }

  test("merge and deleteRange keep partition purity (staged rewrites carry it)") {
    val t = tmp("graft-part-merge")
    ManifestTable.append(spark,
      (1L to 10L).map(i => (i, if (i <= 5) "a" else "b"))
        .toDF("id", "par"),
      t, statsCols = Seq("id"), partitionSpec = Seq(PIdentity("par")))
    // merge replaces key 3 and inserts key 11 — rewritten dir stays
    // pure "a"; the inserted batch lands partitioned too
    ManifestTable.merge(spark,
      Seq((3L, "a"), (11L, "b")).toDF("id", "par"), t, "id")
    val es = entries(t).filter(_.files.exists(_.nonEmpty))
    assert(es.forall(_.partition.contains("par")),
      s"blind dirs after merge: ${es.filter(_.partition.isEmpty)}")
    assert(ids(ManifestTable.read(spark, t)) == (1L to 11L))
    // deleteRange rewrite also carries purity
    ManifestTable.deleteRange(spark, t, "id", 1L, 2L)
    assert(entries(t).filter(_.files.exists(_.nonEmpty))
      .forall(_.partition.contains("par")))
    assert(ids(ManifestTable.read(spark, t)) == (3L to 11L))
    // ...so dropPartitions still works after both
    val (_, n) = ManifestTable.dropPartitions(spark, t,
      Map("par" -> "a"))
    assert(n >= 1 && ids(ManifestTable.read(spark, t)) == (6L to 11L))
  }

  test("compact on a partitioned table folds per partition, not across") {
    val t = tmp("graft-part-compact")
    (1L to 3L).foreach { k =>
      ManifestTable.append(spark,
        Seq((k, "x"), (k + 100L, "y")).toDF("id", "par"), t,
        partitionSpec = Seq(PIdentity("par")))
    }
    assert(entries(t).size == 6)
    ManifestTable.compact(spark, t)
    val es = entries(t).filter(_.files.exists(_.nonEmpty))
    assert(es.size == 2 &&
      es.map(_.partition("par")).toSet == Set("x", "y"))
    assert(ids(ManifestTable.read(spark, t)) ==
      Seq(1L, 2L, 3L, 101L, 102L, 103L))
  }

  test("overwrite keeps the spec and lands partitioned") {
    val t = tmp("graft-part-ow")
    ManifestTable.append(spark,
      Seq((1L, "a")).toDF("id", "par"), t,
      partitionSpec = Seq(PIdentity("par")))
    ManifestTable.overwrite(spark,
      Seq((7L, "p"), (8L, "q")).toDF("id", "par"), t)
    val es = entries(t)
    assert(es.size == 2 &&
      es.map(_.partition("par")).toSet == Set("p", "q"))
    // spec survived the overwrite
    assert(ManifestTable.partitionSpecOf(spark, t,
      ManifestTable.latestVersion(spark, t).get).nonEmpty)
  }

  test("streaming sink partitionBy: every batch lands partition-pure dirs") {
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-part-sink").toString
    val t = s"$tmp/table"
    val mem = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("id", "lang").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$tmp/ckpt")
      .option("statsCols", "id")
      .partitionBy("lang")
      .start(t)
    mem.addData((1L, "en"), (2L, "de")); q.processAllAvailable()
    mem.addData((3L, "en")); q.processAllAvailable()
    q.stop()
    val es = entries(t).filter(_.files.exists(_.nonEmpty))
    assert(es.forall(_.partition.contains("lang")) &&
      es.count(_.partition("lang") == "en") == 2)
    // spec persisted at creation: retention by partition works now
    val (_, n) = ManifestTable.dropPartitions(spark, t,
      Map("lang" -> "de"))
    assert(n == 1 && ids(ManifestTable.read(spark, t)) == Seq(1L, 3L))
    // a derived-transform spec conflicts with partitionBy, loudly
    val mem2 = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[(Long, String)]
    val ex = intercept[IllegalArgumentException] {
      mem2.toDF.toDF("id", "lang").writeStream
        .format("graft-manifest")
        .option("checkpointLocation", s"$tmp/ckpt2")
        .option("partitionSpec", "bucket:4:id")
        .partitionBy("lang")
        .start(s"$tmp/t2")
    }
    assert(ex.getMessage.contains("not both"))
  }

  /** numFiles the (already-executed) frame's scan actually planned. */
  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value)
      .getOrElse(fail("no FileSourceScanExec"))

  test("SQL reads prune hidden partitions: identity, days, bucket, truncate") {
    import org.apache.spark.sql.functions.col
    // identity on a string column — NO stats recorded on it, so any
    // pruning below is the partition metadata's doing
    val t1 = tmp("graft-psql-id")
    ManifestTable.append(spark,
      Seq((1L, "en"), (2L, "de"), (3L, "fr"), (4L, "en"))
        .toDF("id", "lang"),
      t1, partitionSpec = Seq(PIdentity("lang")))
    val allFiles1 = spark.read.format("graft-manifest").load(t1)
      .inputFiles.length
    val q1 = spark.read.format("graft-manifest").load(t1)
      .filter(col("lang") === "en")
    assert(q1.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    assert(scanFiles(q1) < allFiles1)
    // days(ts): the user filters ts, the engine prunes day dirs
    val t2 = tmp("graft-psql-days")
    val df2 = Seq(
      (1L, "2024-03-01 08:00:00"), (2L, "2024-03-02 09:00:00"),
      (3L, "2024-03-03 10:00:00"), (4L, "2024-03-03 23:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    ManifestTable.append(spark, df2, t2,
      partitionSpec = Seq(PDays("ts")))
    val q2 = spark.read.format("graft-manifest").load(t2)
      .filter(col("ts") >= lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(q2.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(scanFiles(q2) == 1L) // exactly the 2024-03-03 dir
    // bucket(8, id): point lookups touch one bucket dir; sweep every
    // key for no-false-negative
    val t3 = tmp("graft-psql-bkt")
    ManifestTable.append(spark,
      (1L to 32L).map(i => (i, s"v$i")).toDF("id", "v"), t3,
      partitionSpec = Seq(PBucket(8, "id")))
    val nDirs3 = entries(t3).count(_.files.exists(_.nonEmpty))
    assert(nDirs3 > 1)
    (1L to 32L).foreach { k =>
      val q = spark.read.format("graft-manifest").load(t3)
        .filter(col("id") === k)
      assert(q.collect().map(_.getString(1)).toSeq == Seq(s"v$k"),
        s"bucket prune lost key $k")
      assert(scanFiles(q) == 1L, s"key $k read more than its bucket")
    }
    // truncate(3, s): equality on the source prefixes into one dir
    val t4 = tmp("graft-psql-tr")
    ManifestTable.append(spark,
      Seq((1L, "abcdef"), (2L, "abczzz"), (3L, "xyzppp"))
        .toDF("id", "s"),
      t4, partitionSpec = Seq(PTruncate(3, "s")))
    val q4 = spark.read.format("graft-manifest").load(t4)
      .filter(col("s") === "xyzppp")
    assert(q4.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(scanFiles(q4) == 1L)
  }

  test("SQL partition pruning stays exact over blind dirs and null partitions") {
    import org.apache.spark.sql.functions.col
    val t = tmp("graft-psql-blind")
    ManifestTable.append(spark,
      Seq((1L, "en"), (2L, "de"), (3L, null.asInstanceOf[String]))
        .toDF("id", "lang"),
      t, partitionSpec = Seq(PIdentity("lang")))
    // a value filter excludes the pure-null dir (sound: null never
    // matches) and keeps only 'de'
    val q = spark.read.format("graft-manifest").load(t)
      .filter(col("lang") === "de")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(scanFiles(q) == 1L)
    // IS NULL still finds the null partition's rows (no value
    // constraint derived — nullness pruning governs, partition check
    // passes the dir through)
    val qn = spark.read.format("graft-manifest").load(t)
      .filter(col("lang").isNull)
    assert(qn.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // cluster erases partition metadata; SQL reads keep blind dirs
    // (parity, no wrong prune)
    ManifestTable.cluster(spark, t, "id", nDirs = 1)
    val q2 = spark.read.format("graft-manifest").load(t)
      .filter(col("lang") === "en")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("partitioned append with bloomCols: per-dir filters via parallel promotion") {
    val t = tmp("graft-part-bloom")
    val df = (1L to 60L).map(i => (i, s"p${i % 5}")).toDF("id", "par")
    ManifestTable.append(spark, df, t, statsCols = Seq("id"),
      bloomCols = Seq("id"), partitionSpec = Seq(PIdentity("par")))
    val es = entries(t)
    assert(es.size == 5 && es.forall(_.bloom.contains("id")))
    // no-false-negative sweep: every key's own dir passes its filter
    (1L to 60L).foreach { k =>
      val home = es.find(_.partition("par") == s"p${k % 5}").get
      assert(home.mightContainPoint("id", k), s"bloom lost key $k")
    }
    assert(ids(ManifestTable.read(spark, t)) == (1L to 60L))
  }

  test("repartitionTable(sortWithin) orders rows inside each partition") {
    val t = tmp("graft-part-sort")
    // interleaved ids per lang across 3 commits
    (0 until 3).foreach { i =>
      ManifestTable.append(spark,
        (0L until 30L).filter(_ % 3 == i)
          .map(x => (x, if (x % 2 == 0) "a" else "b")).toDF("id", "par"),
        t, statsCols = Seq("id"),
        partitionSpec = Seq(PIdentity("par")))
    }
    ManifestTable.repartitionTable(spark, t, sortWithin = Seq("id"))
    val es = entries(t).filter(_.files.exists(_.nonEmpty))
    assert(es.size == 2 && es.forall(_.partition.contains("par")))
    // every file is internally sorted on id (read back per dir
    // without shuffle: file order == parquet row order)
    es.foreach { e =>
      val got = spark.read.parquet(s"$t/data/${e.dir}")
        .select("id").as[Long].collect().toSeq
      assert(got == got.sorted, s"dir ${e.dir} not id-ordered: $got")
    }
    assert(ids(ManifestTable.read(spark, t)) == (0L until 30L))
  }

  test("partitionFanout spreads a partition over several files, one dir") {
    val t = tmp("graft-part-fan")
    val df = (1L to 200L).map(i => (i, "en")).toDF("id", "lang")
    ManifestTable.append(spark, df, t, statsCols = Seq("id"),
      partitionSpec = Seq(PIdentity("lang")), partitionFanout = 4)
    val es = entries(t)
    // still ONE partition-pure dir — but holding several files, so a
    // huge/skewed partition is not one write task's problem
    assert(es.size == 1 && es.head.partition("lang") == "en")
    val nFiles = es.head.files.get.size
    assert(nFiles == 4, s"expected 4 round-robin files, got $nFiles")
    // stats/rows stayed exact through the fanout (grouped restat is
    // per-partition, not per-file)
    assert(es.head.rows.contains(200L) &&
      es.head.statMin("id") == 1L && es.head.statMax("id") == 200L)
    assert(ids(ManifestTable.read(spark, t)) == (1L to 200L))
    // the round-robin split is deterministic (local sort first): a
    // second identical append stages the identical file split
    ManifestTable.append(spark, df, t, partitionFanout = 4)
    val e2 = entries(t).filterNot(_.dir == es.head.dir).head
    assert(e2.files.get.size == nFiles)
  }

  test("special characters in partition values survive the dir round-trip") {
    val t = tmp("graft-part-esc")
    val vals = Seq("a:b", "c/d", "e f", "g=h", "ümlaut")
    ManifestTable.append(spark,
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "par"),
      t, partitionSpec = Seq(PIdentity("par")))
    assert(entries(t).map(_.partition("par")).toSet == vals.toSet)
    vals.foreach { v =>
      assert(ManifestTable.readPartitions(spark, t, Map("par" -> v))
        .count() == 1L, s"value '$v' not readable back")
    }
  }
}
