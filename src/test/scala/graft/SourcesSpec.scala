package graft

import graft.sources.Sources
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
