package graft

import graft.model.Cve
import org.scalatest.funsuite.AnyFunSuite

class CveModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fullRecord =
    """{"cveMetadata":{"cveId":"CVE-2024-0001",
      |"datePublished":"2024-07-24T11:00:09.141Z",
      |"dateUpdated":"2024-07-25T08:30:00.000Z"},
      |"containers":{"cna":{"title":"Sample overflow",
      |"descriptions":[{"value":"A buffer overflow in X"},{"value":"dup"}],
      |"metrics":[{"cvssV3_1":{"baseScore":9.8,"baseSeverity":"CRITICAL"}}],
      |"problemTypes":[{"descriptions":[{"cweId":"CWE-120"}]}]}}}"""
      .stripMargin.replace("\n", "")

  private val sparseRecord =
    """{"cveMetadata":{"cveId":"CVE-2024-0002"},"containers":{"cna":{}}}"""

  private def parsed = spark.read.schema(Cve.cveSchema)
    .json(Seq(fullRecord, sparseRecord).toDS)

  test("extractMeta reads every nested path of a full record") {
    val r = Cve.extractMeta(parsed).filter($"cve_id" === "CVE-2024-0001")
      .collect()(0)
    assert(r.getAs[String]("title") == "Sample overflow")
    assert(r.getAs[String]("description") == "A buffer overflow in X")
    assert(r.getAs[String]("severity") == "CRITICAL")
    assert(r.getAs[Double]("score") == 9.8)
    assert(r.getAs[String]("cwe_id") == "CWE-120")
    assert(r.getAs[java.sql.Timestamp]("date_published").toInstant.toString
      == "2024-07-24T11:00:09.141Z")
  }

  test("extractMeta applies default-on-missing: '' and 0.0, never null") {
    val r = Cve.extractMeta(parsed).filter($"cve_id" === "CVE-2024-0002")
      .collect()(0)
    assert(r.getAs[String]("title") == "")
    assert(r.getAs[String]("description") == "")
    assert(r.getAs[String]("severity") == "")
    assert(r.getAs[Double]("score") == 0.0)
    assert(r.getAs[String]("cwe_id") == "")
  }

  test("docTemplate renders the reference's embedding text block") {
    val doc = Cve.docTemplate(Cve.extractMeta(parsed))
      .filter($"cve_id" === "CVE-2024-0001").select("doc")
      .collect()(0).getString(0)
    assert(doc ==
      "Title: Sample overflow\nCVE ID: CVE-2024-0001\nDescription: A buffer overflow in X")
  }

  test("rawPersist keeps scalars plus a re-parseable whole-record JSON") {
    val row = Cve.rawPersist(parsed)
      .filter($"cve_id" === "CVE-2024-0001").collect()(0)
    assert(row.getAs[String]("date_updated") == "2024-07-25T08:30:00.000Z")
    val roundTrip = spark.read.schema(Cve.cveSchema)
      .json(Seq(row.getAs[String]("data_json")).toDS)
    val again = Cve.extractMeta(roundTrip).collect()(0)
    assert(again.getAs[String]("cve_id") == "CVE-2024-0001")
    assert(again.getAs[Double]("score") == 9.8)
  }
}
