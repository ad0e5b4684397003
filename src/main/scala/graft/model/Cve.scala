package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CVE JSON v5 data model: the pinned schema of the paths the
  * reference actually reads (`/root/reference/consumer/consumer.py:76-106`,
  * `/root/reference/processor.py:48-52`) and the silver-record extraction.
  *
  * The schema is pinned in code — never inferred — per SURVEY.md §1.2:
  * at 100 TB an inference pass is a full extra scan, and schema drift
  * between batches would silently fork the table layout.
  */
object Cve {

  /** Minimal CVE v5 record schema: exactly the paths the pipeline reads.
    * Parquet/JSON readers prune to these even if the raw documents carry
    * hundreds more fields. */
  val cveSchema: StructType = StructType(Seq(
    StructField("cveMetadata", StructType(Seq(
      StructField("cveId", StringType),
      StructField("datePublished", StringType),
      StructField("dateUpdated", StringType)))),
    StructField("containers", StructType(Seq(
      StructField("cna", StructType(Seq(
        StructField("title", StringType),
        StructField("descriptions", ArrayType(StructType(Seq(
          StructField("value", StringType))))),
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("cvssV3_1", StructType(Seq(
            StructField("baseScore", DoubleType),
            StructField("baseSeverity", StringType)))))))),
        StructField("problemTypes", ArrayType(StructType(Seq(
          StructField("descriptions", ArrayType(StructType(Seq(
            StructField("cweId", StringType)))))))))))))))))

  /** Typed silver record (the `_process_cve_for_embedding` metadata dict,
    * `consumer/consumer.py:92-104`). */
  final case class CveRecord(
      cveId: String,
      datePublished: java.sql.Timestamp,
      dateUpdated: java.sql.Timestamp,
      title: String,
      description: String,
      severity: String,
      score: Double,
      cweId: String)

  private def firstOrNull(arr: Column, field: String): Column =
    coalesce(try_element_at(arr, lit(1)).getField(field),
      lit(null).cast(StringType))

  /** P1 nested projection with the reference's default-on-missing
    * semantics: absent string paths -> "", absent score -> 0.0
    * (`consumer/consumer.py:80-104` `.get(..., default)` chains).
    * Input: a DataFrame with [[cveSchema]]-shaped columns. */
  def extractMeta(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val cna = col("containers.cna")
    df.select(keep.map(col) ++ Seq(
      coalesce(col("cveMetadata.cveId"), lit("")).as("cve_id"),
      to_timestamp(col("cveMetadata.datePublished"),
        "yyyy-MM-dd'T'HH:mm:ss[.SSS]X").as("date_published"),
      to_timestamp(col("cveMetadata.dateUpdated"),
        "yyyy-MM-dd'T'HH:mm:ss[.SSS]X").as("date_updated"),
      coalesce(cna.getField("title"), lit("")).as("title"),
      coalesce(firstOrNull(cna.getField("descriptions"), "value"), lit(""))
        .as("description"),
      coalesce(try_element_at(cna.getField("metrics"), lit(1))
        .getField("cvssV3_1").getField("baseSeverity"), lit(""))
        .as("severity"),
      coalesce(try_element_at(cna.getField("metrics"), lit(1))
        .getField("cvssV3_1").getField("baseScore"), lit(0.0)).as("score"),
      coalesce(firstOrNull(
        try_element_at(cna.getField("problemTypes"), lit(1))
          .getField("descriptions"), "cweId"), lit("")).as("cwe_id")): _*)
  }

  /** P3 doc-template projection: the embedding text block
    * (`consumer/consumer.py:85-89`). Expects extractMeta output. */
  def docTemplate(df: DataFrame): DataFrame =
    df.withColumn("doc",
      format_string("Title: %s\nCVE ID: %s\nDescription: %s",
        col("title"), col("cve_id"), col("description")))

  /** P2 raw-persist projection: 3 scalars + the whole record as a JSON
    * string column (the Snowflake VARIANT insert, `processor.py:48-58`). */
  def rawPersist(df: DataFrame): DataFrame =
    df.select(
      col("cveMetadata.cveId").as("cve_id"),
      col("cveMetadata.dateUpdated").as("date_updated"),
      col("cveMetadata.datePublished").as("date_published"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*))
        .as("data_json"))
}
