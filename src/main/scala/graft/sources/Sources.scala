package graft.sources

import graft.model.Cve
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema-pinned source readers (SURVEY.md §2.1): the engine's S-family
  * as a library surface. Every reader takes an explicit schema — at
  * 100 TB an inference pass is a full extra scan, and silent schema
  * drift between loads would fork downstream plans.
  */
object Sources {

  /** S3: distributed recursive JSON scan of a landing directory with
    * the pinned CVE schema (one JSON document per line or per file). */
  def cveJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Cve.cveSchema)
      .option("recursiveFileLookup", "true")
      .json(dir)

  /** Generic schema-pinned JSON reader with corrupt-record capture.
    * Gotcha: Spark refuses queries that reference ONLY the corrupt
    * column straight off the raw scan — cache or persist the parsed
    * frame before splitting good/corrupt. */
  def jsonWithDlq(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("recursiveFileLookup", "true")
      .json(dir)

  /** CSV with explicit schema and header control. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** S5: text-lines source (one string column `value` per line) — the
    * image_urls.txt shape. */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** ORC reader (schema from file metadata, like parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S4: pinned option map for the Kafka streaming source, mirroring
    * the reference consumer's subscription config
    * (`consumer/consumer.py:40-49`): earliest offsets so a fresh
    * consumer group replays the topic from the beginning, and no
    * silent data-loss skips. Exposed separately from [[kafkaCves]] so
    * the options are unit-testable without a broker. */
  def kafkaOptions(bootstrap: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false")

  /** S4: Kafka topic -> raw JSON string stream. `readStream.format
    * ("kafka")` resolves the connector (spark-sql-kafka) at load time;
    * this build environment has no connector jar and no broker, so the
    * path is compile-checked and option-tested but not
    * integration-run here — point it at a real cluster unchanged. */
  def kafkaRaw(spark: SparkSession, bootstrap: String,
      topic: String): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic))
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "timestamp")

  /** S4 end-to-end: Kafka topic parsed to CVE columns via
    * [[graft.streaming.Streams.parseCve]] — the streaming ingest entry
    * a reference user would swap their consumer for. */
  def kafkaCves(spark: SparkSession, bootstrap: String,
      topic: String): DataFrame =
    graft.streaming.Streams.parseCve(kafkaRaw(spark, bootstrap, topic))

  /** Columnar sink helpers: parquet/orc writers with zstd — the
    * layout-level default for 100 TB tables (better ratio than snappy
    * at comparable scan speed). */
  def writeParquetZstd(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)

  def writeOrcZstd(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)
}
