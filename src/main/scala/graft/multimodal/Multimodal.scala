package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch functions — the Scala/Dataset equivalent of a Pandas-UDF
  * `mapInPandas` stage (same contract: schema in, schema out, work
  * amortized per batch/partition, never per-driver-row).
  *
  * The reference has no media handling; this is the north-star
  * training-data-pipeline capability. The DECODE step is a clearly
  * marked deterministic STUB (media codecs are not available in this
  * environment); everything Spark-side — schema, typed Dataset batch
  * shape, partition-parallel execution, frame sampling — is real.
  *
  * Scale notes (100 TB): payloads stay opaque binary end-to-end (no
  * driver collect, no string conversion); decode runs once per row
  * inside `mapPartitions`, so per-partition setup (codec init in a real
  * decoder) amortizes across the partition; frame sampling emits
  * bounded rows per media row (explode with a hard cap).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Extracted per-media features (the decode output schema). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long, // sum of unsigned bytes mod 2^31 (stub "content hash")
      mean_byte: Double,
      n_frames: Int)

  /** STUB decoder: a real pipeline would decode the payload with an
    * image/audio codec here (not available in this container). The stub
    * derives deterministic features from the raw bytes so the plumbing
    * is fully testable; the signature and batch shape are what a real
    * decoder would use. */
  private def decodeOne(r: MediaRecord, frameBytes: Int): MediaFeatures = {
    val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = bytes.length.toLong,
      checksum = sum % 2147483647L,
      mean_byte = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      n_frames = if (bytes.isEmpty) 0
        else ((bytes.length + frameBytes - 1) / frameBytes))
  }

  /** Decode/feature-extract stage: per-partition batch processing of
    * opaque payloads (mapPartitions = the mapInPandas batch contract). */
  def decodeFeatures(media: Dataset[MediaRecord],
      frameBytes: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup for a real codec would go here, once
      it.map(decodeOne(_, frameBytes))
    }
  }

  /** Frame sampling: emit every k-th frame's byte slice as its own row
    * (bounded by maxFrames), keyed back to the media row — the batch
    * shape of video frame extraction. */
  final case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 256,
      every: Int = 2, maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).take(maxFrames).map { f =>
          Frame(r.media_id, f,
            bytes.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
  }

  /** Resize stage STUB: the metadata gets the target dimensions and the
    * payload is proportionally truncated / zero-padded to the scaled
    * byte budget (a real implementation decodes, resamples, and
    * re-encodes here — same signature, same per-partition batch shape).
    * Zero-area or empty inputs pass through with their byte length
    * unchanged. A pathological metadata/payload combination whose
    * budget exceeds `maxBytes` CLAMPS to it (an explicit contract, not
    * a silent int overflow) rather than failing the stage for one bad
    * record — the W5 per-record-isolation principle; sane inputs never
    * reach the cap. */
  def resizeStub(media: Dataset[MediaRecord], targetW: Int,
      targetH: Int, maxBytes: Int = 64 << 20): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        val outLenL =
          if (r.width <= 0 || r.height <= 0 || bytes.isEmpty)
            bytes.length.toLong
          else math.ceil(bytes.length.toDouble * (targetW.toLong * targetH)
            / (r.width.toLong * r.height)).toLong
        val outLen = math.min(outLenL, maxBytes.toLong).toInt
        val out =
          if (outLen <= bytes.length) bytes.take(outLen)
          else bytes ++ Array.fill(outLen - bytes.length)(0.toByte)
        MediaRecord(r.media_id, r.kind, out, targetW, targetH)
      }
    }
  }

  /** Build a media table from the documents testdata: the text payload
    * becomes the opaque binary (deterministic; real pipelines read the
    * bytes from object storage). */
  def mediaFromDocuments(spark: SparkSession, dir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(split(col("source"), "src"), 2).cast("int").as("srcnum"),
        col("text"))
      .select(col("media_id"),
        when(col("srcnum") % 3 === 0, "image")
          .when(col("srcnum") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"))
      .as[MediaRecord]
  }
}
