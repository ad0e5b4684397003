package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(rows: MediaRecord*) = spark.createDataset(rows)

  test("decodeFeatures derives deterministic byte features per row") {
    val payload = Array.tabulate(600)(i => (i % 251).toByte)
    val out = Multimodal.decodeFeatures(media(
      MediaRecord(1L, "image", payload, 640, 480),
      MediaRecord(2L, "audio", Array[Byte](10, 20, 30), 0, 0),
      MediaRecord(3L, "video", Array.emptyByteArray, 0, 0)))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 600L)
    assert(out(1L).n_frames == 3) // ceil(600/256)
    assert(out(2L).checksum == 60L)
    assert(out(2L).mean_byte == 20.0)
    assert(out(3L).n_bytes == 0L && out(3L).n_frames == 0)
    // deterministic: run twice, same features
    val again = Multimodal.decodeFeatures(media(
      MediaRecord(1L, "image", payload, 640, 480))).collect()(0)
    assert(again.checksum == out(1L).checksum)
  }

  test("sampleFrames emits every k-th bounded frame slice") {
    val payload = Array.tabulate(1024)(_.toByte) // 4 frames of 256
    val frames = Multimodal.sampleFrames(media(
      MediaRecord(7L, "video", payload, 0, 0)), frameBytes = 256,
      every = 2, maxFrames = 8).collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames(0).frame.length == 256)
    assert(frames(0).frame(0) == 0.toByte)
    assert(frames(1).frame(0) == 512.toByte) // slice starts at byte 512
  }

  test("media table from documents keeps payload opaque binary") {
    val ds = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val schema = ds.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    val one = ds.head()
    assert(one.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(one.kind))
  }

  test("approx_count_distinct stays within its error bound of exact") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 10000)
      .select((col("id") % 1000).as("k"))
    val approx = df.agg(approx_count_distinct(col("k"), 0.02)).head().getLong(0)
    assert(math.abs(approx - 1000L) <= 1000 * 0.05)
  }

  test("centroid aggregator matches hand-computed mean") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)), (1, Seq(5.0f, 5.0f)))
      .toDF("label", "embedding")
    val out = df.groupBy(col("label"))
      .agg(graft.functions.VectorAggregators.centroid(col("embedding"))
        .as("c"))
      .collect().map(r => r.getInt(0) ->
        r.getAs[collection.Seq[Double]]("c")).toMap
    assert(out(0) == Seq(2.0, 4.0))
    assert(out(1) == Seq(5.0, 5.0))
  }
}
