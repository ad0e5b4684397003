package graft.operators

import graft.GraftQuery
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Registry entries for the multimodal binary-column pipeline
  * ([[graft.multimodal.Multimodal]]). The decode stub's byte-derived
  * features (length, frame count) are DuckDB-expressible, so the
  * mapPartitions plumbing gets a real oracle check; content features
  * (checksum, mean byte) are asserted in MultimodalSpec. */
object MultimodalQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery("q60_multimodal_features",
      """SELECT doc_id AS media_id,
        |  CASE WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 0 THEN 'image'
        |       WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
        |    ELSE CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER)
        |  END AS INTEGER) AS n_frames
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("n_frames"))
        .orderBy("media_id")
    },

    // ---- frame sampling: every 2nd 256-byte frame, max 8 per media
    //      row. The mapPartitions stage emits binary slices; the oracle
    //      checks the sampled frame schedule and each slice's length. ----
    GraftQuery("q61_frame_sample",
      """WITH m AS (SELECT doc_id AS media_id,
        |    octet_length(encode(text)) AS n_bytes FROM documents),
        |f AS (SELECT media_id, n_bytes,
        |        unnest(range(0, CAST(ceil(n_bytes / 256.0) AS INTEGER), 2))
        |          AS frame_no
        |      FROM m WHERE n_bytes > 0)
        |SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
        |  CAST(least(256, n_bytes - frame_no * 256) AS BIGINT) AS frame_bytes
        |FROM (SELECT media_id, n_bytes, frame_no,
        |        ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY frame_no)
        |          AS rk FROM f) t
        |WHERE rk <= 8
        |ORDER BY media_id, frame_no""".stripMargin) { (s, d) =>
      import s.implicits._
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, d),
        frameBytes = 256, every = 2, maxFrames = 8)
        .select(col("media_id"), col("frame_no"),
          length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },

    // ---- resize stage: target dims replace the metadata, payload is
    //      proportionally re-budgeted (stub — a real impl re-encodes).
    //      The oracle recomputes the byte budget from the same width/
    //      height derivation, so the mapPartitions stage's output
    //      contract (dims + byte length) is fully checked. ----
    GraftQuery("q74_media_resize",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CASE WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 0 THEN 'image'
        |         WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n_bytes,
        |    length(text) % 640 AS w,
        |    length(text) % 480 AS h
        |  FROM documents)
        |SELECT media_id, kind,
        |  CAST(64 AS INTEGER) AS width, CAST(48 AS INTEGER) AS height,
        |  CAST(CASE WHEN w <= 0 OR h <= 0 OR n_bytes = 0 THEN n_bytes
        |    ELSE ceil(CAST(n_bytes AS DOUBLE) * 3072 / (w * h))
        |  END AS BIGINT) AS out_bytes
        |FROM m ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.resizeStub(Multimodal.mediaFromDocuments(s, d), 64, 48)
        .toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          length(col("payload")).cast("long").as("out_bytes"))
        .orderBy("media_id")
    },
  )
}
