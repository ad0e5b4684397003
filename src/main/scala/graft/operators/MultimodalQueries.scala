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
  )
}
