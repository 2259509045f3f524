package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside. The test fixtures have no real media, so
  * the payload is the utf-8 encoding of `text` — the *plumbing* (binary
  * schema, metadata extraction, chunk/frame sampling, batch shape) is real
  * and oracle-checked; the codec itself is a deterministic stub (see
  * graft.multimodal.DecodeStub for the mapPartitions decode path).
  */
object MultimodalOps {

  val queries: Seq[Q] = Seq(

    // Metadata extraction over a binary payload column: byte size, content
    // digest prefix, and a fake modality tag derived from the size.
    Q(
      "mm01_binary_meta",
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS nbytes,
        |  substr(md5(text), 1, 8) AS sig,
        |  (['image','audio','video'])[1 + CAST(strlen(text) % 3 AS INT)] AS kind
        |FROM documents""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .selectExpr(
          "doc_id",
          "cast(length(payload) as bigint) as nbytes",
          "substr(md5(text), 1, 8) as sig",
          "element_at(array('image','audio','video'), 1 + cast(length(payload) % 3 as int)) as kind")
    },

    // Frame sampling: split the payload into 32-byte chunks, keep every
    // 2nd chunk, digest each — the shape of video frame-sample / audio
    // window extraction, minus the codec.
    Q(
      "mm02_chunk_sample",
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, ((strlen(text) - 1) // 32) + 1)) AS idx
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx,
        |  substr(md5(substr(text, CAST(idx * 32 + 1 AS INT), 32)), 1, 12) AS chunk_sig
        |FROM c WHERE idx % 2 = 0""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 100)
        .selectExpr(
          "doc_id", "text",
          "explode(sequence(0L, cast(floor((octet_length(text) - 1) / 32) as bigint))) as idx")
        .filter(col("idx") % 2 === 0)
        .selectExpr(
          "doc_id",
          "cast(idx as bigint) as idx",
          "substr(md5(substr(text, cast(idx * 32 + 1 as int), 32)), 1, 12) as chunk_sig")
    }
  )
}
