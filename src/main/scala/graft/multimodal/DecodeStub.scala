package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal decode plumbing over opaque binary columns.
  *
  * The real image/audio codecs are NOT in this container, so `decodeBytes`
  * is a clearly-marked deterministic stub — but everything Spark-side is
  * real and tested (MultimodalSpec): the binary schema, the mapPartitions
  * batch shape (the Scala analogue of a pandas-batched UDF), partition
  * preservation, and the typed feature output.
  *
  * At 100 TB this is the layout that matters: decode runs partition-local
  * with zero shuffle, emits fixed-width feature vectors, and the payload
  * column is dropped as early as possible so only features flow downstream.
  */
object DecodeStub {

  final case class MediaFeatures(
      doc_id: Long,
      nbytes: Int,
      width: Int,     // stub: derived, stands in for decoded dims
      height: Int,
      features: Array[Float]) // stub: 8-dim content summary

  val featureDim = 8

  /** STUB decode: a real implementation would decode JPEG/PNG/audio frames
    * here (javax.imageio / ffmpeg). Deterministic fake: dimensions from
    * byte length, features = normalized byte histogram moments.
    */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    val feats = new Array[Float](featureDim)
    var i = 0
    while (i < n) {
      feats(i % featureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < featureDim) { feats(j) /= math.max(1, n / featureDim).toFloat; j += 1 }
    (w, h, feats)
  }

  /** Partition-local decode: (doc_id, payload) rows → typed features.
    * mapPartitions keeps the iterator streaming (no per-row task overhead,
    * no shuffle) — the Scala equivalent of mapInPandas batches.
    */
  def decode(spark: SparkSession, in: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    import spark.implicits._
    in.select(idCol, payloadCol).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, f) = decodeBytes(bytes)
        MediaFeatures(id, bytes.length, w, h, f)
      }
    }
  }

  /** documents → (doc_id, payload BINARY) fixture view. */
  def payloadView(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "cast(text as binary) as payload")
}
