package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Real image decode over binary payload columns via javax.imageio — the
  * Spark-native analogue of the reference's JPEG decode/crop input path
  * (imagenet_input.py:50-120, simple_ssd/dataloader.py:249-446).
  *
  * The container ships no image fixtures, so the PNGs are GENERATED
  * deterministically (gray pixel g(x,y) = (id·31 + 7x + 13y) mod 256, size
  * keyed off the id) — but the decode side is the real codec: bytes →
  * ImageIO.read → BufferedImage → pixel access. PNG is lossless, so the
  * decoded statistics equal the closed form and the whole path is
  * oracle-checkable in SQL (no rows-only cop-out).
  *
  * Scale shape (100 TB): encode/decode run partition-local in
  * mapPartitions (streaming iterator, no shuffle, no driver hop); payload
  * bytes are dropped as soon as features are extracted so only fixed-width
  * rows flow downstream. A real corpus would swap `syntheticPng` for a
  * parquet binary column and keep everything else unchanged.
  */
object ImageCodec {

  /** Deterministic synthetic image: gray value (seed·31 + 7x + 13y) % 256,
    * width 16 + id%5, height 12 + id%7. `seed` defaults to the id;
    * passing a SHARED seed for several ids produces near-duplicate
    * images (same pattern, different dimensions → slightly different
    * 8×8 resamples), the fixture mm08's perceptual pairing needs.
    */
  def syntheticPng(id: Long, seed: Long = -1L): Array[Byte] = {
    val s = if (seed < 0) id else seed
    val w = 16 + (id % 5).toInt
    val h = 12 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((s * 31 + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL codec: PNG/JPEG/GIF bytes → BufferedImage (javax.imageio). */
  def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    img
  }

  /** Deterministic nearest-neighbor resample to tw×th: source pixel
    * (x'·w/tw, y'·h/th) with integer floor — bit-stable on every JVM
    * (Graphics2D interpolation is not).
    */
  def nearestResize(img: java.awt.image.BufferedImage, tw: Int, th: Int): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](tw * th)
    var j = 0
    while (j < th) {
      var i = 0
      while (i < tw) {
        out(j * tw + i) = img.getRGB(i * w / tw, j * h / th) & 0xff
        i += 1
      }
      j += 1
    }
    out
  }

  final case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      px_sum: Long,   // sum of the gray channel over all pixels
      nn4_sum: Long)  // sum of the 4×4 nearest-neighbor resample

  /** Decode + feature-extract one payload (real codec + NN resize). */
  def features(id: Long, bytes: Array[Byte]): ImageFeatures = {
    val img = decodeImage(bytes)
    val w = img.getWidth; val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s += (img.getRGB(x, y) & 0xff); x += 1 }
      y += 1
    }
    ImageFeatures(id, w.toLong, h.toLong, s, nearestResize(img, 4, 4).map(_.toLong).sum)
  }

  final case class AHashFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      ahash_lo: Long,  // aHash bits 0..31 (flat 8×8 index j*8+i)
      ahash_hi: Long)  // aHash bits 32..63

  /** Average-hash (aHash) of one payload: REAL decode → deterministic
    * 8×8 nearest-neighbor resample → bit k set iff pixel_k·64 > Σpixels
    * (strict integer compare — no float mean, so bit-stable on every
    * JVM and expressible in SQL). The 64 bits ship as two BIGINT words
    * so neither engine touches the sign bit. Near-duplicate images
    * differ in a few bits (Hamming ≤ ~10); the perceptual-dedup
    * primitive for image corpora.
    */
  def ahash(id: Long, bytes: Array[Byte]): AHashFeatures = {
    val img = decodeImage(bytes)
    val px = nearestResize(img, 8, 8)
    val sum = px.map(_.toLong).sum
    var lo = 0L; var hi = 0L
    var k = 0
    while (k < 64) {
      if (px(k).toLong * 64L > sum) {
        if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
      }
      k += 1
    }
    AHashFeatures(id, img.getWidth.toLong, img.getHeight.toLong, lo, hi)
  }

  /** Partition-local decode + aHash over (doc_id, payload) rows — same
    * streaming mapPartitions shape as `decodeFeatures`.
    */
  def ahashFeatures(spark: SparkSession, in: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[AHashFeatures] = {
    import spark.implicits._
    in.select(idCol, payloadCol).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => ahash(id, bytes) })
  }

  final case class DHashFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      dhash_lo: Long,  // dHash bits 0..31 (row j, comparison i: flat j*8+i)
      dhash_hi: Long)  // dHash bits 32..63

  /** Difference-hash (dHash) of one payload: REAL decode →
    * deterministic 9×8 nearest-neighbor resample → bit j·8+i set iff
    * pixel (i, j) > pixel (i+1, j) — the horizontal-gradient sign.
    * aHash's complement in a perceptual-dedup stack: comparing
    * NEIGHBORS instead of the global mean makes dHash invariant to
    * uniform brightness shifts that flip aHash bits wholesale. Strict
    * integer compares only; two BIGINT words, sign bit untouched.
    */
  def dhash(id: Long, bytes: Array[Byte]): DHashFeatures = {
    val img = decodeImage(bytes)
    val px = nearestResize(img, 9, 8)
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val k = j * 8 + i
        if (px(j * 9 + i) > px(j * 9 + i + 1)) {
          if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        }
        i += 1
      }
      j += 1
    }
    DHashFeatures(id, img.getWidth.toLong, img.getHeight.toLong, lo, hi)
  }

  /** Partition-local decode + dHash over (doc_id, payload) rows. */
  def dhashFeatures(spark: SparkSession, in: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[DHashFeatures] = {
    import spark.implicits._
    in.select(idCol, payloadCol).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => dhash(id, bytes) })
  }

  /** (doc_id, payload BINARY) view: synthetic PNGs for doc_id < n,
    * generated partition-local (the encode stage of the fixture).
    */
  def payloads(spark: SparkSession, sfDir: String, n: Long): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .filter(s"doc_id < $n")
      .select("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id))))
      .toDF("doc_id", "payload")
  }

  /** mm08's near-dup image fixture: ids in the same group of 5 whose
    * id % 5 ≤ 1 SHARE a pixel seed (group base), so (5k, 5k+1) are
    * near-duplicate images — same pattern rendered at different
    * dimensions; everything else keeps its own seed. The seed function
    * is closed-form, so the DuckDB oracle reproduces the same hashes.
    */
  def neardupSeed(id: Long): Long =
    if (id % 5 <= 1) (id / 5) * 5 else id

  def neardupPayloads(spark: SparkSession, sfDir: String, n: Long): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .filter(s"doc_id < $n")
      .select("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id, neardupSeed(id)))))
      .toDF("doc_id", "payload")
  }

  /** Partition-local decode: (doc_id, payload) → typed features via the
    * real javax.imageio codec. Streaming mapPartitions — no shuffle, no
    * per-row task overhead, payload dropped at this boundary.
    */
  def decodeFeatures(spark: SparkSession, in: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[ImageFeatures] = {
    import spark.implicits._
    in.select(idCol, payloadCol).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => features(id, bytes) })
  }
}
