package graft.sources

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Randomized wire-format laws for the TFRecord/TFExample codecs (pure
  * byte arithmetic — no Spark jobs, so case counts can be generous).
  * TfExampleSpec pins hand-computed known-answer bytes; these
  * properties assert the laws on ARBITRARY inputs, where the
  * adversarial shapes live: empty lists, empty byte values, extreme
  * int64s (every varint length 1..10), NaN/inf float bit patterns,
  * unicode keys, many-feature maps, and multi-record files with
  * pathological payload sizes.
  */
object TfExampleProps extends Properties("TfExample") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  private val anyLong: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(0L, 1L, -1L, 127L, 128L, -128L, Long.MaxValue, Long.MinValue))

  private val anyFloat: Gen[Float] = Gen.oneOf(
    Gen.choose(-1e30f, 1e30f),
    Gen.oneOf(0.0f, -0.0f, Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, Float.MinPositiveValue))

  private val anyBytes: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127)))
      .map(_.map(_.toByte).toArray)

  private val key: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(16)),
    Gen.oneOf("a/b", "ünïcode", "image/encoded", ""))

  private val feature: Gen[TfExample.Feature] = Gen.oneOf(
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, anyLong))
      .map(ls => TfExample.Feature(longs = ls)),
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, anyFloat))
      .map(fs => TfExample.Feature(floats = fs)),
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, anyBytes))
      .map(bs => TfExample.Feature(bytes = bs)))

  private val example: Gen[List[(String, TfExample.Feature)]] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(key, feature))).map(distinctKeys)

  // proto map semantics make the LAST duplicate win; keep keys unique so
  // round-trip equality is well-defined per entry
  private def distinctKeys(fs: List[(String, TfExample.Feature)]) =
    fs.groupBy(_._1).map(_._2.last).toList

  private def eq(a: TfExample.Feature, b: TfExample.Feature): Boolean =
    a.longs == b.longs &&
      a.floats.map(java.lang.Float.floatToIntBits) ==
        b.floats.map(java.lang.Float.floatToIntBits) &&
      a.bytes.length == b.bytes.length &&
      a.bytes.zip(b.bytes).forall { case (x, y) => x.sameElements(y) }

  // decode ∘ encode = identity for every feature map — int64 across all
  // ten varint lengths, float bit patterns incl. NaN/±inf/-0.0, byte
  // values incl. empty
  property("decode(encode(x)) == x") = forAll(example) { ex =>
    val back = TfExample.decode(TfExample.encode(ex))
    back.keySet == ex.map(_._1).toSet &&
      ex.forall { case (k, f) => eq(back(k), f) }
  }

  // the TFRecord framing is length-faithful and CRC-stable for any
  // payload, and a multi-record file parses back record-for-record
  property("TfRecords file round-trip over arbitrary payloads") =
    forAll(Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, anyBytes))) { recs =>
      val file = recs.map(TfRecords.encodeRecord)
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      val back = TfRecords.decodeAll(file)
      back.length == recs.length &&
        back.zip(recs).forall { case (a, b) => a.sameElements(b) }
    }

  // the gzip member layer is transparent: inflating a gzipped framed
  // file recovers the records byte-for-byte for any payloads (the
  // TfRecords .gz read path, exercised below the Spark layer)
  property("gzip member round-trip preserves framed records") =
    forAll(Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, anyBytes))) { recs =>
      val file = recs.map(TfRecords.encodeRecord)
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(file); gz.close()
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      val back = TfRecords.decodeAll(out.toByteArray)
      back.length == recs.length &&
        back.zip(recs).forall { case (a, b) => a.sameElements(b) }
    }

  // flipping ANY single bit of a framed file never yields a silent
  // wrong parse: strict decode throws, lenient decode flags
  property("single-bit corruption is never silent") =
    forAll(Gen.nonEmptyListOf(anyBytes), Gen.choose(0, Int.MaxValue),
      Gen.choose(0, 7)) { (recs, posSeed, bit) =>
      val file = recs.map(TfRecords.encodeRecord)
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      val pos = posSeed % file.length
      val bad = file.clone()
      bad(pos) = (bad(pos) ^ (1 << bit)).toByte
      val strictCaught =
        try { TfRecords.decodeAll(bad); false }
        catch { case _: IllegalArgumentException => true }
      val (kept, clean) = TfRecords.decodeLenient(bad)
      strictCaught && !clean && kept.length < recs.length
    }
}
