package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The Example codec claims proto-wire interop, so its laws are pinned
  * against HAND-COMPUTED wire bytes (not just its own encode/decode
  * pair): canonical bytes known-answer, the unpacked alternate encoding
  * readers must accept, unknown-field tolerance, and the
  * FixedLenFeature default getters.
  */
class TfExampleSpec extends AnyFunSuite {

  test("canonical wire bytes known-answer: {'a': int64 [150]}") {
    // Int64List: packed field 1 → 0A 02 96 01 (varint 150 = 96 01)
    // Feature.int64_list = 3   → 1A 04 <that>
    // entry: key 'a' (0A 01 61), value = 2 (12 06 <feature>)
    // Features.feature = 1     → 0A 0B <entry>
    // Example.features = 1     → 0A 0D <features>
    val expected = Array(
      0x0a, 0x0d, 0x0a, 0x0b, 0x0a, 0x01, 0x61, 0x12, 0x06, 0x1a,
      0x04, 0x0a, 0x02, 0x96, 0x01).map(_.toByte)
    val got = TfExample.encode(Seq("a" -> TfExample.Feature(longs = Seq(150L))))
    assert(got.sameElements(expected))
    val back = TfExample.decode(expected)
    assert(back("a").longs == Seq(150L))
  }

  test("parser accepts the UNPACKED int64 alternate encoding") {
    // same Example, but Int64List carries value 150 as an unpacked
    // varint field (08 96 01) — the spec requires readers to accept both
    val unpacked = Array(
      0x0a, 0x0c, 0x0a, 0x0a, 0x0a, 0x01, 0x61, 0x12, 0x05, 0x1a,
      0x03, 0x08, 0x96, 0x01).map(_.toByte)
    assert(TfExample.decode(unpacked)("a").longs == Seq(150L))
  }

  test("round-trips all three kinds, multi-value, negative int64, utf8") {
    val ex = Seq(
      "ids" -> TfExample.Feature(longs = Seq(0L, -1L, Long.MaxValue, Long.MinValue)),
      "scores" -> TfExample.Feature(floats = Seq(1.5f, -0.0f, Float.MinPositiveValue)),
      "txt" -> TfExample.Feature(bytes = Seq("héllo — wörld".getBytes("UTF-8"),
        Array.emptyByteArray)),
      "empty" -> TfExample.Feature())
    val m = TfExample.decode(TfExample.encode(ex))
    assert(m("ids").longs == Seq(0L, -1L, Long.MaxValue, Long.MinValue))
    assert(m("scores").floats.map(java.lang.Float.floatToIntBits) ==
      Seq(1.5f, -0.0f, Float.MinPositiveValue).map(java.lang.Float.floatToIntBits))
    assert(new String(m("txt").bytes.head, "UTF-8") == "héllo — wörld")
    assert(m("txt").bytes(1).isEmpty)
    assert(m("empty") == TfExample.Feature())
  }

  test("unknown fields are skipped, not fatal") {
    // splice an unknown varint field (field 9, wire 0: tag 0x48) into
    // the Example top level ahead of the real features
    val real = TfExample.encode(Seq("a" -> TfExample.Feature(longs = Seq(7L))))
    val spliced = Array[Byte](0x48, 0x2a) ++ real
    assert(TfExample.decode(spliced)("a").longs == Seq(7L))
  }

  test("FixedLenFeature defaults: absent key yields the default") {
    val m = TfExample.decode(TfExample.encode(Seq(
      "present" -> TfExample.Feature(longs = Seq(5L)))))
    assert(TfExample.int64(m, "present", -1L) == 5L)
    assert(TfExample.int64(m, "absent", -1L) == -1L)
    assert(TfExample.stringUtf8(m, "absent", "und") == "und")
    assert(TfExample.float32(m, "absent", 2.5f) == 2.5f)
  }

  test("VarLenFeature lists: full multi-value lists, absent key parses empty") {
    val m = TfExample.decode(TfExample.encode(Seq(
      "ids" -> TfExample.Feature(longs = Seq(1L, 2L, 3L)),
      "ws" -> TfExample.Feature(floats = Seq(0.5f, 1.5f)),
      "toks" -> TfExample.Feature(bytes = Seq("a".getBytes("UTF-8"),
        "bc".getBytes("UTF-8"))))))
    assert(TfExample.int64List(m, "ids") == Seq(1L, 2L, 3L))
    assert(TfExample.floatList(m, "ws") == Seq(0.5f, 1.5f))
    assert(TfExample.stringList(m, "toks") == Seq("a", "bc"))
    // allow_missing semantics: absent is empty, never an error
    assert(TfExample.int64List(m, "absent").isEmpty)
    assert(TfExample.floatList(m, "absent").isEmpty)
    assert(TfExample.stringList(m, "absent").isEmpty)
  }

  test("proto merge: repeated same-kind list segments CONCATENATE, a " +
    "different oneof member replaces (ADVICE r12)") {
    // Writers may legally split one list across multiple occurrences of
    // the same embedded-message field; proto merge semantics concatenate
    // them — last-segment-wins silently loses data. Hand-rolled wire
    // bytes, since our own encoder never splits.
    def msg(tag: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128) // single-byte varint length
      Array(tag.toByte, payload.length.toByte) ++ payload
    }
    def f32(v: Float): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(v).array()
    def example(featureBytes: Array[Byte], key: String): Map[String, TfExample.Feature] = {
      val entry = msg(0x0a, key.getBytes("UTF-8")) ++ msg(0x12, featureBytes)
      TfExample.decode(msg(0x0a, msg(0x0a, entry)))
    }
    // float_list [1.0] ++ float_list [2.0, 3.0] → floats [1, 2, 3]
    val splitFloats =
      msg(0x12, msg(0x0a, f32(1f))) ++ msg(0x12, msg(0x0a, f32(2f) ++ f32(3f)))
    assert(example(splitFloats, "x")("x").floats == Seq(1f, 2f, 3f))
    // int64_list [5] ++ int64_list [7, 9] → longs [5, 7, 9]
    val splitLongs =
      msg(0x1a, msg(0x0a, Array(5.toByte))) ++
        msg(0x1a, msg(0x0a, Array(7.toByte, 9.toByte)))
    assert(example(splitLongs, "n")("n").longs == Seq(5L, 7L, 9L))
    // bytes_list ["ab"] ++ bytes_list ["cd"] → bytes ["ab", "cd"]
    val splitBytes =
      msg(0x0a, msg(0x0a, "ab".getBytes("UTF-8"))) ++
        msg(0x0a, msg(0x0a, "cd".getBytes("UTF-8")))
    assert(example(splitBytes, "b")("b").bytes
      .map(new String(_, "UTF-8")) == Seq("ab", "cd"))
    // oneof switch: bytes_list then float_list segments — setting a
    // different member clears its siblings, then same-kind still merges
    val switched = msg(0x0a, msg(0x0a, "dropped".getBytes("UTF-8"))) ++ splitFloats
    val sw = example(switched, "y")("y")
    assert(sw.bytes.isEmpty && sw.floats == Seq(1f, 2f, 3f))
  }
}
