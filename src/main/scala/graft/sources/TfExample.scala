package graft.sources

/** `tf.train.Example` protobuf wire format, encoded and parsed directly
  * (no TensorFlow or protobuf dependency — the message family is five
  * tiny LEN-delimited messages, so the wire walk is ~100 lines):
  *
  * {{{
  * message Example   { Features features = 1; }
  * message Features  { map<string, Feature> feature = 1; }
  * message Feature   { oneof kind { BytesList bytes_list = 1;
  *                                  FloatList float_list = 2;
  *                                  Int64List int64_list = 3; } }
  * message BytesList { repeated bytes value = 1; }
  * message FloatList { repeated float value = 1 [packed = true]; }
  * message Int64List { repeated int64 value = 1 [packed = true]; }
  * }}}
  *
  * This is the payload the reference's input pipelines parse out of
  * TFRecord files (imagenet_input.py:42-48: `parse_single_example` with
  * FixedLenFeature defaults) — together with [[TfRecords]] it makes a
  * reference user's corpora load natively end-to-end. The parser
  * accepts BOTH packed and unpacked repeated encodings (the proto spec
  * requires readers to), skips unknown fields by wire type instead of
  * failing, and the typed getters carry FixedLenFeature's
  * absent-key-means-default semantics. Encoding is canonical (packed
  * numerics, map entries in input order) so byte output is
  * deterministic.
  *
  * Scale: pure per-record byte arithmetic — used inside a Dataset map
  * over [[TfRecords.read]]'s records, it stays embarrassingly parallel
  * with no driver involvement (the codec convention of
  * graft.multimodal.ImageCodec).
  */
object TfExample {

  /** One feature's values — exactly one of the three lists is populated
    * in a well-formed Feature; empty Feature (no kind) is legal.
    */
  final case class Feature(
      bytes: Seq[Array[Byte]] = Nil,
      floats: Seq[Float] = Nil,
      longs: Seq[Long] = Nil)

  // ---- varint + framing primitives -------------------------------------

  private def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  private def lenDelimited(out: java.io.ByteArrayOutputStream, tag: Int,
      payload: Array[Byte]): Unit = {
    out.write(tag)
    putVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  private final class Reader(val b: Array[Byte], var p: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(p < end, "tfexample: truncated varint")
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        (x & 0x80) != 0
      }) ()
      v
    }
    def slice(n: Int): Reader = {
      require(n >= 0 && p + n <= end, "tfexample: truncated length-delimited field")
      val r = new Reader(b, p, p + n); p += n; r
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && p + n <= end, "tfexample: truncated bytes")
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def i32le(): Int = {
      require(p + 4 <= end, "tfexample: truncated fixed32")
      val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      p += 4; v
    }
    def hasMore: Boolean = p < end
    /** Skip one field of the given wire type (unknown-field tolerance). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => require(p + 8 <= end, "tfexample: truncated fixed64"); p += 8
      case 2 => val n = varint().toInt; bytes(n); ()
      case 5 => i32le(); ()
      case w => throw new IllegalArgumentException(s"tfexample: wire type $w unsupported")
    }
  }

  // ---- encode -----------------------------------------------------------

  private def encodeFeature(f: Feature): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (f.bytes.nonEmpty) {
      val bl = new java.io.ByteArrayOutputStream()
      f.bytes.foreach(v => lenDelimited(bl, 0x0a, v)) // BytesList.value = 1, LEN
      lenDelimited(out, 0x0a, bl.toByteArray) // Feature.bytes_list = 1, LEN
    } else if (f.floats.nonEmpty) {
      val fl = new java.io.ByteArrayOutputStream()
      val packed = java.nio.ByteBuffer.allocate(4 * f.floats.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      f.floats.foreach(packed.putFloat)
      lenDelimited(fl, 0x0a, packed.array()) // FloatList.value = 1, packed LEN
      lenDelimited(out, 0x12, fl.toByteArray) // Feature.float_list = 2, LEN
    } else if (f.longs.nonEmpty) {
      val il = new java.io.ByteArrayOutputStream()
      val packed = new java.io.ByteArrayOutputStream()
      f.longs.foreach(putVarint(packed, _))
      lenDelimited(il, 0x0a, packed.toByteArray) // Int64List.value = 1, packed LEN
      lenDelimited(out, 0x1a, il.toByteArray) // Feature.int64_list = 3, LEN
    }
    // an all-empty Feature encodes as zero bytes (no kind set) — legal
    out.toByteArray
  }

  /** Canonical Example bytes for the given (key, feature) pairs, map
    * entries emitted in input order.
    */
  def encode(features: Seq[(String, Feature)]): Array[Byte] = {
    val fs = new java.io.ByteArrayOutputStream()
    features.foreach { case (k, f) =>
      val entry = new java.io.ByteArrayOutputStream()
      lenDelimited(entry, 0x0a, k.getBytes("UTF-8")) // entry.key = 1, LEN
      lenDelimited(entry, 0x12, encodeFeature(f)) // entry.value = 2, LEN
      lenDelimited(fs, 0x0a, entry.toByteArray) // Features.feature = 1, LEN
    }
    val out = new java.io.ByteArrayOutputStream()
    lenDelimited(out, 0x0a, fs.toByteArray) // Example.features = 1, LEN
    out.toByteArray
  }

  // ---- decode -----------------------------------------------------------

  private def decodeFeature(r: Reader): Feature = {
    var f = Feature()
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => // bytes_list
          val bl = r.slice(r.varint().toInt)
          val vs = Seq.newBuilder[Array[Byte]]
          while (bl.hasMore) {
            val t = bl.varint().toInt
            if ((t >> 3) == 1 && (t & 7) == 2) vs += bl.bytes(bl.varint().toInt)
            else bl.skip(t & 7)
          }
          // proto merge semantics: a REPEATED occurrence of the same
          // embedded-message oneof member concatenates its values (TF
          // writers may legally split a list across segments), while a
          // DIFFERENT member replaces the kind — setting a oneof clears
          // its siblings, which the fresh Feature(...) below encodes.
          f = Feature(bytes = f.bytes ++ vs.result())
        case (2, 2) => // float_list: packed (LEN) or unpacked (I32) values
          val fl = r.slice(r.varint().toInt)
          val vs = Seq.newBuilder[Float]
          while (fl.hasMore) {
            val t = fl.varint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) =>
                val packed = fl.slice(fl.varint().toInt)
                while (packed.hasMore)
                  vs += java.lang.Float.intBitsToFloat(packed.i32le())
              case (1, 5) => vs += java.lang.Float.intBitsToFloat(fl.i32le())
              case (_, w) => fl.skip(w)
            }
          }
          f = Feature(floats = f.floats ++ vs.result()) // merge, see above
        case (3, 2) => // int64_list: packed (LEN) or unpacked (VARINT)
          val il = r.slice(r.varint().toInt)
          val vs = Seq.newBuilder[Long]
          while (il.hasMore) {
            val t = il.varint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) =>
                val packed = il.slice(il.varint().toInt)
                while (packed.hasMore) vs += packed.varint()
              case (1, 0) => vs += il.varint()
              case (_, w) => il.skip(w)
            }
          }
          f = Feature(longs = f.longs ++ vs.result()) // merge, see above
        case (_, w) => r.skip(w)
      }
    }
    f
  }

  /** Parse Example bytes into its feature map. Later duplicate keys win
    * (proto map semantics); unknown fields anywhere are skipped.
    */
  def decode(bytes: Array[Byte]): Map[String, Feature] = {
    val out = Map.newBuilder[String, Feature]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      val tag = r.varint().toInt
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // Example.features
        val fs = r.slice(r.varint().toInt)
        while (fs.hasMore) {
          val ft = fs.varint().toInt
          if ((ft >> 3) == 1 && (ft & 7) == 2) { // Features.feature entry
            val e = fs.slice(fs.varint().toInt)
            var key = ""
            var value = Feature()
            while (e.hasMore) {
              val et = e.varint().toInt
              (et >> 3, et & 7) match {
                case (1, 2) => key = new String(e.bytes(e.varint().toInt), "UTF-8")
                case (2, 2) => value = decodeFeature(e.slice(e.varint().toInt))
                case (_, w) => e.skip(w)
              }
            }
            out += key -> value
          } else fs.skip(ft & 7)
        }
      } else r.skip(tag & 7)
    }
    out.result()
  }

  // ---- FixedLenFeature-style typed getters with defaults ----------------

  /** First int64 of `key`, or `default` when the key is absent or empty
    * — `parse_single_example`'s FixedLenFeature default semantics.
    */
  def int64(m: Map[String, Feature], key: String, default: Long): Long =
    m.get(key).flatMap(_.longs.headOption).getOrElse(default)

  /** First bytes value of `key` as UTF-8, or `default` when absent. */
  def stringUtf8(m: Map[String, Feature], key: String, default: String): String =
    m.get(key).flatMap(_.bytes.headOption)
      .map(new String(_, "UTF-8")).getOrElse(default)

  /** First float of `key`, or `default` when absent. */
  def float32(m: Map[String, Feature], key: String, default: Float): Float =
    m.get(key).flatMap(_.floats.headOption).getOrElse(default)

  /** All int64s of `key` — VarLenFeature / FixedLenSequenceFeature
    * (allow_missing=true) semantics: absent key parses as the empty
    * list, never an error.
    */
  def int64List(m: Map[String, Feature], key: String): Seq[Long] =
    m.get(key).map(_.longs).getOrElse(Nil)

  /** All floats of `key`; absent → empty (VarLenFeature semantics). */
  def floatList(m: Map[String, Feature], key: String): Seq[Float] =
    m.get(key).map(_.floats).getOrElse(Nil)

  /** All bytes values of `key` as UTF-8; absent → empty. */
  def stringList(m: Map[String, Feature], key: String): Seq[String] =
    m.get(key).map(_.bytes.map(new String(_, "UTF-8"))).getOrElse(Nil)
}
