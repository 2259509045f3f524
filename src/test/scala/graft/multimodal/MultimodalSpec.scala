package graft.multimodal

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("binary payload decode plumbing: schema, counts, determinism") {
    val payloads = DecodeStub.payloadView(spark, sf)
    assert(payloads.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = DecodeStub.decode(spark, payloads).collect()
    assert(feats.length == payloads.count())
    assert(feats.forall(_.features.length == DecodeStub.featureDim))
    // deterministic stub: same input → same features across runs
    val again = DecodeStub.decode(spark, payloads).collect()
    val a = feats.sortBy(_.doc_id).map(_.features.toSeq)
    val b = again.sortBy(_.doc_id).map(_.features.toSeq)
    assert(a.sameElements(b))
    // nbytes matches the source text byte length
    val n0 = feats.minBy(_.doc_id)
    val t0 = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === n0.doc_id)
      .selectExpr("octet_length(text)").head().getInt(0)
    assert(n0.nbytes == t0)
  }

  test("PNG round-trip through the real codec is lossless (closed form)") {
    // decode(encode(img)) must reproduce every pixel of the generator
    // g(x,y) = (id*31 + 7x + 13y) % 256 — PNG is lossless.
    for (id <- Seq(0L, 1L, 17L, 63L)) {
      val img = ImageCodec.decodeImage(ImageCodec.syntheticPng(id))
      val (w, h) = (16 + (id % 5).toInt, 12 + (id % 7).toInt)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = ((id * 31 + 7L * x + 13L * y) % 256).toInt
        assert((img.getRGB(x, y) & 0xff) == expect, s"id=$id ($x,$y)")
      }
    }
  }

  test("nearest-neighbor resize samples the exact floor coordinates") {
    val img = ImageCodec.decodeImage(ImageCodec.syntheticPng(5L))
    val rs = ImageCodec.nearestResize(img, 4, 4)
    assert(rs.length == 16)
    val (w, h) = (img.getWidth, img.getHeight)
    for (j <- 0 until 4; i <- 0 until 4)
      assert(rs(j * 4 + i) == (img.getRGB(i * w / 4, j * h / 4) & 0xff))
  }

  test("distributed decode emits one feature row per payload") {
    val feats = ImageCodec.decodeFeatures(
      spark, ImageCodec.payloads(spark, sf, 32)).collect()
    assert(feats.length == 32)
    assert(feats.forall(f => f.px_sum > 0 && f.width >= 16 && f.height >= 12))
  }

  test("WAV round-trip through the real codec is lossless (closed form)") {
    // decode(encode(pcm)) must reproduce every 16-bit sample of the
    // generator s(id,i) = ((id*37 + 11i) % 65536) - 32768 — WAV is PCM.
    for (id <- Seq(0L, 1L, 17L, 63L)) {
      val f = AudioCodec.features(id, AudioCodec.syntheticWav(id))
      val n = AudioCodec.numSamples(id)
      assert(f.n_samples == n)
      val samples = (0 until n).map(i => AudioCodec.sampleAt(id, i).toLong)
      assert(f.peak == samples.max, s"id=$id")
      assert(f.sq_sum == samples.map(s => s * s).sum, s"id=$id")
    }
  }

  test("distributed WAV decode emits one feature row per payload") {
    val feats = AudioCodec.decodeFeatures(
      spark, AudioCodec.payloads(spark, sf, 32)).collect()
    assert(feats.length == 32)
    assert(feats.forall(f => f.n_samples >= 200 && f.sq_sum > 0))
  }

  test("banded Hamming chain == global-window chain, including sparse ids " +
    "and empty bands") {
    // mm07/mm11's fixture is dense doc_id 0..63, which never exercises
    // the boundary stitch's empty-band path (band 1 missing → band 2's
    // first row must reach back to band 0's last hash). Pin the banded
    // rewrite against the global-window original on a sparse id set.
    import org.apache.spark.sql.functions._
    import graft.operators.MultimodalOps
    val ids = Seq(1L, 2L, 15L, 40L, 41L, 42L, 95L, 200L) // bands 0,2,5,12
    val df = spark.createDataFrame(
      ids.map(i => (i, 10L + i, 20L + i, i * 1234567L, ~i * 987654L))
    ).toDF("doc_id", "width", "height", "ahash_lo", "ahash_hi")
    val banded = MultimodalOps.withBandCarry(df, "ahash_lo", "ahash_hi")
      .select(MultimodalOps.hammingChainCols("ahash_lo", "ahash_hi"): _*)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    val global = df.selectExpr("doc_id",
      "coalesce(cast(bit_count(ahash_lo ^ lag(ahash_lo) over (order by doc_id)) " +
        "+ bit_count(ahash_hi ^ lag(ahash_hi) over (order by doc_id)) as bigint), -1L) as ham_prev")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == global)
    assert(banded(1L) == -1L) // very first row still reports -1
  }

  test("mm14's crowd-gather + pad contract: every doc emits exactly 4 " +
    "slots, crowd instances drop and survivors re-pack densely, and an " +
    "all-crowd doc emits 4 padding rows") {
    // docs 0/15/30/45/60 have k=1 whose only instance is crowd
    // ((doc+0)%5==0 with doc%3==0) — the zero-survivor edge the
    // composed gate covers in aggregate but is worth pinning by name
    val rows = graft.SparkEntry.queries("mm14_rcnn_ingest")(spark, sf)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == 64 && byDoc.values.forall(_.length == 4))
    for (doc <- Seq(0L, 15L, 30L, 45L, 60L)) {
      val slots = byDoc(doc).sortBy(_.getLong(1))
      assert(slots.forall(_.getLong(3) == -1L),
        s"doc $doc must be all padding (its single instance is crowd)")
    }
    // real rows re-pack densely: slots 0..n_real-1 are real (label >= 0),
    // the rest are -1 padding, never interleaved
    for ((_, ds) <- byDoc) {
      val sorted = ds.sortBy(_.getLong(1)).map(_.getLong(3) >= 0)
      assert(sorted.sameElements(sorted.sorted(Ordering[Boolean].reverse)))
    }
    // mask pixels never exceed the box area, and the 8x8 NN resample of
    // a parity mask lands in [0, 64]
    for (r <- rows if r.getLong(3) >= 0) {
      assert(r.getLong(6) <= r.getLong(4) && r.getLong(6) >= 0)
      assert(r.getLong(7) >= 0 && r.getLong(7) <= 64)
    }
  }
}
