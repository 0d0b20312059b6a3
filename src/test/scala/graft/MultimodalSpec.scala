package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodec, Multimodal}

/** Multimodal plumbing: schema shape, real header encode/decode
  * round-trips, malformed-payload classification, one-to-many frame
  * sampling over the container body. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private implicit lazy val s2 = spark
  private lazy val assets = Multimodal.assetsFromDocuments(spark, sf())

  test("asset table has binary payload + typed metadata") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("kind").dataType.typeName == "string")
    val kinds = assets.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("BMP encode/decode round-trip at known byte offsets") {
    val body = Array.tabulate(10)(_.toByte)
    val bmp = MediaCodec.encodeBmp(123, 45, body)
    // spec offsets: magic at 0, pixel offset at 10, width 18, height 22
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert(bmp.length == 54 + 10)
    val mi = MediaCodec.decodeHeader(bmp).get
    assert(mi.kind == "image" && mi.width == 123 && mi.height == 45 &&
      mi.bodyOffset == 54)
  }

  test("WAV encode/decode round-trip parses rate and channels") {
    val wav = MediaCodec.encodeWav(11000, 2, Array[Byte](1, 2, 3, 4))
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val mi = MediaCodec.decodeHeader(wav).get
    assert(mi.kind == "audio" && mi.sampleRate == 11000 &&
      mi.channels == 2 && mi.bodyOffset == 44)
  }

  test("GVF encode/decode round-trip; malformed payloads classify unknown") {
    val mi = MediaCodec.decodeHeader(
      MediaCodec.encodeGvf(320, 200, 24, Array.emptyByteArray)).get
    assert(mi.kind == "video" && mi.width == 320 && mi.height == 200 &&
      mi.fps == 24 && mi.bodyOffset == 16)
    // garbage, truncated-BMP, and empty payloads must all parse to None
    assert(MediaCodec.decodeHeader("not a container".getBytes).isEmpty)
    assert(MediaCodec.decodeHeader(Array[Byte]('B', 'M', 0, 0)).isEmpty)
    assert(MediaCodec.decodeHeader(Array.emptyByteArray).isEmpty)
  }

  test("decode parses dims from payload bytes, not from asset metadata") {
    // hand-build an asset whose metadata CLAIM disagrees with the header:
    // the decode must report the header's truth
    val bmp = MediaCodec.encodeBmp(77, 33, "pixels".getBytes)
    val lying = Multimodal.Asset(1L, "image", 999, 888, bmp.length, bmp)
    val out = Multimodal.extractFeatures(Seq(lying).toDS()).head()
    assert(out.width == 77 && out.height == 33 && out.sample_rate == 0)
    // malformed payload → classified row, not an exception
    val bad = Multimodal.Asset(2L, "image", 1, 1, 3L, Array[Byte](1, 2, 3))
    val badOut = Multimodal.extractFeatures(Seq(bad).toDS()).head()
    assert(badOut.kind == "unknown" && badOut.width == -1)
  }

  test("decode is deterministic and preserves row count") {
    val f1 = Multimodal.extractFeatures(assets)
      .select($"asset_id", $"checksum").as[(Long, Long)].collect().toMap
    val f2 = Multimodal.extractFeatures(assets)
      .select($"asset_id", $"checksum").as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1.size == assets.count())
    // features are 8-dim and bounded
    val feats = Multimodal.extractFeatures(assets).head()
    assert(feats.features.length == 8)
    assert(feats.features.forall(f => f >= -0.5f && f <= 0.5f))
  }

  test("dHash: hand-computed bits on a tiny gradient image; dup texts collide") {
    // 9x8 image whose pixel bytes make row brightness strictly
    // increasing left-to-right: every horizontal gradient bit is 0
    // (bright(x) > bright(x+1) never holds) -> dhash == 0
    val w = 9; val h = 8
    val stride = ((w * 3 + 3) & ~3)
    val body = Array.tabulate(stride * h)(i => {
      val x = (i % stride) / 3
      (x * 10).toByte
    })
    val inc = Multimodal.Asset(0L, "image", w, h, 0L,
      MediaCodec.encodeBmp(w, h, body))
    // reversed: strictly decreasing -> all 64 bits set -> dhash == -1
    val dec = Multimodal.Asset(1L, "image", w, h, 0L,
      MediaCodec.encodeBmp(w, h, body.indices.map(i => {
        val x = (i % stride) / 3
        ((8 - x).max(0) * 10).toByte
      }).toArray))
    val ds = spark.createDataset(Seq(inc, dec))
    val out = Multimodal.imageDHash(ds).collect().map(r => r.asset_id -> r.dhash).toMap
    assert(out(0L) == 0L, s"increasing gradient: ${out(0L)}")
    assert(out(1L) == -1L, s"decreasing gradient: ${out(1L)}")
    // identical bodies + dims -> identical hash (the dedup property)
    val twin = Multimodal.Asset(2L, "image", w, h, 0L,
      MediaCodec.encodeBmp(w, h, body))
    val out2 = Multimodal.imageDHash(spark.createDataset(Seq(inc, twin)))
      .collect().map(_.dhash).toSet
    assert(out2.size == 1)
  }

  test("audio fingerprint: hand-built PCM16 with NEGATIVE samples") {
    // the parquet fixture's bodies are ASCII (high byte < 0x80), so the
    // sign path only runs here: per-window |energy| strictly decreasing
    // -> all 7 gradient bits set; reversed -> none
    def wav(vals: Seq[Int]) = MediaCodec.encodeWav(16000, 1,
      vals.flatMap(v => Seq.fill(2)(v)).flatMap(s =>
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray)
    val dec = Seq(500, -450, 400, -350, 300, -250, 200, -150)
    val a = Multimodal.Asset(0L, "audio", 0, 0, 0L, wav(dec))
    val b = Multimodal.Asset(1L, "audio", 0, 0, 0L, wav(dec.reverse))
    val out = Multimodal.audioFingerprint(spark.createDataset(Seq(a, b)))
      .collect().map(r => r.asset_id -> r).toMap
    assert(out(0L).n_samples == 16L && out(0L).sample_rate == 16000)
    assert(out(0L).afp == 127L, s"decreasing energies: ${out(0L).afp}")
    assert(out(1L).afp == 0L, s"increasing energies: ${out(1L).afp}")
  }

  test("video fingerprint: hand-built GVF with known frame energies") {
    // frame w's body = 64 copies of byte (8 - w) * 10 for 4 full frames
    // -> energies strictly decreasing -> bits 0..2 set of the first 3
    // comparisons; frames 4..7 are ABSENT (energy 0), so bit 3
    // (e3 > e4 = 0) is set and bits 4..6 (0 > 0) are not: vfp = 0b1111
    val body = (0 until 4).flatMap(w =>
      Seq.fill(64)(((8 - w) * 10).toByte)).toArray
    val gvf = MediaCodec.encodeGvf(320, 240, 24, body)
    val a = Multimodal.Asset(2L, "video", 320, 240, gvf.length, gvf)
    // a 70-byte body: frame 0 full, frame 1 truncated (6 bytes) — the
    // truncated tail still counts as a frame
    val short = MediaCodec.encodeGvf(64, 48, 24, Array.fill(70)(1.toByte))
    val b = Multimodal.Asset(5L, "video", 64, 48, short.length, short)
    val out = Multimodal
      .videoFingerprint(spark.createDataset(Seq(a, b)))
      .collect().map(r => r.asset_id -> r).toMap
    assert(out(2L).width == 320 && out(2L).height == 240)
    assert(out(2L).n_frames == 4L)
    assert(out(2L).vfp == 15L, s"vfp = ${out(2L).vfp}")
    assert(out(5L).n_frames == 2L)
    // frame0 energy 64 > frame1 energy 6 (bit0), and the truncated
    // frame1 still beats the absent frame2's 0 (bit1)
    assert(out(5L).vfp == 3L, s"vfp = ${out(5L).vfp}")
  }

  test("resize: real NN downscale with known pixels, truncation, pads") {
    // 4×2 source, full pixel array, row stride = (4*3+3)&~3 = 12 (no pad)
    val src = Array.tabulate(2, 12)((y, i) => (y * 100 + i).toByte)
    val bmp = MediaCodec.encodeBmp(4, 2, src.flatten.toArray)
    val asset = Multimodal.Asset(7L, "image", 4, 2, bmp.length, bmp)
    // maxDim=2 → g=4, out = (2, 1); src(x,0) = (x*4/2, 0*2/1) = (2x, 0)
    val r = Multimodal.resizeImages(Seq(asset).toDS(), maxDim = 2).head()
    assert(r.out_width == 2 && r.out_height == 1 && r.roundtrip_ok)
    val mi = MediaCodec.decodeHeader(r.payload).get
    assert(mi.width == 2 && mi.height == 1)
    // out stride = (2*3+3)&~3 = 8: pixels (0,0)->src(0,0), (1,0)->src(2,0)
    val body = r.payload.drop(mi.bodyOffset)
    assert(body.length == 8)
    assert(body.take(3).toSeq == src(0).take(3).toSeq)
    assert(body.slice(3, 6).toSeq == src(0).slice(6, 9).toSeq)
    assert(body(6) == 0 && body(7) == 0) // row pad bytes zeroed
    // truncated pixel array (the fixture shape): missing bytes read black
    val trunc = MediaCodec.encodeBmp(100, 100, Array[Byte](9, 8, 7))
    val tr = Multimodal.resizeImages(
      Seq(Multimodal.Asset(8L, "image", 100, 100, trunc.length, trunc)).toDS(),
      maxDim = 10).head()
    assert(tr.out_width == 10 && tr.out_height == 10 && tr.roundtrip_ok)
    val tb = tr.payload.drop(54)
    assert(tb(0) == 9 && tb(1) == 8 && tb(2) == 7 && tb.drop(3).forall(_ == 0))
    // non-images and malformed payloads are skipped, never thrown on
    val skip = Multimodal.resizeImages(Seq(
      Multimodal.Asset(9L, "audio", 0, 0, 4L,
        MediaCodec.encodeWav(8000, 1, Array[Byte](1, 2))),
      Multimodal.Asset(10L, "image", 1, 1, 3L, Array[Byte](1, 2, 3))).toDS())
    assert(skip.count() == 0)
  }

  test("audio stats: samples/duration from real bytes, dual-route amp") {
    // 11025 Hz stereo, 10 samples + 1 trailing odd byte (ignored)
    val body = Array.tabulate(21)(i => (i * 37 - 100).toByte)
    val wav = MediaCodec.encodeWav(11025, 2, body)
    val st = Multimodal.audioStats(
      Seq(Multimodal.Asset(3L, "audio", 0, 0, wav.length, wav)).toDS()).head()
    assert(st.sample_rate == 11025 && st.channels == 2)
    assert(st.n_samples == 5)                  // 21 bytes -> 10 i16 -> /2ch
    assert(st.duration_ms == 5 * 1000 / 11025) // = 0, truncating
    assert(st.amp_ok)
    // non-audio payloads are skipped by parsed magic, even if claimed
    val bmp = MediaCodec.encodeBmp(4, 4, Array[Byte](1))
    assert(Multimodal.audioStats(
      Seq(Multimodal.Asset(4L, "audio", 0, 0, bmp.length, bmp)).toDS())
      .count() == 0)
  }

  test("frame sampling explodes video assets only, over the body bytes") {
    val frames = Multimodal.sampleFrames(assets, stride = 64)
    val videoCount = assets.filter($"kind" === "video").count()
    assert(frames.select($"asset_id").distinct().count() == videoCount)
    // every video asset yields ceil(body/64) frames; body = n_bytes minus
    // the 16-byte GVF header
    val perAsset = frames.groupBy($"asset_id").agg(count(lit(1)).as("n"))
    val joined = assets.filter($"kind" === "video")
      .join(perAsset, "asset_id")
      .filter($"n" =!= ceil(($"n_bytes" - 16) / 64.0).cast("long"))
    assert(joined.count() == 0)
  }
}
