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
