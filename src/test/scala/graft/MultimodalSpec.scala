package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema shape, deterministic stub decode,
  * one-to-many frame sampling. */
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

  test("stub decode is deterministic and preserves row count") {
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

  test("frame sampling explodes video assets only") {
    val frames = Multimodal.sampleFrames(assets, stride = 64)
    val videoCount = assets.filter($"kind" === "video").count()
    assert(frames.select($"asset_id").distinct().count() == videoCount)
    // every video asset yields ceil(n_bytes/64) frames
    val perAsset = frames.groupBy($"asset_id").agg(count(lit(1)).as("n"))
    val joined = assets.filter($"kind" === "video")
      .join(perAsset, "asset_id")
      .filter($"n" =!= ceil($"n_bytes" / 64.0).cast("long"))
    assert(joined.count() == 0)
  }
}
