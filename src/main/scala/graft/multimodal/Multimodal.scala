package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract is real and tested: schema, partitioning,
  * batch shape, deterministic outputs. The codec itself is STUBBED
  * (no image/audio libraries in this container): `decodeStub` derives
  * deterministic fake dimensions/features from the bytes. Swapping in a
  * real decoder changes only the marked function body — the engine
  * plumbing (mapPartitions batching, schema, skew-neutral partitioning)
  * is the deliverable here.
  *
  * Scale notes: assets are large blobs — the asset table should be
  * stored with the binary column LAST (parquet page skipping on metadata
  * columns without touching blobs), filtered/pruned on metadata BEFORE
  * any decode, and decoded with mapPartitions so per-batch setup (codec
  * init) amortizes across rows, exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  /** Asset row: binary payload + typed metadata. */
  case class Asset(asset_id: Long, kind: String, meta_width: Int,
                   meta_height: Int, n_bytes: Long, payload: Array[Byte])

  /** Decoded feature row (stub decode). */
  case class AssetFeatures(asset_id: Long, kind: String, width: Int,
                           height: Int, checksum: Long, features: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("meta_width", IntegerType, nullable = false),
    StructField("meta_height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Derive a deterministic asset table from the documents fixture:
    * text bytes stand in for media payloads (round-robin kinds). */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (col("doc_id") % 640 + 64).cast("int").as("meta_width"),
        (col("doc_id") % 480 + 48).cast("int").as("meta_height"),
        // octet_length, not length: payload is UTF-8 bytes, and for
        // non-ASCII text the character count understates the byte count
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** ======== STUB: deterministic fake decode ========
    * A real implementation would decode the payload with an image/audio
    * codec here. This stub derives width/height/checksum/features purely
    * from the bytes so the pipeline is testable and deterministic. */
  private[multimodal] def decodeStub(a: Asset): AssetFeatures = {
    var h = 1125899906842597L // FNV-ish rolling hash over the payload
    var i = 0
    while (i < a.payload.length) { h = 31 * h + (a.payload(i) & 0xff); i += 1 }
    val dim = 8
    val feats = Array.tabulate(dim) { d =>
      // spread the checksum into a unit-ish feature vector
      (((h >>> (d * 8)) & 0xff).toFloat / 255.0f) - 0.5f
    }
    AssetFeatures(a.asset_id, a.kind, a.meta_width, a.meta_height, h, feats)
  }

  /** Batch decode/feature-extract: mapPartitions so codec setup is
    * per-partition, mirroring a Pandas-UDF batch boundary. */
  def extractFeatures(assets: Dataset[Asset])
                     (implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init would go here (stub: nothing)
      it.map(decodeStub)
    }
  }

  /** "Frame sampling" for video assets: emit every `stride`-th byte
    * window as a frame stub — exercises the one-to-many generator shape
    * (flatMap) a real frame sampler has. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.payload.grouped(stride).zipWithIndex.map { case (chunk, idx) =>
        (a.asset_id, idx, chunk.length,
          chunk.foldLeft(0L)((acc, b) => 31 * acc + (b & 0xff)))
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes", "frame_checksum")
  }
}
