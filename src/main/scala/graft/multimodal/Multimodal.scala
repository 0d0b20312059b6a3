package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The payloads are REAL containers (BMP / WAV / GVF — see
  * [[MediaCodec]]) and the decode stage parses their headers byte-for-
  * byte in pure JVM; only the pixel/sample CONTENT is synthetic (the
  * container bodies carry document text bytes — no image/audio codec
  * libraries exist in this environment to produce real media content).
  * Swapping in a full codec changes only [[MediaCodec]]; the engine
  * plumbing (mapPartitions batching, schema, skew-neutral partitioning)
  * and the header-parse path are the real deliverable.
  *
  * ======== ASSET CONTRACT (the oracle's independent derivation) ========
  * [[assetsFromDocuments]] builds one asset per document row:
  *  - kind:   doc_id % 3 → 0 = image (BMP), 1 = audio (WAV), 2 = video (GVF)
  *  - image:  width = doc_id % 640 + 64, height = doc_id % 480 + 48
  *  - audio:  sample_rate = 8000 + (doc_id % 8) * 1000,
  *            channels = 1 + doc_id % 2 (no visual dims: width = height = 0)
  *  - video:  width/height as image, fps = 24
  *  - body:   the document's UTF-8 text bytes
  * The m01 oracle predicts decode output FROM THIS TABLE, while the
  * engine parses it FROM THE PAYLOAD BYTES — encoder and decoder share
  * nothing but the public format spec, so an endianness/offset bug in
  * either side fails the gate instead of cancelling out. (This is the
  * documented exception to "never copy the Spark-side formula": the
  * oracle mirrors the generator CONTRACT above, not the decode path.)
  *
  * Scale notes: assets are large blobs — the asset table should be
  * stored with the binary column LAST (parquet page skipping on metadata
  * columns without touching blobs), filtered/pruned on metadata BEFORE
  * any decode, and decoded with mapPartitions so per-batch setup (codec
  * init) amortizes across rows, exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  /** Asset row: binary payload + typed metadata (the generator's CLAIM —
    * decode re-derives the truth from the bytes). */
  case class Asset(asset_id: Long, kind: String, meta_width: Int,
                   meta_height: Int, n_bytes: Long, payload: Array[Byte])

  /** Decoded feature row. width/height/sample_rate come from the parsed
    * header (-1s + kind "unknown" for unparseable payloads); checksum and
    * features are derived from the container BODY. */
  case class AssetFeatures(asset_id: Long, kind: String, width: Int,
                           height: Int, sample_rate: Int, checksum: Long,
                           features: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("meta_width", IntegerType, nullable = false),
    StructField("meta_height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Derive a deterministic asset table from the documents fixture per
    * the ASSET CONTRACT above: real BMP/WAV/GVF containers whose bodies
    * are the documents' text bytes. */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val body = Option(text).getOrElse("").getBytes(UTF_8)
        val w = (id % 640 + 64).toInt
        val h = (id % 480 + 48).toInt
        val (kind, payload) = (id % 3) match {
          case 0 => ("image", MediaCodec.encodeBmp(w, h, body))
          case 1 => ("audio", MediaCodec.encodeWav(
            (8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt, body))
          case _ => ("video", MediaCodec.encodeGvf(w, h, 24, body))
        }
        val (mw, mh) = if (kind == "audio") (0, 0) else (w, h)
        Asset(id, kind, mw, mh, payload.length.toLong, payload)
      }
  }

  /** Decode one asset: parse the container header (real byte-offset
    * parsing — [[MediaCodec.decodeHeader]]), then checksum/featurize the
    * body. Malformed payloads classify as "unknown" with -1 dims rather
    * than throwing: one corrupt blob must not kill a 100 TB scan. */
  private[multimodal] def decode(a: Asset): AssetFeatures = {
    val info = MediaCodec.decodeHeader(a.payload)
    val off = info.map(_.bodyOffset).getOrElse(0)
    var h = 1125899906842597L // FNV-ish rolling hash over the body
    var i = off
    while (i < a.payload.length) { h = 31 * h + (a.payload(i) & 0xff); i += 1 }
    val dim = 8
    val feats = Array.tabulate(dim) { d =>
      // spread the checksum into a unit-ish feature vector
      (((h >>> (d * 8)) & 0xff).toFloat / 255.0f) - 0.5f
    }
    info match {
      case Some(mi) =>
        AssetFeatures(a.asset_id, mi.kind, mi.width, mi.height,
          mi.sampleRate, h, feats)
      case None =>
        AssetFeatures(a.asset_id, "unknown", -1, -1, -1, h, feats)
    }
  }

  /** Batch decode/feature-extract: mapPartitions so codec setup is
    * per-partition, mirroring a Pandas-UDF batch boundary. */
  def extractFeatures(assets: Dataset[Asset])
                     (implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init would go here (header parse needs none)
      it.map(decode)
    }
  }

  /** Frame sampling for video assets: emit every `stride`-th byte window
    * of the container BODY as a frame — the one-to-many generator shape
    * (flatMap) a real frame sampler has. Videos are recognized by their
    * parsed magic, not the metadata claim. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "video" =>
          a.payload.drop(mi.bodyOffset).grouped(stride).zipWithIndex
            .map { case (chunk, idx) =>
              (a.asset_id, idx, chunk.length,
                chunk.foldLeft(0L)((acc, b) => 31 * acc + (b & 0xff)))
            }
        case _ => Iterator.empty
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes", "frame_checksum")
  }
}
