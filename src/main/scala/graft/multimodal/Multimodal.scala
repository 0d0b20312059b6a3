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

  /** Perceptual image fingerprint row (see [[imageDHash]]). */
  case class ImageHash(asset_id: Long, width: Int, height: Int, dhash: Long)

  /** ======== DHASH CONTRACT ========
    * Difference-hash perceptual fingerprint (the standard image-dedup
    * primitive): nearest-neighbor sample the decoded pixels onto a 9×8
    * brightness grid using the RESIZE CONTRACT's src mapping with
    * out = (9, 8) —
    *   bright(gx, gy) = Σ_{c<3} body[(gy·h/8)·stride + (gx·w/9)·3 + c]
    * (integer division, bytes past the body read 0) — then one bit per
    * horizontal gradient: bit(gy·8+gx) = bright(gx,gy) > bright(gx+1,gy),
    * packed into a signed int64. Pure integer arithmetic end to end, so
    * the m05 oracle recomputes the hash INDEPENDENTLY from the asset
    * contract (text bytes as the pixel array) and hash-matches exactly.
    * On this fixture the bodies are text bytes, so hashes cluster
    * tightly (brightness ≈ mean ASCII everywhere) — the discrimination
    * is a property of real images, not of the hash; exact-equal dhash
    * still finds exactly the duplicate-body images. Runs in the same
    * mapPartitions decode boundary as every other m-op. */
  def imageDHash(assets: Dataset[Asset])
                (implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "image" =>
          val stride = rowStride(mi.width)
          def bright(gx: Int, gy: Int): Int = {
            val sx = gx * mi.width / 9
            val sy = gy * mi.height / 8
            var s = 0; var c = 0
            while (c < 3) {
              s += pixelByte(a.payload, mi.bodyOffset, stride, sx, sy, c) & 0xff
              c += 1
            }
            s
          }
          var hash = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              if (bright(gx, gy) > bright(gx + 1, gy))
                hash |= 1L << (gy * 8 + gx)
              gx += 1
            }
            gy += 1
          }
          Some(ImageHash(a.asset_id, mi.width, mi.height, hash))
        case _ => None
      }
    }
  }

  /** Audio fingerprint row (see [[audioFingerprint]]). */
  case class AudioFingerprint(asset_id: Long, sample_rate: Int,
                              n_samples: Long, afp: Long)

  /** ======== AUDIO FINGERPRINT CONTRACT ========
    * Energy-profile fingerprint over the parsed PCM16 stream (the
    * chromaprint-lite shape: coarse energy envelope → gradient bits,
    * no FFT needed for dedup-grade matching):
    *   sample(i) = signed LE int16 at body[2i, 2i+1], n = ⌊body/2⌋
    *   window(i) = i·8 div n   (8 windows, integer division)
    *   energy(w) = Σ |sample(i)| over window w  (0 when empty)
    *   bit(w)    = energy(w) > energy(w+1), w < 7 → 7-bit `afp`
    * Channels are deliberately NOT de-interleaved — for a fingerprint
    * the mixed envelope is the point (and it keeps the contract one
    * formula). Pure integer arithmetic: the m06 oracle recomputes every
    * fingerprint from the asset contract (text bytes as PCM16) and
    * hash-matches exactly. */
  def audioFingerprint(assets: Dataset[Asset])
                      (implicit spark: SparkSession): Dataset[AudioFingerprint] = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "audio" =>
          val off = mi.bodyOffset
          val n = (a.payload.length - off) / 2
          val energy = Array.fill(8)(0L)
          var i = 0
          while (i < n) {
            val lo = a.payload(off + 2 * i) & 0xff
            val hi = a.payload(off + 2 * i + 1).toInt // sign-carrying byte
            val s = (hi << 8) | lo
            energy((i.toLong * 8 / n).toInt) += math.abs(s)
            i += 1
          }
          var afp = 0L
          var w = 0
          while (w < 7) {
            if (energy(w) > energy(w + 1)) afp |= 1L << w
            w += 1
          }
          Some(AudioFingerprint(a.asset_id, mi.sampleRate, n.toLong, afp))
        case _ => None
      }
    }
  }

  /** Video fingerprint row ([[videoFingerprint]]). */
  case class VideoFingerprint(asset_id: Long, width: Int, height: Int,
                              n_frames: Long, vfp: Long)

  /** ======== VIDEO FINGERPRINT CONTRACT ========
    * Video perceptual fingerprint + exact-dup key — the m05/m06 dedup
    * primitive lifted to the VIDEO modality, completing the
    * image/audio/video triad: per-FRAME byte energy over the first 8
    * sampled frames ([[sampleFrames]]' 64-byte windows), then 7
    * energy-gradient bits (bit w set iff e_w > e_{w+1}) — m06's
    * chromaprint-lite discipline at frame granularity. Frames absent
    * past the body contribute energy 0; n_frames = ceil(bodyLen/64).
    * Integer-only, so the oracle recomputes every fingerprint from the
    * asset contract's text-as-frame-bytes derivation while this decode
    * path reads the real GVF container (width/height from the parsed
    * header, never the metadata claim). */
  def videoFingerprint(assets: Dataset[Asset])
                      (implicit spark: SparkSession): Dataset[VideoFingerprint] = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "video" =>
          val off = mi.bodyOffset
          val bodyLen = a.payload.length - off
          val nFrames = (bodyLen + 63) / 64
          val energy = Array.fill(8)(0L)
          var i = 0
          while (i < bodyLen && i < 512) {
            energy(i / 64) += a.payload(off + i) & 0xff
            i += 1
          }
          var vfp = 0L
          var w = 0
          while (w < 7) {
            if (energy(w) > energy(w + 1)) vfp |= 1L << w
            w += 1
          }
          Some(VideoFingerprint(a.asset_id, mi.width, mi.height,
            nFrames.toLong, vfp))
        case _ => None
      }
    }
  }

  /** Resized-image row. `payload` is a real re-encoded BMP;
    * `roundtrip_ok` is the contract check (see [[resizeImages]]). */
  case class ResizedImage(asset_id: Long, in_width: Int, in_height: Int,
                          out_width: Int, out_height: Int, out_bytes: Long,
                          roundtrip_ok: Boolean, payload: Array[Byte])

  /** BMP rows are padded to 4-byte boundaries (public format spec).
    * Long: a claimed width near 2^31 overflows the Int form. */
  private def rowStride(width: Int): Long = (width.toLong * 3 + 3) & ~3L

  /** Read one channel byte of pixel (sx, sy) from a BMP payload in
    * storage order; bytes past the end of a TRUNCATED pixel array read
    * as 0 (black) — the lenient-decoder behavior a crawled corpus
    * needs, since a malformed blob must yield a classifiable row. */
  private def pixelByte(p: Array[Byte], bodyOff: Int, stride: Long,
                        sx: Int, sy: Int, c: Int): Byte = {
    // Long offset: sy * stride wraps Int for claimed-huge dims, and a
    // wrapped offset could land IN range and silently read wrong bytes
    val off = bodyOff + sy * stride + sx * 3L + c
    if (off >= 0 && off < p.length) p(off.toInt) else 0
  }

  /** ======== RESIZE CONTRACT ========
    * Nearest-neighbor downscale to fit in `maxDim` × `maxDim`, aspect
    * preserved, integer arithmetic only:
    *   g     = max(in_w, in_h)
    *   out_w = max(1, in_w * maxDim / g)   (integer division; no-op
    *   out_h = max(1, in_h * maxDim / g)    when g <= maxDim)
    *   src(x, y) = (x * in_w / out_w, y * in_h / out_h)
    * The output is a REAL 24bpp BMP (4-byte-padded rows, zeroed pad).
    *
    * `roundtrip_ok` verifies the output INDEPENDENTLY of the resize
    * loop: [[MediaCodec.decodeHeader]] must re-parse the emitted bytes
    * to (image, out_w, out_h) with the exact expected byte length, and
    * every output pixel is compared against a fresh read of the SOURCE
    * payload at the contract's src(x, y) — a wrong stride, flipped
    * coordinate, or off-by-one in the writer fails the gate. The m03
    * oracle re-derives out_w/out_h/out_bytes in SQL from this contract
    * and pins roundtrip_ok = true. */
  def resizeImages(assets: Dataset[Asset], maxDim: Int = 64)
                  (implicit spark: SparkSession): Dataset[ResizedImage] = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "image" && mi.width > 0 && mi.height > 0 =>
          val (w, h) = (mi.width, mi.height)
          val g = math.max(w, h)
          // Long arithmetic: a crawled blob can CLAIM w near 2^31 and
          // w * maxDim / x * w must not overflow (output stays <= maxDim
          // either way, so allocations are bounded by contract)
          val ow = if (g <= maxDim) w
                   else math.max(1L, w.toLong * maxDim / g).toInt
          val oh = if (g <= maxDim) h
                   else math.max(1L, h.toLong * maxDim / g).toInt
          val strideIn = rowStride(w)
          // output dims are <= max(maxDim, source-if-smaller), so the
          // output stride/allocation is small Int by construction
          val strideOut = rowStride(ow).toInt
          val body = new Array[Byte](strideOut * oh)
          var y = 0
          while (y < oh) {
            val sy = (y.toLong * h / oh).toInt
            var x = 0
            while (x < ow) {
              val sx = (x.toLong * w / ow).toInt
              var c = 0
              while (c < 3) {
                body(y * strideOut + x * 3 + c) =
                  pixelByte(a.payload, mi.bodyOffset, strideIn, sx, sy, c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val out = MediaCodec.encodeBmp(ow, oh, body)
          // contract check, arithmetic-inverted from the writer: walk the
          // OUTPUT bytes linearly and derive (x, y, channel) from each
          // offset by division/modulo (the writer multiplies), expecting
          // pad bytes zero and pixel bytes equal to a fresh source read —
          // a wrong stride, swapped coordinate, or pad overrun fails here
          // even though the writer "agreed with itself".
          val ok = MediaCodec.decodeHeader(out) match {
            case Some(ri) if ri.kind == "image" && ri.width == ow &&
                ri.height == oh && out.length == 54 + strideOut * oh =>
              var good = ri.bodyOffset == 54
              var off = 0
              while (good && off < strideOut * oh) {
                val yy = off / strideOut
                val r = off % strideOut
                val expect =
                  if (r >= ow * 3) 0: Byte // row pad
                  else pixelByte(a.payload, mi.bodyOffset, strideIn,
                    ((r / 3).toLong * w / ow).toInt,
                    (yy.toLong * h / oh).toInt, r % 3)
                good = out(ri.bodyOffset + off) == expect
                off += 1
              }
              good
            case _ => false
          }
          Iterator.single(ResizedImage(a.asset_id, w, h, ow, oh,
            out.length.toLong, ok, out))
        case _ => Iterator.empty
      }
    }
  }

  /** Audio stats row. All fields but `amp_ok` are header facts +
    * integer arithmetic (SQL-derivable); `amp_ok` asserts the PCM
    * sample parse. */
  case class AudioStats(asset_id: Long, sample_rate: Long, channels: Long,
                        n_samples: Long, duration_ms: Long, amp_ok: Boolean)

  /** Audio feature extraction over real WAV payloads: per-channel
    * sample count and duration from the parsed header + data-chunk
    * length (exact integer arithmetic — truncating division, mirrored
    * by the m04 oracle), plus a PCM16 parse check: the summed |sample|
    * is computed twice through genuinely different byte routes — a
    * hand-rolled little-endian loop vs the JVM's ByteBuffer/ShortBuffer
    * view — and `amp_ok` pins their agreement (an endianness or stride
    * bug in either route fails the gate; a trailing odd byte is ignored
    * by both, as a PCM16 reader must). Audio rows are recognized by
    * their parsed RIFF magic, never the metadata claim. */
  def audioStats(assets: Dataset[Asset])
                (implicit spark: SparkSession): Dataset[AudioStats] = {
    import spark.implicits._
    assets.flatMap { a =>
      MediaCodec.decodeHeader(a.payload) match {
        case Some(mi) if mi.kind == "audio" && mi.channels > 0 &&
            mi.sampleRate > 0 =>
          val bodyLen = math.max(0, a.payload.length - mi.bodyOffset)
          val nSamples = bodyLen / (2L * mi.channels)
          val durationMs = nSamples * 1000L / mi.sampleRate
          // route 1: hand-rolled LE i16 walk
          var sum1 = 0L
          var i = mi.bodyOffset
          while (i + 1 < a.payload.length) {
            val s = ((a.payload(i) & 0xff) | (a.payload(i + 1) << 8)).toShort
            sum1 += math.abs(s.toLong); i += 2
          }
          // route 2: the JVM's buffer view does the endianness
          val sb = java.nio.ByteBuffer
            .wrap(a.payload, mi.bodyOffset, bodyLen & ~1)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
          var sum2 = 0L
          while (sb.hasRemaining) sum2 += math.abs(sb.get().toLong)
          Iterator.single(AudioStats(a.asset_id, mi.sampleRate.toLong,
            mi.channels.toLong, nSamples, durationMs, sum1 == sum2))
        case _ => Iterator.empty
      }
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
