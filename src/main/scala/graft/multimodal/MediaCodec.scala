package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media container encode/decode — no codec libraries.
  *
  * The formats are public and header-parseable without any
  * image/audio dependency:
  *  - BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER
  *    (little-endian; width at offset 18, height at 22, pixel-array
  *    offset at 10).
  *  - WAV: RIFF/WAVE with a 16-byte PCM `fmt ` chunk (channels at
  *    offset 22, sample rate at 24) and a `data` chunk.
  *  - GVF: this repo's own trivial video container (magic "GVF0" +
  *    LE u32 width/height/fps, then the frame body) — stands in for a
  *    real video demuxer, which genuinely needs a codec library.
  *
  * The ENCODERS are the asset-builder side (deterministic fixtures);
  * the DECODER is the engine side. They share nothing but this spec, so
  * a bug in either fails the m01 oracle instead of cancelling out.
  */
object MediaCodec {

  /** Parsed header facts. `bodyOffset` = first content byte. */
  case class MediaInfo(kind: String, width: Int, height: Int,
                       sampleRate: Int, channels: Int, fps: Int,
                       bodyOffset: Int)

  // ---- encoders (asset builder side) -----------------------------------

  /** 24bpp uncompressed BMP; `body` is the pixel array verbatim. */
  def encodeBmp(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(54 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + body.length)            // file size
    buf.putShort(0).putShort(0)             // reserved
    buf.putInt(54)                          // pixel-array offset
    buf.putInt(40)                          // BITMAPINFOHEADER size
    buf.putInt(width).putInt(height)
    buf.putShort(1)                         // color planes
    buf.putShort(24)                        // bits per pixel
    buf.putInt(0)                           // BI_RGB (uncompressed)
    buf.putInt(body.length)                 // image size
    buf.putInt(2835).putInt(2835)           // 72 dpi in px/metre
    buf.putInt(0).putInt(0)                 // palette: none
    buf.put(body)
    buf.array()
  }

  /** PCM16 WAV; `body` is the sample data verbatim. */
  def encodeWav(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII))
    buf.putInt(36 + body.length)            // RIFF chunk size
    buf.put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII))
    buf.putInt(16)                          // PCM fmt chunk size
    buf.putShort(1)                         // audio format: PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)   // byte rate
    buf.putShort((channels * 2).toShort)    // block align
    buf.putShort(16)                        // bits per sample
    buf.put("data".getBytes(US_ASCII))
    buf.putInt(body.length)
    buf.put(body)
    buf.array()
  }

  /** GVF toy video container; `body` is the concatenated frame bytes. */
  def encodeGvf(width: Int, height: Int, fps: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GVF0".getBytes(US_ASCII))
    buf.putInt(width).putInt(height).putInt(fps)
    buf.put(body)
    buf.array()
  }

  // ---- decoder (engine side) -------------------------------------------

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def magic(p: Array[Byte], off: Int, s: String): Boolean =
    p.length >= off + s.length &&
      s.getBytes(US_ASCII).zipWithIndex.forall { case (b, i) => p(off + i) == b }

  /** Parse the payload header by magic sniffing; None on anything
    * unrecognized (a malformed blob in a 100 TB corpus must yield a
    * classifiable row, never kill the executor). */
  def decodeHeader(p: Array[Byte]): Option[MediaInfo] =
    if (p.length >= 54 && magic(p, 0, "BM"))
      Some(MediaInfo("image", le32(p, 18), le32(p, 22), 0, 0, 0, le32(p, 10)))
    else if (p.length >= 44 && magic(p, 0, "RIFF") && magic(p, 8, "WAVE"))
      Some(MediaInfo("audio", 0, 0, le32(p, 24), le16(p, 22), 0, 44))
    else if (p.length >= 16 && magic(p, 0, "GVF0"))
      Some(MediaInfo("video", le32(p, 4), le32(p, 8), 0, 0, le32(p, 12), 16))
    else None
}
