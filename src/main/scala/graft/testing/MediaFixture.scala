package graft.testing

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Deterministic media-container fixtures: structurally valid PNG /
  * JPEG / GIF / WAV payloads (plus a deliberately corrupt variant)
  * whose header fields are a closed-form pure function of the row
  * index — the same contract as [[SasFixture]]: the engine generates
  * the bytes and parses them back through
  * `Multimodal.parseMediaHeader`, while the DuckDB oracle regenerates
  * the expected (format, width, height, sample_rate, channels,
  * bits_per_sample, duration_ms) tuple directly in SQL. Every writer
  * follows the public container spec (PNG chunks with real CRC32s,
  * JPEG marker segments, GIF logical screen descriptor, RIFF/WAVE
  * chunk list), so the parsers are exercised against honest files,
  * not against strings the parser happens to accept.
  */
object MediaFixture {

  /** Closed-form header fields for row i (mirrored by the oracle SQL):
    * variant = i % 5 -> png, jpeg, gif, wav, corrupt;
    * images: width = 16 + i % 241, height = 16 + i % 181;
    * wav (k = i / 5): sampleRate = 8000 + (k % 5) * 2000,
    * channels = 1 + k % 2, bytesPerSample = 1 + (k / 2) % 2,
    * dataBytes = 200 + i % 777,
    * duration_ms = dataBytes * 1000 / byteRate (integer floor).
    */
  def payload(i: Long): Array[Byte] = (i % 5) match {
    case 0 => png(width(i), height(i), i)
    case 1 => jpeg(width(i), height(i), i)
    case 2 => gif(width(i), height(i))
    case 3 =>
      val k = i / 5
      wav((8000 + (k % 5) * 2000).toInt, (1 + k % 2).toInt,
        (1 + (k / 2) % 2).toInt, (200 + i % 777).toInt, i)
    case _ => corrupt(i)
  }

  def width(i: Long): Int = (16 + i % 241).toInt
  def height(i: Long): Int = (16 + i % 181).toInt

  private def be32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def be16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Deterministic filler byte stream (varies the digest per row). */
  private def filler(i: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(j => ((i * 31 + j * 7 + 3) % 256).toByte)

  private def pngChunk(out: ByteArrayOutputStream, tag: String, data: Array[Byte]): Unit = {
    be32(out, data.length.toLong)
    val typeBytes = tag.getBytes("US-ASCII")
    out.write(typeBytes); out.write(data)
    val crc = new CRC32
    crc.update(typeBytes); crc.update(data)
    be32(out, crc.getValue)
  }

  private def png(w: Int, h: Int, i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new ByteArrayOutputStream
    be32(ihdr, w.toLong); be32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(6) // bit depth 8, color type RGBA
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, no interlace
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", filler(i, 1 + (i % 23).toInt))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def jpeg(w: Int, h: Int, i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0 / JFIF
    be16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // density units: none
    be16(out, 1); be16(out, 1) // x/y density
    out.write(0); out.write(0) // no thumbnail
    out.write(0xff); out.write(0xdb) // DQT (content irrelevant to the header walk)
    be16(out, 67); out.write(0); out.write(filler(i, 64))
    out.write(0xff); out.write(0xc0) // SOF0: baseline frame header
    be16(out, 17)
    out.write(8) // precision
    be16(out, h); be16(out, w)
    out.write(3) // YCbCr
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(0); out.write(0); out.write(0) // no GCT, bg color, aspect
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def wav(sampleRate: Int, channels: Int, bytesPerSample: Int,
                  dataBytes: Int, i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4L + (8 + 16) + (8 + dataBytes)) // WAVE tag + fmt + data chunks
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    le32(out, 16L)
    le16(out, 1) // PCM
    le16(out, channels)
    le32(out, sampleRate.toLong)
    le32(out, sampleRate.toLong * channels * bytesPerSample) // byte rate
    le16(out, channels * bytesPerSample) // block align
    le16(out, 8 * bytesPerSample)
    out.write("data".getBytes("US-ASCII"))
    le32(out, dataBytes.toLong)
    out.write(filler(i, dataBytes))
    if ((dataBytes & 1) == 1) out.write(0) // RIFF even-byte padding
    out.toByteArray
  }

  /** Garbage that matches no container magic (first byte forced to 0)
    * and is sometimes shorter than the 12-byte sniffing minimum —
    * the parser must classify it `unknown`, never throw.
    */
  private def corrupt(i: Long): Array[Byte] = {
    val b = filler(i, 8 + (i % 9).toInt)
    b(0) = 0
    b
  }
}
