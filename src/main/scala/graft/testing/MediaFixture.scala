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

  // ---- decodable WAV fixtures (real PCM at every width) -----------

  /** Closed-form signed sample k of WAV fixture i at `bytesPerSample`
    * width: sweeps the full two's-complement range of the width.
    */
  def wavSampleValue(i: Long, k: Int, bytesPerSample: Int): Int = {
    val amp = 1L << (8 * bytesPerSample - 1)
    (((k * 2654435761L + i * 40503 + 7) % (2 * amp) + 2 * amp) % (2 * amp) - amp).toInt
  }

  /** A decodable PCM WAV: closed-form samples at 1/2/3/4 bytes per
    * sample, written either as plain PCM (format tag 1) or as
    * WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE + the PCM subformat GUID).
    * 8-bit stores unsigned (value + 128); wider widths store signed
    * little-endian two's complement.
    */
  def wavPcmPayload(i: Long, bytesPerSample: Int, nSamples: Int,
                    extensible: Boolean = false): Array[Byte] = {
    val fmtSize = if (extensible) 40 else 16
    val dataBytes = nSamples * bytesPerSample
    val out = new ByteArrayOutputStream
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4L + (8 + fmtSize) + (8 + dataBytes))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    le32(out, fmtSize.toLong)
    le16(out, if (extensible) 0xfffe else 1)
    le16(out, 1) // channels
    le32(out, 16000L)
    le32(out, 16000L * bytesPerSample)
    le16(out, bytesPerSample)
    le16(out, 8 * bytesPerSample)
    if (extensible) {
      le16(out, 22) // cbSize
      le16(out, 8 * bytesPerSample) // valid bits
      le32(out, 4L) // channel mask
      // KSDATAFORMAT_SUBTYPE_PCM GUID, on-disk serialization
      out.write(Array(0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
        0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).map(_.toByte))
    }
    out.write("data".getBytes("US-ASCII"))
    le32(out, dataBytes.toLong)
    var k = 0
    while (k < nSamples) {
      val v = wavSampleValue(i, k, bytesPerSample)
      bytesPerSample match {
        case 1 => out.write((v + 128) & 0xff)
        case 2 => le16(out, v & 0xffff)
        case 3 => out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
        case _ => le32(out, v.toLong & 0xffffffffL)
      }
      k += 1
    }
    if ((dataBytes & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ---- decodable PNG fixtures (real zlib pixel data) --------------

  /** Closed-form pixel value (mirrored by the q_image_features
    * oracle): channel c of pixel (x, y) in image i.
    */
  def pixelByte(i: Long, x: Int, y: Int, c: Int): Int =
    ((x * 7 + y * 13 + c * 29 + i * 31) % 256).toInt

  /** A fully decodable RGBA PNG: small closed-form dims
    * (w = 4 + i%13, h = 3 + i%11), real zlib-deflated scanlines, and
    * scanlines cycling through all five PNG filter types
    * (None/Sub/Up/Average/Paeth) in the oracle-gated decode path.
    * Every i % 4 == 2 image is ADAM7 INTERLACED — same closed-form
    * pixels, seven pass-local sub-images in the IDAT stream — so the
    * oracle also gates the interlaced reconstruction. The IDAT
    * stream is split across two chunks to exercise multi-IDAT
    * concatenation.
    */
  def imagePayload(i: Long): Array[Byte] =
    pngWithPixels(4 + (i % 13).toInt, 3 + (i % 11).toInt, i, interlaced = i % 4 == 2)

  private def pngWithPixels(w: Int, h: Int, i: Long, interlaced: Boolean = false): Array[Byte] = {
    val bpp = 4
    val stride = w * bpp
    val px = Array.tabulate(h * stride) { k =>
      val y = k / stride; val rem = k % stride
      pixelByte(i, rem / bpp, y, rem % bpp).toByte
    }
    // serialize as one full-grid pass, or the seven Adam7 passes
    // (each an independent sub-image: pass-local scanline filtering,
    // empty passes contribute nothing)
    val passes =
      if (interlaced)
        Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      else Seq((0, 0, 1, 1))
    val rawOut = new ByteArrayOutputStream
    var rowCounter = 0 // filter type cycles across ALL emitted rows
    for ((x0, y0, dx, dy) <- passes) {
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val pStride = wp * bpp
        val sub = new Array[Byte](hp * pStride)
        for (j <- 0 until hp; sx <- 0 until wp; c <- 0 until bpp)
          sub(j * pStride + sx * bpp + c) = px((y0 + j * dy) * stride + (x0 + sx * dx) * bpp + c)
        // apply the PNG scanline filters (the decoder must invert these)
        var j = 0
        while (j < hp) {
          val f = ((rowCounter + i) % 5).toInt
          rowCounter += 1
          rawOut.write(f)
          var x = 0
          while (x < pStride) {
            val cur = sub(j * pStride + x) & 0xff
            val left = if (x >= bpp) sub(j * pStride + x - bpp) & 0xff else 0
            val up = if (j > 0) sub((j - 1) * pStride + x) & 0xff else 0
            val ul = if (j > 0 && x >= bpp) sub((j - 1) * pStride + x - bpp) & 0xff else 0
            val enc = f match {
              case 0 => cur
              case 1 => cur - left
              case 2 => cur - up
              case 3 => cur - (left + up) / 2
              case _ =>
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
                cur - pred
            }
            rawOut.write(enc & 0xff)
            x += 1
          }
          j += 1
        }
      }
    }
    val raw = rawOut.toByteArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new ByteArrayOutputStream
    val buf = new Array[Byte](4096)
    while (!defl.finished()) { val n = defl.deflate(buf); zOut.write(buf, 0, n) }
    defl.end()
    val z = zOut.toByteArray
    val out = new ByteArrayOutputStream
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new ByteArrayOutputStream
    be32(ihdr, w.toLong); be32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(6) // 8-bit RGBA
    ihdr.write(0); ihdr.write(0) // deflate, adaptive
    ihdr.write(if (interlaced) 1 else 0)
    pngChunk(out, "IHDR", ihdr.toByteArray)
    val split = z.length / 2
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, split))
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, split, z.length))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- decodable GIF fixtures (real LZW code stream) --------------

  /** Closed-form palette index of pixel (x, y) in GIF fixture i, and
    * the closed-form 256-entry palette (mirrored by the
    * q_gif_features oracle): palette[p] = (p, (2p+1)%256, 255-p).
    */
  def gifPixelIndex(i: Long, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + i * 31) % 256).toInt

  /** A decodable GIF89a: closed-form dims, 256-color global palette,
    * and a REAL variable-width LZW code stream — literal codes with a
    * periodic Clear so the code width stays at 9 bits (the classic
    * "uncompressed GIF" writer; the decoder still exercises its full
    * dictionary/width machinery on it). Includes a Graphic Control
    * Extension so the decoder's extension-skipping path is gated too.
    * Every i % 3 == 1 image is INTERLACED — same closed-form pixels,
    * rows serialized in the 4-pass order with the descriptor flag set
    * — so the oracle also gates the row de-permutation.
    */
  def gifPayload(i: Long): Array[Byte] =
    gifWithPixels(4 + (i % 13).toInt, 3 + (i % 11).toInt, i, interlaced = i % 3 == 1)

  /** Size-explicit variant (specs use it to exceed the 250-literal
    * periodic-Clear threshold, which the small oracle fixtures stay
    * under).
    */
  def gifPayloadSized(w: Int, h: Int, i: Long, interlaced: Boolean = false): Array[Byte] =
    gifWithPixels(w, h, i, interlaced)

  private def gifWithPixels(w: Int, h: Int, i: Long, interlaced: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(0x80 | 0x07) // GCT present, 2^8 entries
    out.write(0); out.write(0) // bg index, aspect
    for (p <- 0 until 256) { out.write(p); out.write((2 * p + 1) % 256); out.write(255 - p) }
    // a Graphic Control Extension the decoder must skip over
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); le16(out, 0); out.write(0); out.write(0)
    out.write(0x2c) // image descriptor
    le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
    out.write(if (interlaced) 0x40 else 0) // no local table; interlace flag
    out.write(8) // LZW minimum code size
    // LSB-first bit writer for 9-bit codes
    val bits = new ByteArrayOutputStream
    var acc = 0L; var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits; nBits += 9
      while (nBits >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    val clear = 256; val eoi = 257
    put(clear)
    var sinceClear = 0
    // row serialization order: top-to-bottom, or the GIF89a 4-pass
    // interlace permutation (0,8,16,… / 4,12,… / 2,6,… / odd rows)
    val rowOrder =
      if (interlaced) Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }
      else 0 until h
    for (y <- rowOrder) {
      var x = 0
      while (x < w) {
        put(gifPixelIndex(i, x, y))
        sinceClear += 1
        // the decoder's table grows one entry per literal; clear well
        // before entry 512 would widen the codes to 10 bits
        if (sinceClear == 250) { put(clear); sinceClear = 0 }
        x += 1
      }
    }
    put(eoi)
    if (nBits > 0) bits.write((acc & 0xff).toInt)
    val z = bits.toByteArray
    var off = 0
    while (off < z.length) { // <=255-byte data sub-blocks
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ---- decodable JPEG fixtures (real baseline entropy stream) ------

  /** Closed-form value of the 8x8 block at (bx, by) in JPEG fixture i
    * (mirrored by the q_jpeg_features oracle). Constant-per-block
    * grayscale content is the one shape whose lossy round trip is
    * EXACT: each block carries only a DC coefficient, and with a
    * uniform quant table of 8 the quantized DC is the level-shifted
    * value itself, so decode reproduces every pixel bit-for-bit while
    * still driving the full Huffman/dequant/IDCT machinery.
    */
  def jpegBlockValue(i: Long, bx: Int, by: Int): Int =
    ((bx * 37 + by * 59 + i * 31) % 256).toInt

  /** A decodable baseline grayscale JPEG with closed-form dims
    * (w = 9 + i%16, h = 9 + i%12 — deliberately not multiples of 8,
    * so edge-block padding and cropping are oracle-gated too) and
    * constant-per-block pixels, produced by the REAL encoder below.
    */
  def jpegPayload(i: Long): Array[Byte] = {
    val w = 9 + (i % 16).toInt
    val h = 9 + (i % 12).toInt
    val px = Array.tabulate(w * h) { k =>
      jpegBlockValue(i, (k % w) / 8, (k / w) / 8).toByte
    }
    jpegEncode(w, h, Array(px), quantVal = 8, restartInterval = 0)
  }

  /** Fixture Huffman tables: every DC category is a 4-bit code (12
    * symbols), every AC (run,size) symbol an 8-bit code (EOB, ZRL,
    * runs 0-15 x sizes 1-10 = 162 symbols). Valid canonical tables —
    * Kraft-satisfying, all-ones code unassigned — that keep the
    * writer simple while the decoder still runs its full
    * variable-length machinery (and foreign Annex-K-style tables are
    * cross-validated separately via javax.imageio-encoded payloads).
    */
  private val jpegDcVals: Array[Int] = (0 to 11).toArray
  private val jpegAcVals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
  private val jpegAcCode: Map[Int, Int] = jpegAcVals.zipWithIndex.toMap

  /** MSB-first entropy bit writer with 0xFF00 byte stuffing. */
  private final class JpegBitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) {
        acc = (acc << 1) | ((code >> k) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        k -= 1
      }
    }
    /** Pad the final partial byte with 1 bits (T.81 convention). */
    def flush(): Unit = while (n != 0) put(1, 1)
  }

  private def jpegCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def writeDht(out: ByteArrayOutputStream, cls: Int,
                       counts: Array[Int], vals: Array[Int]): Unit = {
    out.write(0xff); out.write(0xc4)
    be16(out, 2 + 1 + 16 + vals.length)
    out.write(cls << 4)
    var l = 0
    while (l < 16) { out.write(counts(l)); l += 1 }
    vals.foreach(out.write)
  }

  /** Encode a REAL baseline JPEG — the decoder's full inverse: level
    * shift, forward DCT (the transpose of [[graft.pipeline.Jpeg.basis]]),
    * uniform quantization, zigzag run-length + canonical-Huffman
    * entropy coding with FF stuffing, optional restart markers.
    * `planes` holds 1 (grayscale) or 3 (YCbCr) w*h planes; edge
    * blocks pad by edge replication. With `subsample420` the chroma
    * planes are box-averaged to half resolution and the stream is
    * written as 4:2:0 (2x2 luma blocks per interleaved MCU) — the
    * layout nearly every real-world JPEG uses.
    */
  def jpegEncode(w: Int, h: Int, planes: Array[Array[Byte]], quantVal: Int,
                 restartInterval: Int, subsample420: Boolean = false): Array[Byte] = {
    import graft.pipeline.Jpeg.{basis, zigzag}
    val nc = planes.length
    require(nc == 1 || nc == 3, "grayscale or YCbCr only")
    val sub = subsample420 && nc == 3
    val compH = if (sub) Array(2, 1, 1) else Array.fill(nc)(1)
    val compV = if (sub) Array(2, 1, 1) else Array.fill(nc)(1)
    val maxH = compH(0); val maxV = compV(0)
    // component-resolution planes and dims (box-averaged chroma)
    val cW = Array.tabulate(nc)(c => if (compH(c) == maxH) w else (w + 1) / 2)
    val cH = Array.tabulate(nc)(c => if (compV(c) == maxV) h else (h + 1) / 2)
    val cPlane = Array.tabulate(nc) { c =>
      if (cW(c) == w && cH(c) == h) planes(c)
      else {
        val out = new Array[Byte](cW(c) * cH(c))
        var y = 0
        while (y < cH(c)) {
          var x = 0
          while (x < cW(c)) {
            var sum = 0; var n = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val fx = 2 * x + dx; val fy = 2 * y + dy
                if (fx < w && fy < h) { sum += planes(c)(fy * w + fx) & 0xff; n += 1 }
                dx += 1
              }
              dy += 1
            }
            out(y * cW(c) + x) = ((sum + n / 2) / n).toByte
            x += 1
          }
          y += 1
        }
        out
      }
    }
    val out = new ByteArrayOutputStream
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0/JFIF (tags 3-comp as YCbCr)
    be16(out, 16); out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    be16(out, 1); be16(out, 1); out.write(0); out.write(0)
    out.write(0xff); out.write(0xdb) // DQT: one uniform 8-bit table
    be16(out, 67); out.write(0)
    for (_ <- 0 until 64) out.write(quantVal)
    if (restartInterval > 0) {
      out.write(0xff); out.write(0xdd); be16(out, 4); be16(out, restartInterval)
    }
    out.write(0xff); out.write(0xc0) // SOF0
    be16(out, 8 + 3 * nc); out.write(8)
    be16(out, h); be16(out, w); out.write(nc)
    for (c <- 0 until nc) { out.write(c + 1); out.write((compH(c) << 4) | compV(c)); out.write(0) }
    writeDht(out, 0, Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), jpegDcVals)
    writeDht(out, 1, Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0), jpegAcVals)
    out.write(0xff); out.write(0xda) // SOS
    be16(out, 6 + 2 * nc); out.write(nc)
    for (c <- 0 until nc) { out.write(c + 1); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bw = new JpegBitWriter(out)
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val dcPred = new Array[Int](nc)
    val shifted = new Array[Double](64)
    val tmp = new Array[Double](64)
    val qc = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + ((mcu / restartInterval - 1) % 8))
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nc) {
          var vby = 0
          while (vby < compV(c)) {
          var vbx = 0
          while (vbx < compH(c)) {
          val plane = cPlane(c)
          val pwc = cW(c); val phc = cH(c)
          val x0 = (mx * compH(c) + vbx) * 8
          val y0 = (my * compV(c) + vby) * 8
          var y = 0
          while (y < 8) {
            val sy = math.min(y0 + y, phc - 1)
            var x = 0
            while (x < 8) {
              val sx = math.min(x0 + x, pwc - 1)
              shifted(y * 8 + x) = (plane(sy * pwc + sx) & 0xff) - 128.0
              x += 1
            }
            y += 1
          }
          // forward DCT: S_vu = sum_xy basis(u)(x) basis(v)(y) s_yx
          var v = 0
          while (v < 8) {
            var x = 0
            while (x < 8) {
              var acc = 0.0
              var yy = 0
              while (yy < 8) { acc += basis(v)(yy) * shifted(yy * 8 + x); yy += 1 }
              tmp(v * 8 + x) = acc
              x += 1
            }
            v += 1
          }
          var k = 0
          while (k < 64) {
            val vv = k / 8; val u = k % 8
            var acc = 0.0
            var x = 0
            while (x < 8) { acc += basis(u)(x) * tmp(vv * 8 + x); x += 1 }
            qc(k) = math.round(acc / quantVal).toInt
            k += 1
          }
          // DC diff then zigzag AC run-lengths
          val diff = qc(0) - dcPred(c)
          dcPred(c) = qc(0)
          val s0 = jpegCat(diff)
          bw.put(s0, 4) // DC code of category s0 is s0 itself
          if (s0 > 0) bw.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
          var run = 0
          k = 1
          while (k < 64) {
            val ac = qc(zigzag(k))
            if (ac == 0) run += 1
            else {
              while (run > 15) { bw.put(jpegAcCode(0xf0), 8); run -= 16 }
              val s = jpegCat(ac)
              bw.put(jpegAcCode((run << 4) | s), 8)
              bw.put(if (ac >= 0) ac else ac + (1 << s) - 1, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) bw.put(jpegAcCode(0x00), 8) // EOB
          vbx += 1
          }
          vby += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- video-container fixtures (MP4 / ISO-BMFF and AVI) ----------

  /** Closed-form video fixture fields (mirrored by the q_video_*
    * oracles): variant = i % 3 -> mp4, avi, corrupt.
    * mp4: width = 160 + (i%19)*16, height = 120 + (i%13)*8,
    * timescale = 600*(1 + i%4), duration units = 3000 + i%4567
    * (so duration_ms = units * 1000 // timescale), n_frames =
    * 5 + i%12, sample j's size = 20 + ((i*13 + j*7) % 40), keyframes
    * at j % 4 == 0, samples packed 3 per chunk, mdat data byte k =
    * (i*31 + k*7 + 3) % 256, mvhd version = i % 2 (both box versions
    * oracle-gated).
    * avi: width = 320 + (i%11)*8, height = 240 + (i%9)*8,
    * usec/frame = 20000 + (i%7)*5000, total frames = 40 + i%321.
    */
  def videoPayload(i: Long): Array[Byte] = (i % 3) match {
    case 0 => mp4Payload(i)
    case 1 => aviPayload(i)
    case _ => corrupt(i)
  }

  def mp4Width(i: Long): Int = (160 + (i % 19) * 16).toInt
  def mp4Height(i: Long): Int = (120 + (i % 13) * 8).toInt
  def mp4FrameCount(i: Long): Int = (5 + (i % 12)).toInt
  def mp4SampleSize(i: Long, j: Int): Int = (20 + ((i * 13 + j * 7) % 40)).toInt
  def mp4DurationMs(i: Long): Long = (3000 + i % 4567) * 1000 / (600 * (1 + i % 4))

  private def be64(out: ByteArrayOutputStream, v: Long): Unit = {
    be32(out, (v >>> 32) & 0xffffffffL); be32(out, v & 0xffffffffL)
  }

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    be32(out, payload.length + 8L)
    out.write(tag.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  private def fullBox(tag: String, version: Int, flags: Int,
                      body: ByteArrayOutputStream => Unit): Array[Byte] = {
    val p = new ByteArrayOutputStream
    p.write(version); p.write((flags >> 16) & 0xff); p.write((flags >> 8) & 0xff); p.write(flags & 0xff)
    body(p)
    box(tag, p.toByteArray)
  }

  /** The fixture's moov: one 'vide' trak whose sample table packs the
    * closed-form sample sizes 3 per chunk starting at `mdatStart`.
    * Box layout follows ISO 14496-12; the identity matrix, dref and
    * avc1 sample entry are structurally honest so a foreign parser
    * reads the file too.
    */
  private def mp4Moov(i: Long, mdatStart: Long): Array[Byte] = {
    val w = mp4Width(i); val h = mp4Height(i)
    val ts = 600L * (1 + (i % 4)); val dur = 3000L + i % 4567
    val n = mp4FrameCount(i)
    val ver = (i % 2).toInt
    val matrix = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
    val mvhd = fullBox("mvhd", ver, 0, p => {
      if (ver == 1) { be64(p, 0); be64(p, 0); be32(p, ts); be64(p, dur) }
      else { be32(p, 0); be32(p, 0); be32(p, ts); be32(p, dur) }
      be32(p, 0x00010000L); be16(p, 0x0100); be16(p, 0) // rate, volume, reserved
      be64(p, 0) // reserved
      matrix.foreach(be32(p, _))
      for (_ <- 0 until 6) be32(p, 0) // pre_defined
      be32(p, 2) // next track id
    })
    val tkhd = fullBox("tkhd", 0, 7, p => {
      be32(p, 0); be32(p, 0); be32(p, 1); be32(p, 0); be32(p, dur)
      be64(p, 0); be16(p, 0); be16(p, 0); be16(p, 0); be16(p, 0)
      matrix.foreach(be32(p, _))
      be32(p, w.toLong << 16); be32(p, h.toLong << 16) // 16.16 fixed
    })
    val mdhd = fullBox("mdhd", 0, 0, p => {
      be32(p, 0); be32(p, 0); be32(p, ts); be32(p, dur)
      be16(p, 0x55c4); be16(p, 0) // language 'und', pre_defined
    })
    val hdlr = fullBox("hdlr", 0, 0, p => {
      be32(p, 0); p.write("vide".getBytes("US-ASCII"))
      be32(p, 0); be32(p, 0); be32(p, 0)
      p.write(0) // empty name
    })
    val vmhd = fullBox("vmhd", 0, 1, p => { be16(p, 0); be16(p, 0); be16(p, 0); be16(p, 0) })
    val dref = fullBox("dref", 0, 0, p => {
      be32(p, 1)
      p.write(fullBox("url ", 0, 1, _ => ())) // self-contained
    })
    val dinf = box("dinf", dref)
    val avc1 = {
      val p = new ByteArrayOutputStream
      p.write(new Array[Byte](6)); be16(p, 1) // reserved, data_ref_index
      be16(p, 0); be16(p, 0); be32(p, 0); be32(p, 0); be32(p, 0) // pre_defined/reserved
      be16(p, w); be16(p, h)
      be32(p, 0x00480000L); be32(p, 0x00480000L) // 72 dpi
      be32(p, 0); be16(p, 1) // reserved, frame_count
      p.write(new Array[Byte](32)) // compressor name
      be16(p, 24); be16(p, 0xffff) // depth, pre_defined -1
      box("avc1", p.toByteArray)
    }
    val stsd = fullBox("stsd", 0, 0, p => { be32(p, 1); p.write(avc1) })
    val stts = fullBox("stts", 0, 0, p => { be32(p, 1); be32(p, n.toLong); be32(p, ts / 30) })
    val stsc = fullBox("stsc", 0, 0, p => { be32(p, 1); be32(p, 1); be32(p, 3); be32(p, 1) })
    val stsz = fullBox("stsz", 0, 0, p => {
      be32(p, 0); be32(p, n.toLong)
      for (j <- 0 until n) be32(p, mp4SampleSize(i, j).toLong)
    })
    val nChunks = (n + 2) / 3
    val stco = fullBox("stco", 0, 0, p => {
      be32(p, nChunks.toLong)
      var off = mdatStart
      var j = 0
      for (c <- 0 until nChunks) {
        be32(p, off)
        var k = 0
        while (k < 3 && j < n) { off += mp4SampleSize(i, j); j += 1; k += 1 }
      }
    })
    val syncs = (0 until n).filter(_ % 4 == 0)
    val stss = fullBox("stss", 0, 0, p => {
      be32(p, syncs.length.toLong)
      syncs.foreach(j => be32(p, j + 1L)) // 1-based sample numbers
    })
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco ++ stss)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    box("moov", mvhd ++ trak)
  }

  /** A structurally valid MP4: ftyp + mdat (closed-form sample bytes)
    * + moov — or moov before mdat with `moovFirst` (the streaming
    * layout; stco offsets are rebuilt for the shifted mdat).
    */
  def mp4Payload(i: Long, moovFirst: Boolean = false): Array[Byte] = {
    val n = mp4FrameCount(i)
    val total = (0 until n).map(mp4SampleSize(i, _)).sum
    val ftyp = {
      val p = new ByteArrayOutputStream
      p.write("isom".getBytes("US-ASCII")); be32(p, 0)
      box("ftyp", p.toByteArray)
    }
    val mdat = box("mdat", Array.tabulate(total)(k => ((i * 31 + k * 7 + 3) % 256).toByte))
    if (!moovFirst) ftyp ++ mdat ++ mp4Moov(i, ftyp.length + 8L)
    else {
      // moov's length doesn't depend on the offsets' VALUES (fixed-
      // width fields), so a probe build yields the real length
      val probeLen = mp4Moov(i, 0).length
      ftyp ++ mp4Moov(i, ftyp.length + probeLen + 8L) ++ mdat
    }
  }

  /** Closed-form AVI frame-map fields (mirrored by the q_video_frames
    * oracle's AVI branch): nf = 4 + i%9 `00dc` chunks in the movi
    * LIST; chunk j's data is aviFrameSize bytes (always even — no
    * RIFF padding — so offsets stay closed-form), byte k of chunk j
    * is aviFrameByte; keyframes at j % 3 == 0 (AVIIF_KEYFRAME in
    * idx1). The fixed header layout puts the movi LIST at 88, its
    * fourcc at 96 and chunk 0's header at 100.
    */
  def aviFrameCount(i: Long): Int = (4 + (i % 9)).toInt
  def aviFrameSize(i: Long, j: Int): Int = (16 + 2 * ((i * 11 + j * 5) % 16)).toInt
  def aviFrameByte(i: Long, j: Int, k: Int): Int = ((i * 17 + j * 3 + k * 7 + 1) % 256).toInt

  /** A structurally valid AVI: RIFF('AVI ') with a hdrl LIST carrying
    * the 56-byte avih main header, a movi LIST of closed-form `00dc`
    * video chunks, and the idx1 index over them. Index offsets use
    * BOTH wild conventions — movi-relative when i % 6 == 1, absolute
    * when i % 6 == 4 — so the parser's disambiguation is oracle-
    * gated. The avih dwTotalFrames stays the DECLARED closed form
    * (40 + i%321) pinned by q_video_metadata, deliberately different
    * from the idx1 chunk count: header-vs-index disagreement is a
    * real corpus phenomenon, and metadata reads the header while the
    * frame map trusts the index.
    */
  def aviPayload(i: Long): Array[Byte] = {
    val uspf = (20000 + (i % 7) * 5000).toInt
    val total = (40 + (i % 321)).toInt
    val w = (320 + (i % 11) * 8).toInt
    val h = (240 + (i % 9) * 8).toInt
    val avih = new ByteArrayOutputStream
    le32(avih, uspf.toLong); le32(avih, 0); le32(avih, 0); le32(avih, 0x10)
    le32(avih, total.toLong); le32(avih, 0); le32(avih, 1); le32(avih, 0)
    le32(avih, w.toLong); le32(avih, h.toLong)
    for (_ <- 0 until 4) le32(avih, 0) // dwReserved
    val hdrl = new ByteArrayOutputStream
    hdrl.write("hdrl".getBytes("US-ASCII"))
    hdrl.write("avih".getBytes("US-ASCII")); le32(hdrl, 56L); hdrl.write(avih.toByteArray)
    val nf = aviFrameCount(i)
    val movi = new ByteArrayOutputStream
    movi.write("movi".getBytes("US-ASCII"))
    val chunkHdrPos = new Array[Int](nf) // absolute file position of chunk j's header
    for (j <- 0 until nf) {
      chunkHdrPos(j) = 88 + 8 + 4 + (movi.size() - 4) // RIFF(12)+hdrl LIST(76) -> movi LIST at 88
      movi.write("00dc".getBytes("US-ASCII"))
      val sz = aviFrameSize(i, j)
      le32(movi, sz.toLong)
      for (k <- 0 until sz) movi.write(aviFrameByte(i, j, k))
    }
    val idx = new ByteArrayOutputStream
    val relative = i % 6 == 1
    for (j <- 0 until nf) {
      idx.write("00dc".getBytes("US-ASCII"))
      le32(idx, if (j % 3 == 0) 0x10L else 0L) // AVIIF_KEYFRAME
      le32(idx, if (relative) chunkHdrPos(j) - 96L else chunkHdrPos(j).toLong)
      le32(idx, aviFrameSize(i, j).toLong)
    }
    val out = new ByteArrayOutputStream
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4L + 8 + hdrl.size() + 8 + movi.size() + 8 + idx.size())
    out.write("AVI ".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII")); le32(out, hdrl.size().toLong); out.write(hdrl.toByteArray)
    out.write("LIST".getBytes("US-ASCII")); le32(out, movi.size().toLong); out.write(movi.toByteArray)
    out.write("idx1".getBytes("US-ASCII")); le32(out, idx.size().toLong); out.write(idx.toByteArray)
    out.toByteArray
  }

  /** RGB bytes (packed, 3 per pixel) -> baseline 4:4:4 color JPEG via
    * the JFIF forward YCbCr transform (specs decode it back with both
    * the engine and javax.imageio and compare).
    */
  def jpegEncodeRgb(w: Int, h: Int, rgb: Array[Byte], quantVal: Int,
                    restartInterval: Int = 0, subsample420: Boolean = false): Array[Byte] = {
    val yP = new Array[Byte](w * h)
    val cbP = new Array[Byte](w * h)
    val crP = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      val r = rgb(3 * p) & 0xff; val g = rgb(3 * p + 1) & 0xff; val b = rgb(3 * p + 2) & 0xff
      def cl(v: Double): Byte = math.max(0, math.min(255, math.round(v))).toByte
      yP(p) = cl(0.299 * r + 0.587 * g + 0.114 * b)
      cbP(p) = cl(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
      crP(p) = cl(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
      p += 1
    }
    jpegEncode(w, h, Array(yP, cbP, crP), quantVal, restartInterval, subsample420)
  }
}
