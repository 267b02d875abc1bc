package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parsed media-container header: what a real pipeline needs to route,
  * filter, and bucket media WITHOUT full decode — format, pixel dims
  * for images, sample rate / channels / duration for audio. Every
  * field except `format` is nullable: images carry no audio fields,
  * audio carries no pixel dims, and unrecognized/truncated payloads
  * carry neither.
  */
case class MediaInfo(
    format: String,
    width: Option[Int],
    height: Option[Int],
    sample_rate: Option[Int],
    channels: Option[Int],
    bits_per_sample: Option[Int],
    duration_ms: Option[Long],
    n_frames: Option[Long] = None)

/** One sample ("frame") of a video container's sample table: its
  * index, absolute byte range inside the payload, and whether the
  * container marks it as a sync sample (keyframe). Extracted WITHOUT
  * decoding — the sample table is container metadata, which is
  * exactly what a 100 TB pipeline wants: route/filter/sample frames
  * by offset, decode only the ones that survive.
  */
case class FrameRef(frame_idx: Int, offset: Long, n_bytes: Int, is_keyframe: Boolean)

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so codecs initialize once
  * per task, not once per row.
  *
  * Container-HEADER parsing (format sniffing, pixel dimensions, audio
  * sample rate / duration) is REAL: pure-JVM readers for the public
  * PNG, JPEG/JFIF, GIF and WAV/RIFF container formats — the same
  * binary-format craft as `sources/Sas7bdat.scala`. DECODE is real
  * too, with no codec library anywhere: PNG pixels (zlib inflate +
  * all five scanline filters, [[decodePngPixels]]), GIF pixels (full
  * variable-width LZW, [[decodeGifPixels]]), JPEG pixels — baseline
  * AND progressive, subsampled chroma included (Huffman + dequant +
  * IDCT + YCbCr, [[Jpeg.decodePixels]]) — and PCM WAV samples at
  * every integer width ([[decodeWavSamples]]), each feeding exact
  * summary features and the real [[imageEmbedding]]. VIDEO
  * containers parse for real too: MP4/ISO-BMFF (box walk: mvhd
  * duration, tkhd dims, stsz frame count) and AVI (avih header) for
  * metadata, and [[mp4SampleTable]] composes stsc/stsz/stco/stss
  * into the true per-frame byte ranges + keyframe flags — the frame
  * map a pipeline routes and samples on without decoding. PNG
  * decode covers Adam7 interlacing, GIF decode the 4-pass interlaced
  * row order. Out of scope: video CODECS (H.264 etc.); for
  * payloads the engine cannot decode the generic [[extractFeatures]]
  * path uses `decodeStub`, a deterministic stand-in to swap for a
  * real embedding model at deployment. Everything else — schema,
  * metadata, partitioning, frame sampling — runs for real.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)
  ))

  // ---- container-header parsers (pure JVM, public format specs) ----

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)

  private val unknown = MediaInfo("unknown", None, None, None, None, None, None)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    * (length=13): width and height are the first two big-endian u32s
    * of its data. Dims above Int.MaxValue are out of spec (PNG caps
    * at 2^31-1) -> unknown.
    */
  private def parsePng(b: Array[Byte]): MediaInfo = {
    if (b.length < 24 || ascii(b, 12, 4) != "IHDR") return unknown
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) unknown
    else MediaInfo("png", Some(w.toInt), Some(h.toInt), None, None, None, None)
  }

  /** JPEG: walk the marker-segment chain from SOI to the first SOFn
    * (baseline C0, extended C1, progressive C2, ... — every Cx except
    * C4/C8/CC, which are huffman/arithmetic tables): its payload is
    * precision(1) height(2,BE) width(2,BE). Standalone markers
    * (RST0-7, TEM, SOI) carry no length field; everything else is
    * skipped by its 2-byte big-endian length. Stops at SOS/EOI —
    * past SOS the stream is entropy-coded data, not segments.
    */
  private def parseJpeg(b: Array[Byte]): MediaInfo = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return unknown
      // fill bytes: any number of 0xFF may pad before a marker code
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return unknown
      val marker = b(j) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (j + 8 >= b.length) return unknown
        val h = u16be(b, j + 4); val w = u16be(b, j + 6)
        return if (w <= 0 || h <= 0) unknown
        else MediaInfo("jpeg", Some(w), Some(h), None, None, None, None)
      } else if (marker == 0xd9 || marker == 0xda) {
        return unknown // hit EOI / scan data without a frame header
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        i = j + 1 // standalone marker, no length field
      } else {
        if (j + 2 >= b.length) return unknown
        val segLen = u16be(b, j + 1)
        if (segLen < 2) return unknown
        i = j + 1 + segLen
      }
    }
    unknown
  }

  /** GIF: 6-byte version tag, then the Logical Screen Descriptor's
    * width and height as little-endian u16s.
    */
  private def parseGif(b: Array[Byte]): MediaInfo = {
    if (b.length < 10) return unknown
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w <= 0 || h <= 0) unknown
    else MediaInfo("gif", Some(w), Some(h), None, None, None, None)
  }

  /** WAV: RIFF container tagged WAVE; chunks are (id, size-LE-u32,
    * data) padded to even offsets. `fmt ` gives channels / sample
    * rate / bits-per-sample / byte rate; the `data` chunk's declared
    * size over the byte rate gives duration (floor, ms). Needs a
    * `fmt ` to report anything; duration is null until a `data`
    * chunk is seen.
    */
  private def parseWav(b: Array[Byte]): MediaInfo = {
    var sampleRate, channels, bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = u32le(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
        channels = u16le(b, i + 10)
        sampleRate = u32le(b, i + 12).toInt
        byteRate = u32le(b, i + 16)
        bits = u16le(b, i + 22)
      } else if (id == "data") {
        dataBytes = size
      }
      if (size > Int.MaxValue - 16) return unknown // declared size overflows addressing
      // chunk data is padded to an even byte boundary
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (sampleRate <= 0 || channels <= 0 || bits <= 0) unknown
    else {
      val dur =
        if (dataBytes >= 0 && byteRate > 0) Some(dataBytes * 1000L / byteRate) else None
      MediaInfo("wav", None, None, Some(sampleRate), Some(channels), Some(bits), dur)
    }
  }

  // ---- video containers: MP4 / ISO-BMFF and AVI -------------------

  /** Walk the ISO-BMFF (public ISO 14496-12) box sequence in
    * b[start, end), calling `f(boxType, payloadStart, payloadEnd)`
    * per box. Handles the 32-bit size form, the size==1 64-bit
    * largesize form, and size==0 (box extends to the end of the
    * enclosing range). A malformed size terminates the walk instead
    * of throwing — at 100 TB lying headers are data, not exceptions.
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = start
    var stop = false
    while (!stop && i + 8 <= end) {
      val size32 = u32be(b, i)
      val tag = ascii(b, i + 4, 4)
      var hdr = 8L
      var size = size32
      if (size32 == 1) {
        if (i + 16 > end) return
        // an in-memory payload cannot address past Int.MaxValue: a
        // largesize with a nonzero high word is lying
        if (u32be(b, i + 8) != 0) return
        size = u32be(b, i + 12)
        hdr = 16L
      } else if (size32 == 0) {
        size = (end - i).toLong
      }
      if (size < hdr || i + size > end) stop = true
      else {
        f(tag, (i + hdr).toInt, (i + size).toInt)
        i += size.toInt
      }
    }
  }

  /** MP4 / ISO-BMFF: `moov/mvhd` gives the movie timescale + duration
    * (both box versions); the first `trak` whose `mdia/hdlr` handler
    * is 'vide' (fallback: first trak with nonzero `tkhd` dims)
    * contributes pixel dims (tkhd's 16.16 fixed-point width/height)
    * and the frame count (its `stbl/stsz` sample count). Pure header
    * walk — no codec, no sample data read.
    */
  /** Visit the first trak the video-selection rule claims — hdlr
    * 'vide', or (fallback for hdlr-less files) any non-'soun' trak
    * for which the caller's collectors gathered data (`hasData`).
    * `begin` resets the caller's per-trak state; `onTkhd` /
    * `onStblChild` receive box payload bounds. The selection rule
    * lives HERE, once — [[parseMp4]] and [[mp4SampleTable]] share it.
    * Returns true when a trak was claimed (the collectors then hold
    * that trak's data; later traks are not visited).
    */
  private def visitVideoTrak(b: Array[Byte])(
      begin: () => Unit,
      onTkhd: (Int, Int) => Unit,
      onStblChild: (String, Int, Int) => Unit,
      hasData: () => Boolean): Boolean = {
    var claimed = false
    walkBoxes(b, 0, b.length) { (tag, s, e) =>
      if (tag == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "trak" && !claimed) {
          var handler = ""
          begin()
          walkBoxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "tkhd") onTkhd(s3, e3)
            else if (t3 == "mdia") walkBoxes(b, s3, e3) { (t4, s4, e4) =>
              if (t4 == "hdlr" && e4 - s4 >= 12) handler = ascii(b, s4 + 8, 4)
              else if (t4 == "minf") walkBoxes(b, s4, e4) { (t5, s5, e5) =>
                if (t5 == "stbl") walkBoxes(b, s5, e5)(onStblChild)
              }
            }
          }
          if (handler == "vide" || (handler != "soun" && hasData())) claimed = true
        }
      }
    }
    claimed
  }

  private def parseMp4(b: Array[Byte]): MediaInfo = {
    var durationMs: Option[Long] = None
    walkBoxes(b, 0, b.length) { (tag, s, e) =>
      if (tag == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && durationMs.isEmpty && e2 - s2 >= 20) {
          val ver = b(s2) & 0xff
          // a version-1 box too short for the v1 layout is lying —
          // reading the v0 offsets would misparse timestamps as
          // timescale/duration, so report nothing instead
          val (timescale, duration) =
            if (ver == 1) {
              if (e2 - s2 >= 32) (u32be(b, s2 + 20), u64be(b, s2 + 24)) else (-1L, -1L)
            } else (u32be(b, s2 + 12), u32be(b, s2 + 16))
          if (timescale > 0 && duration >= 0)
            durationMs = Some(duration * 1000L / timescale)
        }
      }
    }
    var w = -1; var h = -1; var frames = -1L
    val claimed = visitVideoTrak(b)(
      begin = () => { w = -1; h = -1; frames = -1L },
      onTkhd = (s3, e3) =>
        if (e3 - s3 >= 84) {
          val ver = b(s3) & 0xff
          val wOff = if (ver == 1) s3 + 88 else s3 + 76
          if (wOff + 8 <= e3) {
            w = (u32be(b, wOff) >> 16).toInt // 16.16 fixed point
            h = (u32be(b, wOff + 4) >> 16).toInt
          }
        },
      onStblChild = (t6, s6, e6) =>
        if (t6 == "stsz" && e6 - s6 >= 12) frames = u32be(b, s6 + 8),
      hasData = () => w > 0)
    if (claimed)
      MediaInfo("mp4",
        if (w > 0) Some(w) else None,
        if (h > 0) Some(h) else None,
        None, None, None, durationMs,
        if (frames >= 0) Some(frames) else None)
    else MediaInfo("mp4", None, None, None, None, None, durationMs, None)
  }

  /** AVI: RIFF container tagged 'AVI '; the `hdrl` LIST's `avih` main
    * header carries microseconds-per-frame, total frames, and pixel
    * dims (all little-endian u32). duration_ms = uspf * frames / 1000.
    */
  private def parseAvi(b: Array[Byte]): MediaInfo = {
    val none = MediaInfo("avi", None, None, None, None, None, None, None)
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = u32le(b, i + 4)
      if (size > Int.MaxValue - 16) return none
      if (id == "LIST" && i + 12 <= b.length && ascii(b, i + 8, 4) == "hdrl") {
        val end = math.min(b.length.toLong, i + 8 + size).toInt
        var j = i + 12
        while (j + 8 <= end) {
          val cid = ascii(b, j, 4)
          val csize = u32le(b, j + 4)
          if (cid == "avih" && csize >= 40 && j + 48 <= end) {
            val uspf = u32le(b, j + 8)
            val total = u32le(b, j + 24)
            val w = u32le(b, j + 40)
            val h = u32le(b, j + 44)
            // two lying u32-max fields can overflow the Long product:
            // guard like every other lying-header field, report None
            val dur =
              if (uspf > 0 && total > 0 && total <= Long.MaxValue / uspf)
                Some(uspf * total / 1000L)
              else None
            return MediaInfo("avi",
              if (w > 0) Some(w.toInt) else None,
              if (h > 0) Some(h.toInt) else None,
              None, None, None, dur,
              Some(total))
          }
          if (csize > Int.MaxValue - 16) return none
          j += 8 + csize.toInt + (csize.toInt & 1)
        }
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    none
  }

  /** Sniff the container by magic bytes and parse its header. Null,
    * truncated, or unrecognized payloads come back as
    * `("unknown", nulls...)` — never an exception: at 100 TB some
    * payloads WILL be garbage and a poison row must not kill a stage.
    */
  def parseMediaHeader(b: Array[Byte]): MediaInfo = {
    if (b == null || b.length < 12) return unknown
    try {
      if ((b(0) & 0xff) == 0x89 && ascii(b, 1, 3) == "PNG" &&
          (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
          (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) parsePng(b)
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) parseJpeg(b)
      else if (ascii(b, 0, 6) == "GIF87a" || ascii(b, 0, 6) == "GIF89a") parseGif(b)
      else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE") parseWav(b)
      else if (ascii(b, 4, 4) == "ftyp") parseMp4(b)
      else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "AVI ") parseAvi(b)
      else unknown
    } catch {
      // defensive: a corrupt length field walking past the buffer
      case _: IndexOutOfBoundsException => unknown
      case _: NegativeArraySizeException => unknown
    }
  }

  private val parseHeaderUdf = udf((payload: Array[Byte]) => parseMediaHeader(payload))

  // ---- REAL audio decode: PCM WAV -------------------------------

  /** Decoded-audio summary features. All null when the payload is not
    * a decodable PCM WAV.
    */
  case class AudioFeatures(n_samples: Option[Long], peak: Option[Int], rms: Option[Double])

  private val noAudio = AudioFeatures(None, None, None)

  /** Decode PCM samples from a WAV payload — REAL decode, no codec
    * library needed: PCM is the bytes. Supports unsigned 8-bit
    * (centered: value - 128) and signed little-endian 16/24/32-bit,
    * declared either as plain PCM (format tag 1) or as
    * WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) with the PCM subformat
    * GUID; any channel count (channels pooled — the features below
    * are channel-agnostic). Returns null for non-WAV, compressed
    * variants (other format tags / subformats), or unsupported
    * widths, rather than guessing.
    */
  def decodeWavSamples(b: Array[Byte]): Array[Int] = {
    val hdr = parseMediaHeader(b)
    if (hdr.format != "wav") return null
    // locate the fmt tag + data chunk (parseMediaHeader validated shape)
    var fmtTag = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = u32le(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
        fmtTag = u16le(b, i + 8)
        bits = u16le(b, i + 22)
        if (fmtTag == 0xfffe) {
          // extensible: the real coding is the first subformat-GUID
          // word (fmt data offset 24); PCM's GUID starts 01 00
          fmtTag = if (size >= 40 && i + 34 <= b.length && u16le(b, i + 32) == 1) 1 else -1
        }
      } else if (id == "data" && dataOff < 0) {
        dataOff = i + 8
        dataLen = math.min(size, (b.length - dataOff).toLong).toInt
      }
      if (size > Int.MaxValue - 16) return null
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmtTag != 1 || dataOff < 0) return null // PCM only
    bits match {
      case 8 =>
        Array.tabulate(dataLen)(j => (b(dataOff + j) & 0xff) - 128)
      case 16 =>
        Array.tabulate(dataLen / 2) { k =>
          ((b(dataOff + 2 * k) & 0xff) | (b(dataOff + 2 * k + 1) << 8)).toShort.toInt
        }
      case 24 =>
        Array.tabulate(dataLen / 3) { k =>
          val o = dataOff + 3 * k
          val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
          (v << 8) >> 8 // sign-extend from 24 bits
        }
      case 32 =>
        Array.tabulate(dataLen / 4) { k =>
          val o = dataOff + 4 * k
          (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
            ((b(o + 2) & 0xff) << 16) | (b(o + 3) << 24)
        }
      case _ => null
    }
  }

  /** Summary features over the decoded samples: count, peak |value|,
    * RMS. The sum of squares accumulates as an exact unsigned
    * 128-bit integer in two Longs — a single Long overflows after
    * only ~2^17 samples of 24-bit or 4 samples of 32-bit audio — and
    * the final double conversion + division + sqrt is
    * IEEE-deterministic, so an external engine reproduces `rms`
    * bit-for-bit from the same samples (for 8/16-bit audio the high
    * word stays 0 and the math reduces to the exact-Long path).
    */
  def wavAudioFeatures(b: Array[Byte]): AudioFeatures = {
    val s = decodeWavSamples(b)
    if (s == null || s.isEmpty) return noAudio
    var peak = 0L
    var ssHi = 0L; var ssLo = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      if (math.abs(v) > peak) peak = math.abs(v)
      val sq = v * v // <= 2^62: no overflow per element
      val nLo = ssLo + sq
      if (java.lang.Long.compareUnsigned(nLo, ssLo) < 0) ssHi += 1
      ssLo = nLo
      i += 1
    }
    val ss =
      if (ssHi == 0 && ssLo >= 0) ssLo.toDouble
      else ssHi.toDouble * 1.8446744073709552e19 + // 2^64
        ((ssLo >>> 1).toDouble * 2.0 + (ssLo & 1L)) // unsigned Long -> double
    AudioFeatures(Some(s.length.toLong), Some(math.min(peak, Int.MaxValue).toInt),
      Some(math.sqrt(ss / s.length)))
  }

  private val audioFeaturesUdf = udf((payload: Array[Byte]) => wavAudioFeatures(payload))

  /** Column form: attach (n_samples, peak, rms) decoded from a PCM
    * WAV payload column. Pure per-row work — no shuffle, pipelines
    * with the scan; non-audio rows get nulls, not errors.
    */
  def withAudioFeatures(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__af__", audioFeaturesUdf(col(payloadCol).cast("binary")))
      .withColumn("n_samples", col("__af__.n_samples"))
      .withColumn("peak", col("__af__.peak"))
      .withColumn("rms", col("__af__.rms"))
      .drop("__af__")

  // ---- REAL image decode: PNG (RGB / RGBA, 8-bit) ----------------

  /** Cap on inflated pixel-buffer size: a hostile IHDR can declare
    * dimensions whose raw buffer would OOM an executor; past the cap
    * the decode returns null instead of allocating. 64 MiB covers a
    * 4096x4096 RGBA image.
    */
  private val maxPngRawBytes: Int = 64 * 1024 * 1024

  /** Adam7 pass geometry (PNG spec §8.2): start offsets and steps of
    * each of the 7 interlace passes over the full image grid.
    */
  private val Adam7X0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val Adam7Y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val Adam7Dx = Array(8, 8, 4, 4, 2, 2, 1)
  private val Adam7Dy = Array(8, 8, 8, 4, 4, 2, 2)

  /** Decode an 8-bit-depth PNG (color type 2 = RGB or 6 = RGBA),
    * sequential OR Adam7-interlaced, to its raw channel bytes,
    * row-major, `bpp` bytes per pixel — REAL decode with no codec
    * library: zlib is `java.util.zip.Inflater`, and the five
    * scanline filters (None / Sub / Up / Average / Paeth) are
    * public-spec byte arithmetic. An interlaced stream carries each
    * pass as its own sub-image (pass-local filtering, empty passes
    * absent), whose reconstructed pixels scatter onto the full grid
    * at the pass's offsets/steps. Returns (width, height, bpp,
    * bytes), or null for non-PNG input, unsupported layouts
    * (paletted, 16-bit), corrupt zlib streams, or dimensions past
    * the allocation cap — a poison row yields a null, never an
    * executor OOM or exception.
    */
  def decodePngPixels(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val hdr = parseMediaHeader(b)
    if (hdr.format != "png" || b.length < 29) return null
    val w = hdr.width.get; val h = hdr.height.get
    val bitDepth = b(24) & 0xff; val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (bitDepth != 8 || interlace > 1) return null
    val bpp = colorType match { case 2 => 3; case 6 => 4; case _ => return null }
    if (w.toLong * h * bpp + h > maxPngRawBytes) return null
    // pass table: sequential = one full-grid pass; Adam7 = seven
    val nPasses = if (interlace == 1) 7 else 1
    def passDims(p: Int): (Int, Int, Int, Int, Int, Int) = {
      val (x0, y0, dx, dy) =
        if (interlace == 1) (Adam7X0(p), Adam7Y0(p), Adam7Dx(p), Adam7Dy(p)) else (0, 0, 1, 1)
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      (x0, y0, dx, dy, wp, hp)
    }
    var rawLen = 0L
    for (p <- 0 until nPasses) {
      val (_, _, _, _, wp, hp) = passDims(p)
      if (wp > 0 && hp > 0) rawLen += hp.toLong * (1 + wp.toLong * bpp)
    }
    if (rawLen > maxPngRawBytes) return null
    // gather IDAT chunk payloads (possibly split across chunks)
    val idat = new java.io.ByteArrayOutputStream
    var i = 8
    try {
      var stop = false
      while (!stop && i + 8 <= b.length) {
        val len = u32be(b, i)
        if (len > b.length) return null // lying chunk length
        val tag = ascii(b, i + 4, 4)
        if (tag == "IDAT") idat.write(b, i + 8, math.min(len.toInt, b.length - i - 8))
        if (tag == "IEND") stop = true
        i += 12 + len.toInt // len + tag + data + crc
      }
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) { inf.end(); return null }
        off += n
      }
      inf.end()
      if (off < raw.length) return null // truncated stream
      // unfilter pass by pass (each pass is its own sub-image: Up /
      // Paeth reference the previous row OF THE PASS), scattering
      // reconstructed pixels onto the full grid
      val out = new Array[Byte](h * w * bpp)
      var rawOff = 0
      var pass = 0
      while (pass < nPasses) {
        val (x0, y0, dx, dy, wp, hp) = passDims(pass)
        if (wp > 0 && hp > 0) {
          val pStride = wp * bpp
          var prev = new Array[Byte](pStride)
          var cur = new Array[Byte](pStride)
          var j = 0
          while (j < hp) {
            val f = raw(rawOff) & 0xff
            val rowIn = rawOff + 1
            var x = 0
            while (x < pStride) {
              val c = raw(rowIn + x) & 0xff
              val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
              val up = if (j > 0) prev(x) & 0xff else 0
              val upLeft = if (j > 0 && x >= bpp) prev(x - bpp) & 0xff else 0
              val recon = f match {
                case 0 => c
                case 1 => c + left
                case 2 => c + up
                case 3 => c + (left + up) / 2
                case 4 =>
                  // Paeth predictor: nearest of left/up/upLeft to their sum
                  val p = left + up - upLeft
                  val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
                  val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
                  c + pred
                case _ => return null // invalid filter byte
              }
              cur(x) = (recon & 0xff).toByte
              x += 1
            }
            var sx = 0
            while (sx < wp) {
              val outPos = ((y0 + j * dy) * w + (x0 + sx * dx)) * bpp
              var cc = 0
              while (cc < bpp) { out(outPos + cc) = cur(sx * bpp + cc); cc += 1 }
              sx += 1
            }
            rawOff += 1 + pStride
            val t = prev; prev = cur; cur = t
            j += 1
          }
        }
        pass += 1
      }
      (w, h, bpp, out)
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: java.util.zip.DataFormatException => null
      case _: OutOfMemoryError => null // declared dims within cap, allocation still failed
    }
  }

  // ---- REAL image decode: GIF (LZW, 8-bit palette) ----------------

  /** Decode the first image of a GIF (sequential or interlaced) to
    * packed RGB bytes — REAL decode: the LZW variable-width code
    * stream is public-spec bit twiddling, no codec library involved.
    * Walks the block chain (extensions skipped by their sub-block
    * lengths), reads the global or local color table, inflates the
    * LZW indices and maps them through the palette; an interlaced
    * image's rows are de-permuted through the 4-pass order. Returns
    * (width, height, 3, rgb bytes) using the IMAGE descriptor's
    * dims, or null for non-GIF input, missing palettes, corrupt or
    * truncated code streams, or dims past the allocation cap.
    */
  def decodeGifPixels(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val hdr = parseMediaHeader(b)
    if (hdr.format != "gif" || b.length < 13) return null
    try {
      val packed = b(10) & 0xff
      var pal: Array[Byte] = null
      var i = 13
      if ((packed & 0x80) != 0) { // global color table
        val n = 3 * (1 << ((packed & 0x07) + 1))
        pal = java.util.Arrays.copyOfRange(b, 13, 13 + n)
        i = 13 + n
      }
      // block chain up to the first image descriptor
      while (i < b.length) {
        (b(i) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while ((b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
            i += 1
          case 0x2c => // image descriptor
            val w = u16le(b, i + 5); val h = u16le(b, i + 7)
            val ipack = b(i + 9) & 0xff
            val interlaced = (ipack & 0x40) != 0
            i += 10
            if ((ipack & 0x80) != 0) { // local color table wins
              val n = 3 * (1 << ((ipack & 0x07) + 1))
              pal = java.util.Arrays.copyOfRange(b, i, i + n)
              i += n
            }
            if (pal == null || w <= 0 || h <= 0) return null
            if (w.toLong * h * 3 > maxPngRawBytes) return null
            val idx = gifLzwDecode(b, i, w * h)
            if (idx == null) return null
            // interlaced GIF (GIF89a appendix E): the code stream
            // carries the SAME indices, rows ordered in 4 passes
            // (0,8,16,… then 4,12,… then 2,6,… then odd rows) — map
            // stream row r to its target row, identity when not
            // interlaced
            val rowMap = new Array[Int](h)
            if (interlaced) {
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
                rowMap(r) = y; r += 1
              }
            } else {
              var y = 0
              while (y < h) { rowMap(y) = y; y += 1 }
            }
            val out = new Array[Byte](w * h * 3)
            var p = 0
            while (p < w * h) {
              val off = 3 * (idx(p) & 0xff)
              if (off + 2 >= pal.length) return null // index past the palette
              val q = rowMap(p / w) * w + p % w
              out(3 * q) = pal(off); out(3 * q + 1) = pal(off + 1); out(3 * q + 2) = pal(off + 2)
              p += 1
            }
            return (w, h, 3, out)
          case 0x3b => return null // trailer before any image
          case _ => return null // unknown block: stream is corrupt
        }
      }
      null
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  /** GIF LZW decoder: `off` points at the minimum-code-size byte;
    * reads the following data sub-blocks as an LSB-first bit stream
    * of variable-width codes (growing to at most 12 bits), expanding
    * the standard dictionary until `nPixels` indices are produced.
    * Returns null on any malformed stream — out-of-range codes,
    * truncation, or a missing palette index are data bugs at 100 TB,
    * not crash-worthy events.
    */
  private def gifLzwDecode(b: Array[Byte], off: Int, nPixels: Int): Array[Byte] = {
    val minCode = b(off) & 0xff
    if (minCode < 2 || minCode > 11) return null
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream
    var i = off + 1
    while (i < b.length && (b(i) & 0xff) != 0) {
      val n = b(i) & 0xff
      if (i + 1 + n > b.length) return null
      data.write(b, i + 1, n)
      i += 1 + n
    }
    val bytes = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte); entries < clear are roots
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    def readCode(): Int = {
      if (bitPos + width > bytes.length * 8) return -1
      var v = 0; var k = 0
      while (k < width) {
        val bit = (bytes((bitPos + k) >> 3) >> ((bitPos + k) & 7)) & 1
        v |= bit << k
        k += 1
      }
      bitPos += width
      v
    }
    // scratch for one expanded sequence (a dictionary chain is < 4096)
    val seq = new Array[Byte](4096)
    def expandSeq(code: Int): Int = { // returns length, sequence left-aligned in seq
      var c = code; var n = 0
      while (c >= clear) { seq(n) = append(c); n += 1; c = prefix(c) }
      seq(n) = c.toByte; n += 1
      // reverse in place (walk produced it tail-first)
      var a = 0; var z = n - 1
      while (a < z) { val t = seq(a); seq(a) = seq(z); seq(z) = t; a += 1; z -= 1 }
      n
    }
    val out = new Array[Byte](nPixels)
    var filled = 0
    var prev = -1
    while (filled < nPixels) {
      val code = readCode()
      if (code < 0 || code > next || code == eoi) return null // truncated / corrupt / early EOI
      if (code == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else {
        if (prev < 0 && code >= clear) return null // first code after clear must be a root
        val n =
          if (code == next) { // KwKwK: the code being defined right now
            if (prev < 0 || next >= 4096) return null
            prefix(next) = prev
            append(next) = { var c = prev; while (c >= clear) c = prefix(c); c.toByte }
            next += 1
            expandSeq(code)
          } else {
            val len = expandSeq(code)
            if (prev >= 0 && next < 4096) {
              prefix(next) = prev
              append(next) = seq(0)
              next += 1
            }
            len
          }
        val copy = math.min(n, nPixels - filled)
        System.arraycopy(seq, 0, out, filled, copy)
        filled += copy
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    out
  }

  /** Decoded-image summary features: pixel count + exact per-channel
    * means. `mean_a` is null for RGB images (no alpha channel), all
    * fields null when the payload doesn't decode. Channel sums are
    * exact Long integers; the single double division is
    * IEEE-deterministic, so an external engine reproduces every mean
    * bit-for-bit from the same pixels.
    */
  case class ImageFeatures(
      n_pixels: Option[Long],
      mean_r: Option[Double],
      mean_g: Option[Double],
      mean_b: Option[Double],
      mean_a: Option[Double])

  private val noImage = ImageFeatures(None, None, None, None, None)

  /** Format-sniffing decode dispatch over every REAL pixel decoder.
    * Null for undecodable payloads.
    */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) =
    parseMediaHeader(payload).format match {
      case "png" => decodePngPixels(payload)
      case "gif" => decodeGifPixels(payload)
      case "jpeg" => Jpeg.decodePixels(payload, maxPngRawBytes)
      case _ => null
    }

  def imagePixelFeatures(payload: Array[Byte]): ImageFeatures = {
    val dec = decodeImage(payload)
    if (dec == null) return noImage
    val (w, h, bpp, px) = dec
    val n = w.toLong * h
    if (n == 0) return noImage
    val sums = new Array[Long](bpp)
    var i = 0
    while (i < px.length) {
      sums(i % bpp) += (px(i) & 0xff)
      i += 1
    }
    ImageFeatures(
      Some(n),
      Some(sums(0).toDouble / n),
      if (bpp >= 3) Some(sums(1).toDouble / n) else None,
      if (bpp >= 3) Some(sums(2).toDouble / n) else None,
      if (bpp == 4) Some(sums(3).toDouble / n) else None)
  }

  private val imageFeaturesUdf = udf((payload: Array[Byte]) => imagePixelFeatures(payload))

  /** Column form: attach decoded-pixel features from a PNG, GIF or
    * baseline-JPEG payload column. Per-row decode, no shuffle;
    * undecodable rows get nulls.
    */
  def withImageFeatures(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__if__", imageFeaturesUdf(col(payloadCol).cast("binary")))
      .withColumn("n_pixels", col("__if__.n_pixels"))
      .withColumn("mean_r", col("__if__.mean_r"))
      .withColumn("mean_g", col("__if__.mean_g"))
      .withColumn("mean_b", col("__if__.mean_b"))
      .withColumn("mean_a", col("__if__.mean_a"))
      .drop("__if__")

  /** REAL image embedding from decoded pixels: adaptive-pool the
    * pixel intensities over a `grid` x `grid` thumbnail (pixel (x, y)
    * lands in cell `(y*grid/h, x*grid/w)` — the standard adaptive
    * average-pooling assignment), one feature per cell in [0, 1].
    * Intensity is the sum of the first three channels (3x the value
    * for grayscale, keeping scales comparable across formats); cell
    * sums are exact Long integers and the single double division +
    * float32 rounding is IEEE-deterministic, so the DuckDB oracle
    * reproduces every value bit-for-bit from the closed-form fixture
    * pixels. Null when the payload doesn't decode.
    *
    * This is a real, useful embedding — downstream it feeds the same
    * `Array[Float]` surface as [[Similarity]] ANN search and
    * [[Dedup.embeddingNearDups]], giving near-dup detection over
    * image corpora with no model dependency (and it is exactly the
    * shape a learned visual embedding would slot into).
    */
  def imageEmbedding(payload: Array[Byte], grid: Int): Array[Float] = {
    val dec = decodeImage(payload)
    if (dec == null) return null
    val (w, h, bpp, px) = dec
    val g = grid
    val sums = new Array[Long](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val cy = y * g / h
      var x = 0
      while (x < w) {
        val cell = cy * g + x * g / w
        val base = (y * w + x) * bpp
        val inten =
          if (bpp == 1) 3 * (px(base) & 0xff)
          else (px(base) & 0xff) + (px(base + 1) & 0xff) + (px(base + 2) & 0xff)
        sums(cell) += inten
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g) { c =>
      if (counts(c) == 0) 0f else (sums(c) / (765.0 * counts(c))).toFloat
    }
  }

  /** Column form: attach the decoded-pixel thumbnail embedding.
    * Per-row decode, no shuffle; undecodable rows get null (filter or
    * fall back to [[decodeStub]] as the pipeline requires).
    */
  def withImageEmbedding(df: DataFrame, payloadCol: String, grid: Int = 8): DataFrame = {
    val g = grid
    val embedUdf = udf((payload: Array[Byte]) => imageEmbedding(payload, g))
    df.withColumn("embedding", embedUdf(col(payloadCol).cast("binary")))
  }

  /** Extract the video trak's sample table from an MP4 payload — the
    * REAL frame map, no decode: `stsz` (per-sample sizes), `stco` /
    * `co64` (chunk base offsets), `stsc` (samples-per-chunk runs) and
    * `stss` (sync samples; absent = every sample is a keyframe)
    * compose into one `FrameRef` per sample with its absolute byte
    * range. Samples whose declared range falls outside the payload
    * are dropped (lying tables are data at 100 TB); non-MP4 or
    * table-less payloads return null.
    */
  /** Hard cap on sample-table length per payload: the uniform-stsz
    * form carries no table bytes, so a 12-byte header could otherwise
    * declare a count whose Array allocation OOMs the executor before
    * any catch fires. 4M frames ≈ 46 h of 24 fps video in one
    * in-memory payload — anything above is a lying header.
    */
  private val maxSamplesPerPayload: Int = 4 * 1024 * 1024

  def mp4SampleTable(b: Array[Byte]): Array[FrameRef] = {
    if (b == null || b.length < 12 || ascii(b, 4, 4) != "ftyp") return null
    try {
      var sizes: Array[Int] = null
      var chunkOffs: Array[Long] = null
      var stscRuns: Array[(Int, Int)] = null // (first_chunk 1-based, samples per chunk)
      var sync: java.util.HashSet[Int] = null
      val claimed = visitVideoTrak(b)(
        begin = () => { sizes = null; chunkOffs = null; stscRuns = null; sync = null },
        onTkhd = (_, _) => (),
        onStblChild = (t6, s6, e6) => {
          // every entry count is validated against the box's own
          // extent (and the global sample cap) before allocating: a
          // lying count must not drive an allocation
          if (t6 == "stsz" && e6 - s6 >= 12) {
            val uniform = u32be(b, s6 + 4)
            val n = u32be(b, s6 + 8)
            if (uniform > 0 && uniform <= Int.MaxValue) {
              // uniform-size form carries no table; bound n by the
              // payload (it cannot hold more samples) AND the cap
              val cap = math.min(math.min(n, b.length / math.max(uniform, 1L)),
                maxSamplesPerPayload.toLong)
              sizes = Array.fill(cap.toInt)(uniform.toInt)
            } else if (uniform == 0 && n * 4 <= e6 - s6 - 12 && n <= maxSamplesPerPayload)
              sizes = Array.tabulate(n.toInt)(k => u32be(b, s6 + 12 + 4 * k).toInt)
          } else if (t6 == "stco" && e6 - s6 >= 8) {
            val n = u32be(b, s6 + 4)
            if (n * 4 <= e6 - s6 - 8)
              chunkOffs = Array.tabulate(n.toInt)(k => u32be(b, s6 + 8 + 4 * k))
          } else if (t6 == "co64" && e6 - s6 >= 8) {
            val n = u32be(b, s6 + 4)
            if (n * 8 <= e6 - s6 - 8)
              chunkOffs = Array.tabulate(n.toInt)(k => u64be(b, s6 + 8 + 8 * k))
          } else if (t6 == "stsc" && e6 - s6 >= 8) {
            val n = u32be(b, s6 + 4)
            if (n * 12 <= e6 - s6 - 8)
              stscRuns = Array.tabulate(n.toInt)(k =>
                (u32be(b, s6 + 8 + 12 * k).toInt, u32be(b, s6 + 12 + 12 * k).toInt))
          } else if (t6 == "stss" && e6 - s6 >= 8) {
            val n = u32be(b, s6 + 4)
            if (n * 4 <= e6 - s6 - 8) {
              sync = new java.util.HashSet[Int]()
              var k = 0
              while (k < n) { sync.add(u32be(b, s6 + 8 + 4 * k).toInt); k += 1 }
            }
          }
        },
        hasData = () => sizes != null)
      if (!claimed || sizes == null || chunkOffs == null || stscRuns == null ||
          sizes.isEmpty || chunkOffs.isEmpty || stscRuns.isEmpty) return null
      val out = Array.newBuilder[FrameRef]
      var sample = 0
      var run = 0
      var chunk = 0 // 0-based
      while (sample < sizes.length && chunk < chunkOffs.length) {
        // advance to the stsc run covering this chunk (first_chunk is 1-based)
        while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk + 1) run += 1
        val spc = math.max(stscRuns(run)._2, 1)
        var off = chunkOffs(chunk)
        var k = 0
        while (k < spc && sample < sizes.length) {
          val sz = sizes(sample)
          if (sz >= 0 && off >= 0 && off + sz <= b.length)
            out += FrameRef(sample, off,
              sz, sync == null || sync.contains(sample + 1))
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      val refs = out.result()
      if (refs.isEmpty) null else refs
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  /** The AVI twin of [[mp4SampleTable]]: parse the `idx1` index
    * (AVI 1.0, the OpenDML-less form real CommonCrawl-era files
    * carry) into one `FrameRef` per VIDEO chunk — entries whose
    * FOURCC is `##dc`/`##db` (compressed/uncompressed video data).
    * Each 16-byte entry is (ckid, flags, offset, length); keyframes
    * carry AVIIF_KEYFRAME (0x10). The offset field has two
    * conventions in the wild — relative to the `movi` list's fourcc
    * (classic) or absolute from file start — disambiguated the way
    * every real demuxer does: whichever interpretation lands on this
    * entry's own chunk FOURCC. Entries whose resolved byte range
    * falls outside the payload are dropped without renumbering
    * (lying indexes are data at 100 TB); non-AVI or index-less
    * payloads return null.
    */
  def aviSampleTable(b: Array[Byte]): Array[FrameRef] = {
    if (b == null || b.length < 12 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "AVI ")
      return null
    try {
      var moviPos = -1L // position of the 'movi' fourcc
      var idxStart = -1; var idxEnd = -1
      var i = 12
      while (i + 8 <= b.length) {
        val id = ascii(b, i, 4)
        val size = u32le(b, i + 4)
        if (size > Int.MaxValue - 16) return null
        if (id == "LIST" && i + 12 <= b.length && ascii(b, i + 8, 4) == "movi") moviPos = i + 8
        if (id == "idx1" && idxStart < 0) {
          idxStart = i + 8
          idxEnd = math.min(b.length.toLong, i + 8 + size).toInt
        }
        i += 8 + size.toInt + (size.toInt & 1)
      }
      if (idxStart < 0 || (idxEnd - idxStart) / 16 > maxSamplesPerPayload) return null
      def isVideoId(ckid: String): Boolean = ckid.length == 4 &&
        ckid(0) >= '0' && ckid(0) <= '9' && ckid(1) >= '0' && ckid(1) <= '9' &&
        (ckid.endsWith("dc") || ckid.endsWith("db"))
      // decide the offset convention ONCE, from the first video
      // entry (the way real demuxers do): per-entry guessing would
      // mix conventions when a late absolute offset happens to land
      // on one of the idx1 region's own literal fourccs
      var relative = false
      var e = idxStart
      var decided = false
      while (!decided && e + 16 <= idxEnd) {
        val ckid = ascii(b, e, 4)
        if (isVideoId(ckid)) {
          val off = u32le(b, e + 8)
          relative = moviPos >= 0 && moviPos + off + 8 <= b.length &&
            ascii(b, (moviPos + off).toInt, 4) == ckid
          decided = true
        }
        e += 16
      }
      val out = Array.newBuilder[FrameRef]
      var fi = 0
      e = idxStart
      while (e + 16 <= idxEnd) {
        val ckid = ascii(b, e, 4)
        if (isVideoId(ckid)) {
          val flags = u32le(b, e + 4)
          val off = u32le(b, e + 8)
          val len = u32le(b, e + 12)
          val hdr = if (relative) moviPos + off else off
          if (hdr >= 0 && hdr + 8 <= b.length && ascii(b, hdr.toInt, 4) == ckid &&
              len <= Int.MaxValue - 16 && hdr + 8 + len <= b.length)
            out += FrameRef(fi, hdr + 8, len.toInt, (flags & 0x10) != 0)
          fi += 1
        }
        e += 16
      }
      val refs = out.result()
      if (refs.isEmpty) null else refs
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  /** Container-dispatching frame map: MP4 via the sample tables, AVI
    * via idx1, anything else null.
    */
  def videoSampleTable(b: Array[Byte]): Array[FrameRef] =
    if (b == null || b.length < 12) null
    else if (ascii(b, 4, 4) == "ftyp") mp4SampleTable(b)
    else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "AVI ") aviSampleTable(b)
    else null

  private val sampleTableUdf = udf((payload: Array[Byte]) => videoSampleTable(payload))

  /** Explode a video payload column (MP4 sample tables or AVI idx1)
    * into its REAL frame map: one row per sample with `(frame_idx,
    * offset, n_bytes, is_keyframe, frame_digest)`. The digest is md5
    * over the HEX encoding of the sample's bytes (the
    * [[sampleFrames]] convention: hex is a faithful byte encoding
    * reproducible in any engine, so the operator is oracle-checkable
    * end to end), computed by codegen'd builtins over the exploded
    * table — the UDF only parses the index. Per-row work, no
    * shuffle; non-video rows vanish (explode of null), which is the
    * filter a mixed-media corpus wants.
    */
  def videoFrames(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), col("__pl__"),
        explode(sampleTableUdf(col("__pl__"))).as("__s__"))
      .select(
        col(idCol),
        col("__s__.frame_idx").as("frame_idx"),
        col("__s__.offset").as("offset"),
        col("__s__.n_bytes").as("n_bytes"),
        col("__s__.is_keyframe").as("is_keyframe"),
        md5(hex(expr("substring(__pl__, CAST(__s__.offset + 1 AS INT), __s__.n_bytes)")))
          .as("frame_digest"))

  /** Wrap a binary column with extracted metadata: bookkeeping fields
    * (length/digest — codegen'd, no decode) plus the REAL parsed
    * container header (format, dims, audio params) from
    * `parseMediaHeader`. The declared `mime` parameter is the
    * caller's transport-level content type; `format` is what the
    * bytes actually are — keeping both is deliberate (mislabeled
    * payloads are a real 100 TB phenomenon worth filtering on).
    */
  def withMediaMetadata(df: DataFrame, payloadCol: String, mime: String): DataFrame =
    df.withColumn("mime", lit(mime))
      .withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("digest", md5(col(payloadCol)))
      .withColumn("__hdr__", parseHeaderUdf(col(payloadCol).cast("binary")))
      .withColumn("format", col("__hdr__.format"))
      .withColumn("width", col("__hdr__.width"))
      .withColumn("height", col("__hdr__.height"))
      .withColumn("sample_rate", col("__hdr__.sample_rate"))
      .withColumn("channels", col("__hdr__.channels"))
      .withColumn("bits_per_sample", col("__hdr__.bits_per_sample"))
      .withColumn("duration_ms", col("__hdr__.duration_ms"))
      .withColumn("n_frames", col("__hdr__.n_frames"))
      .drop("__hdr__")

  /** Deterministic fake "decode": feature d is the mean normalized
    * byte value over the stride lane `i % dims == d` (0 when the lane
    * is empty). Stands in for feature extraction over payloads the
    * engine canNOT decode (video, exotic codecs) — for PNG/GIF/
    * baseline-JPEG images [[imageEmbedding]] is the REAL
    * decoded-pixel path; a learned model would replace ONLY this
    * body for the rest.
    *
    * Numerically integer-exact by construction — lane sums are exact
    * Long integers and the single double division + float32 rounding
    * is IEEE-deterministic, so an external engine (the DuckDB oracle)
    * reproduces every value bit-for-bit from the same bytes.
    */
  def decodeStub(payload: Array[Byte], dims: Int): Array[Float] = {
    if (payload == null) return Array.fill(dims)(0f)
    val sums = new Array[Long](dims)
    val counts = new Array[Long](dims)
    var i = 0
    while (i < payload.length) {
      sums(i % dims) += (payload(i) & 0xff)
      counts(i % dims) += 1
      i += 1
    }
    Array.tabulate(dims) { d =>
      if (counts(d) == 0) 0f else (sums(d) / (255.0 * counts(d))).toFloat
    }
  }

  /** Feature extraction over a binary column as a column expression:
    * all other columns stay in the plan (the previous version dropped
    * to `df.rdd`, losing Tungsten and every non-id column). A real
    * codec with heavyweight init would instead use `mapPartitions`
    * over a projected Dataset (init once per task) and join back by
    * id — for the stub, a deterministic scalar function suffices.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dims: Int = 16
  ): DataFrame = {
    val d = dims
    val featUdf = udf((payload: Array[Byte]) => decodeStub(payload, d))
    df.withColumn("features", featUdf(col(payloadCol).cast("binary")))
  }

  /** Frame-sampling stub for video-like payloads: splits the payload
    * into `frames` equal byte windows (stand-in for keyframe
    * extraction) and explodes one row per frame with its digest.
    *
    * The digest is md5 over the HEX encoding of the byte window, not
    * the raw bytes: hex is a faithful byte encoding, the window can
    * split a payload anywhere (no UTF-8 validity concern), and a
    * string md5 is reproducible in any engine — so the operator is
    * oracle-checkable end to end. The hex string is staged once per
    * row before the per-frame explode.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, frames: Int): DataFrame = {
    // explicit floor: `/` is double division in Spark SQL, and an
    // implicit double->int cast truncates here but ROUNDS in other
    // engines — integer positions keep the operator oracle-portable
    val n = octet_length(col(payloadCol))
    val step = greatest(floor(n / frames), lit(1L))
    df.select(col(idCol), hex(col(payloadCol)).as("__hex__"), step.as("__step__"))
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(frames - 1)),
            // positions stay in LONG arithmetic (int i promotes against
            // the long step) with ONE final narrowing cast, which is
            // exact for every payload this operator can represent:
            // substr demands int positions, and a position only exceeds
            // Int.MaxValue for payloads >= ~1 GiB — where hex() itself
            // already fails (the doubled hex string would exceed the
            // JVM's max string length)
            i => md5(col("__hex__").substr(
              (i.cast("long") * col("__step__") * 2L + 1L).cast("int"),
              (col("__step__") * 2L).cast("int")))
          )
        ).as(Seq("frame_idx", "frame_digest"))
      )
  }
}
