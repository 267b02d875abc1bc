package graft.pipeline

/** Baseline JPEG (SOF0) decoder — REAL entropy decode, pure JVM, no
  * codec library: canonical Huffman tables from DHT segments,
  * dequantization from DQT, a double-precision separable IDCT, and
  * the JFIF YCbCr->RGB transform, all from the public ITU-T T.81 /
  * JFIF specifications (reference header-parses JPEG but never
  * decodes it; see /root/reference/pd_utils there is no analog —
  * this is the training-pipeline extension surface).
  *
  * Scope: 8-bit baseline sequential, grayscale (1 component, any
  * declared sampling — a single-component scan is never interleaved)
  * or YCbCr with 1x1 chroma and luma sampling up to 2x2 — i.e.
  * 4:4:4, 4:2:2, 4:4:0 and the near-universal 4:2:0 — with restart
  * markers (DRI/RSTn) and FF00 byte stuffing. Subsampled chroma is
  * reconstructed with the public triangle-filter ("fancy")
  * upsampling the IJG decoder uses, so output matches libjpeg-based
  * decoders to IDCT tolerance. Progressive (SOF2), arithmetic
  * coding, 12-bit precision and exotic sampling grids return null
  * rather than decode wrong; so does any corrupt or truncated
  * stream — at 100 TB poison payloads are data, not crashes.
  */
object Jpeg {

  /** Zig-zag scan order: `zigzag(k)` is the natural (row-major) index
    * of the k-th coefficient in the entropy-coded stream (T.81 Fig 5).
    */
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable (I)DCT basis: `basis(u)(x) = 0.5 * c_u *
    * cos((2x+1)u*pi/16)` with `c_0 = 1/sqrt(2)` — applying it along
    * both axes gives the T.81 IDCT; the forward DCT is the transpose
    * (the fixture encoder in `graft.testing.MediaFixture` reuses it).
    */
  val basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table in T.81 F.2.2.3 decode form. `counts` is
    * 1-indexed code counts per bit length; `vals` the symbols in code
    * order.
    */
  private final class HuffTable(counts: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (counts(len) > 0) {
          valptr(len) = k
          mincode(len) = code
          code += counts(len)
          k += counts(len)
          maxcode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  /** MSB-first bit reader over entropy-coded data: 0xFF00 is a
    * stuffed 0xFF data byte; 0xFF followed by anything else is a
    * marker terminating the bit stream. Returns -1 bits on
    * exhaustion/marker (decoders treat that as corrupt input).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    private var markerCode = -1

    def nextBit(): Int = {
      if (cnt == 0) {
        if (markerCode >= 0 || pos >= b.length) return -1
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff; pos += 1
          if (m != 0x00) { markerCode = m; return -1 }
          v = 0xff
        }
        acc = v; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    /** At a restart boundary: discard padding bits, consume the
      * expected RSTn marker (fill 0xFFs allowed). False = corrupt.
      */
    def expectRst(n: Int): Boolean = {
      cnt = 0
      if (markerCode >= 0) { // already consumed while draining bits
        val ok = markerCode == 0xd0 + n
        markerCode = -1
        return ok
      }
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      var m = pos + 1
      while (m < b.length && (b(m) & 0xff) == 0xff) m += 1
      if (m >= b.length || (b(m) & 0xff) != (0xd0 + n)) return false
      pos = m + 1
      true
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      if (code < 0) return -1
      var len = 1
      while (code > t.maxcode(len)) {
        val bit = nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        len += 1
        if (len > 16) return -1
      }
      t.vals(t.valptr(len) + code - t.mincode(len))
    }

    /** Read `s` magnitude bits; Int.MinValue on exhaustion. */
    def receive(s: Int): Int = {
      var v = 0
      var k = 0
      while (k < s) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        k += 1
      }
      v
    }
  }

  /** T.81 EXTEND: map `s` magnitude bits to a signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Decode a baseline JPEG to packed pixel bytes: `(width, height,
    * bpp, bytes)` with bpp 1 (grayscale) or 3 (RGB via the JFIF
    * YCbCr transform). Null for anything outside the supported
    * baseline scope, corrupt/truncated streams, or dims past the
    * allocation cap.
    */
  def decodePixels(b: Array[Byte], maxRawBytes: Int): (Int, Int, Int, Array[Byte]) = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8 || (b(2) & 0xff) != 0xff) return null
    try {
      val quant = new Array[Array[Int]](4) // zigzag order, as stored
      val dcTab = new Array[HuffTable](4)
      val acTab = new Array[HuffTable](4)
      var restartInterval = 0
      var w = 0; var h = 0; var nComp = 0
      var frameIds: Array[Int] = null // component id -> quant table
      var frameQ: Array[Int] = null
      var frameH: Array[Int] = null // per-component sampling factors
      var frameV: Array[Int] = null
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return null
        val marker = b(j) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i = j + 1 // standalone marker, no length
        } else if (marker == 0xd9) {
          return null // EOI before any scan
        } else if (marker == 0xc0) { // SOF0: baseline frame
          if (b(j + 3) != 8) return null // sample precision
          h = u16be(b, j + 4); w = u16be(b, j + 6)
          nComp = b(j + 8) & 0xff
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return null
          frameIds = new Array[Int](nComp)
          frameQ = new Array[Int](nComp)
          frameH = new Array[Int](nComp)
          frameV = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            frameIds(c) = b(j + 9 + 3 * c) & 0xff
            val samp = b(j + 10 + 3 * c) & 0xff
            frameH(c) = samp >> 4; frameV(c) = samp & 0x0f
            // single-component scans are never interleaved, so the
            // declared sampling is irrelevant there; 3-component
            // needs 1x1 chroma and luma factors of 1 or 2
            if (nComp == 1) { frameH(c) = 1; frameV(c) = 1 }
            else if (c == 0) {
              if (frameH(0) < 1 || frameH(0) > 2 || frameV(0) < 1 || frameV(0) > 2) return null
            } else if (samp != 0x11) return null
            frameQ(c) = b(j + 11 + 3 * c) & 0xff
            if (frameQ(c) > 3) return null
            c += 1
          }
          i = j + 1 + u16be(b, j + 1)
        } else if (marker >= 0xc1 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return null // progressive / extended / arithmetic: out of scope
        } else if (marker == 0xc4) { // DHT: one or more tables
          val end = j + 1 + u16be(b, j + 1)
          var p = j + 3
          while (p < end) {
            val tcth = b(p) & 0xff
            val counts = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { counts(l) = b(p + l) & 0xff; total += counts(l); l += 1 }
            if (total > 256 || p + 17 + total > end) return null
            val vals = new Array[Int](total)
            var k = 0
            while (k < total) { vals(k) = b(p + 17 + k) & 0xff; k += 1 }
            val t = new HuffTable(counts, vals)
            val id = tcth & 0x0f
            if (id > 3) return null
            if ((tcth >> 4) == 0) dcTab(id) = t
            else if ((tcth >> 4) == 1) acTab(id) = t
            else return null
            p += 17 + total
          }
          i = end
        } else if (marker == 0xdb) { // DQT: one or more tables
          val end = j + 1 + u16be(b, j + 1)
          var p = j + 3
          while (p < end) {
            val pqtq = b(p) & 0xff
            val id = pqtq & 0x0f
            if (id > 3) return null
            val tab = new Array[Int](64)
            if ((pqtq >> 4) == 0) {
              var k = 0
              while (k < 64) { tab(k) = b(p + 1 + k) & 0xff; k += 1 }
              p += 65
            } else if ((pqtq >> 4) == 1) {
              var k = 0
              while (k < 64) { tab(k) = u16be(b, p + 1 + 2 * k); k += 1 }
              p += 129
            } else return null
            quant(id) = tab
          }
          i = end
        } else if (marker == 0xdd) { // DRI
          restartInterval = u16be(b, j + 3)
          i = j + 1 + u16be(b, j + 1)
        } else if (marker == 0xda) { // SOS: decode the scan and return
          if (frameIds == null) return null
          val ns = b(j + 3) & 0xff
          if (ns != nComp) return null
          val compDc = new Array[HuffTable](nComp)
          val compAc = new Array[HuffTable](nComp)
          val compQt = new Array[Array[Int]](nComp)
          var k = 0
          while (k < ns) {
            val cs = b(j + 4 + 2 * k) & 0xff
            val c = frameIds.indexOf(cs)
            if (c < 0) return null
            val tt = b(j + 5 + 2 * k) & 0xff
            compDc(c) = dcTab(tt >> 4)
            compAc(c) = acTab(tt & 0x0f)
            compQt(c) = quant(frameQ(c))
            if (compDc(c) == null || compAc(c) == null || compQt(c) == null) return null
            k += 1
          }
          // baseline spectral selection must be the full 0..63 band
          if ((b(j + 4 + 2 * ns) & 0xff) != 0 || (b(j + 5 + 2 * ns) & 0xff) != 63) return null
          val scanStart = j + 1 + u16be(b, j + 1)
          return decodeScan(b, scanStart, w, h, nComp, compDc, compAc, compQt,
            frameH, frameV, restartInterval, maxRawBytes)
        } else { // APPn / COM / anything else with a length field
          val segLen = u16be(b, j + 1)
          if (segLen < 2) return null
          i = j + 1 + segLen
        }
      }
      null
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  private def decodeScan(
      b: Array[Byte], scanStart: Int, w: Int, h: Int, nComp: Int,
      compDc: Array[HuffTable], compAc: Array[HuffTable], compQt: Array[Array[Int]],
      compH: Array[Int], compV: Array[Int],
      restartInterval: Int, maxRawBytes: Int): (Int, Int, Int, Array[Byte]) = {
    val maxH = compH(0) // chroma is 1x1, so luma carries the max
    val maxV = compV(0)
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // per-component padded plane dims (component resolution)
    val pw = Array.tabulate(nComp)(c => mcusX * 8 * compH(c))
    val ph = Array.tabulate(nComp)(c => mcusY * 8 * compV(c))
    var planeBytes = 0L
    var cc = 0
    while (cc < nComp) { planeBytes += pw(cc).toLong * ph(cc); cc += 1 }
    if (planeBytes > maxRawBytes || w.toLong * h * nComp > maxRawBytes) return null
    val planes = Array.tabulate(nComp)(c => new Array[Byte](pw(c) * ph(c)))
    val reader = new BitReader(b, scanStart)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64) // natural order, dequantized
    val tmp = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!reader.expectRst((mcu / restartInterval - 1) % 8)) return null
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          // T.81 interleave order: all of this component's hi*vi
          // blocks for the MCU, raster order within the MCU
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val q = compQt(c)
              val t = reader.decodeHuff(compDc(c))
              if (t < 0 || t > 11) return null
              val db = reader.receive(t)
              if (db == Int.MinValue) return null
              dcPred(c) += extend(db, t)
              coef(0) = dcPred(c) * q(0)
              var k = 1
              while (k < 64) {
                val rs = reader.decodeHuff(compAc(c))
                if (rs < 0) return null
                val s = rs & 0x0f
                if (s == 0) {
                  if (rs == 0x00) k = 64 // EOB
                  else if (rs == 0xf0) k += 16 // ZRL: 16 zeros
                  else return null
                } else {
                  k += (rs >> 4)
                  if (k > 63) return null
                  val vb = reader.receive(s)
                  if (vb == Int.MinValue) return null
                  coef(zigzag(k)) = extend(vb, s) * q(k)
                  k += 1
                }
              }
              idctBlock(coef, tmp, planes(c), pw(c),
                (mx * compH(c) + bx) * 8, (my * compV(c) + by) * 8)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // crop padded planes and color-convert
    if (nComp == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw(0), out, y * w, w)
        y += 1
      }
      (w, h, 1, out)
    } else {
      // bring chroma to full resolution first
      val full = new Array[Array[Byte]](3)
      full(0) = planes(0)
      val fw = new Array[Int](3)
      fw(0) = pw(0)
      var ci = 1
      while (ci < 3) {
        val sx = maxH / compH(ci)
        val sy = maxV / compV(ci)
        if (sx == 1 && sy == 1) {
          full(ci) = planes(ci)
          fw(ci) = pw(ci) // padded stride, indexed directly
        } else {
          val sw = (w + sx - 1) / sx // true downsampled dims (crop first,
          val sh = (h + sy - 1) / sy // exactly as libjpeg does)
          full(ci) = upsample(planes(ci), pw(ci), sw, sh, sx, sy)
          fw(ci) = sw * sx
        }
        ci += 1
      }
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = full(0)(y * fw(0) + x) & 0xff
          val cb = (full(1)(y * fw(1) + x) & 0xff) - 128
          val cr = (full(2)(y * fw(2) + x) & 0xff) - 128
          val o = (y * w + x) * 3
          out(o) = clamp255(math.round(yy + 1.402 * cr)).toByte
          out(o + 1) = clamp255(math.round(yy - 0.344136 * cb - 0.714136 * cr)).toByte
          out(o + 2) = clamp255(math.round(yy + 1.772 * cb)).toByte
          x += 1
        }
        y += 1
      }
      (w, h, 3, out)
    }
  }

  /** Upsample a chroma plane by (sx, sy) in {1,2}x{1,2}. The plane is
    * stored padded to `planeW` wide; only the top-left `sw` x `sh`
    * (the true downsampled dims) participate, exactly as libjpeg
    * crops before upsampling. 2x paths use the IJG triangle-filter
    * ("fancy") weights — 3:1 horizontally, 9:3:3:1 for 2x2 — with
    * the same edge replication and rounding, so output matches
    * libjpeg-based decoders; vertical-only 2x uses replication, as
    * libjpeg does for that rare grid.
    */
  private def upsample(plane: Array[Byte], planeW: Int, sw: Int, sh: Int,
                       sx: Int, sy: Int): Array[Byte] = {
    if (sx == 1 && sy == 1) return plane
    def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= sw) sw - 1 else x
      val cy = if (y < 0) 0 else if (y >= sh) sh - 1 else y
      plane(cy * planeW + cx) & 0xff
    }
    if (sx == 2 && sy == 1) {
      val out = new Array[Byte](2 * sw * sh)
      var y = 0
      while (y < sh) {
        var x = 0
        while (x < sw) {
          val c = at(x, y)
          out(y * 2 * sw + 2 * x) = ((3 * c + at(x - 1, y) + 1) >> 2).toByte
          out(y * 2 * sw + 2 * x + 1) = ((3 * c + at(x + 1, y) + 2) >> 2).toByte
          x += 1
        }
        y += 1
      }
      out
    } else if (sx == 1 && sy == 2) {
      val out = new Array[Byte](sw * 2 * sh)
      var y = 0
      while (y < sh) {
        var x = 0
        while (x < sw) {
          val v = at(x, y).toByte
          out(2 * y * sw + x) = v
          out((2 * y + 1) * sw + x) = v
          x += 1
        }
        y += 1
      }
      out
    } else { // 2x2: column sums 3:1 vertically, then 3:1 horizontally
      val out = new Array[Byte](2 * sw * 2 * sh)
      var oy = 0
      while (oy < 2 * sh) {
        val y = oy >> 1
        val yn = if ((oy & 1) == 0) y - 1 else y + 1 // nearer source row
        def colsum(x: Int): Int = 3 * at(x, y) + at(x, yn)
        var x = 0
        while (x < sw) {
          val c = colsum(x)
          out(oy * 2 * sw + 2 * x) = ((3 * c + colsum(x - 1) + 8) >> 4).toByte
          out(oy * 2 * sw + 2 * x + 1) = ((3 * c + colsum(x + 1) + 7) >> 4).toByte
          x += 1
        }
        oy += 1
      }
      out
    }
  }

  /** IDCT one block of natural-order dequantized coefficients into
    * the plane at (x0, y0): two passes of the separable basis, then
    * level shift +128, round, clamp.
    */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
                        plane: Array[Byte], pw: Int, x0: Int, y0: Int): Unit = {
    // rows of tmp indexed [v][x]: contract over u
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += basis(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += basis(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        plane((y0 + y) * pw + x0 + x) = clamp255(math.round(acc + 128.0)).toByte
        x += 1
      }
      y += 1
    }
  }
}
