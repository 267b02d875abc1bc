package graft.pipeline

/** JPEG decoder — REAL entropy decode, pure JVM, no codec library:
  * canonical Huffman tables from DHT segments, dequantization from
  * DQT, a double-precision separable IDCT, and the JFIF YCbCr->RGB
  * transform, all from the public ITU-T T.81 / JFIF specifications
  * (the reference header-parses JPEG but never decodes it; this is
  * the training-pipeline extension surface).
  *
  * Scope: 8-bit baseline sequential (SOF0) AND progressive (SOF2) —
  * spectral selection + successive approximation, DC/AC first and
  * refinement scans, EOB runs — for grayscale (1 component, any
  * declared sampling: a single-component scan is never interleaved)
  * or YCbCr with 1x1 chroma and luma sampling up to 2x2, i.e. 4:4:4,
  * 4:2:2, 4:4:0 and the near-universal 4:2:0. Restart markers
  * (DRI/RSTn) and FF00 byte stuffing are handled in every scan kind.
  * Subsampled chroma is reconstructed with the public
  * triangle-filter ("fancy") upsampling the IJG decoder uses, so
  * output matches libjpeg-based decoders to IDCT tolerance.
  * Arithmetic coding, 12-bit precision, hierarchical frames and
  * exotic sampling grids return null rather than decode wrong; so
  * does any corrupt or truncated stream — at 100 TB poison payloads
  * are data, not crashes.
  *
  * Decoding stages whole-image coefficients (the structure
  * progressive scans require; baseline shares it), so peak memory is
  * ~5x the decoded plane bytes — both are bounded by the caller's
  * allocation cap.
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
      if (t == null) return -1
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

  /** Skip the entropy-coded data that starts at `p`: stuffed 0xFF00
    * bytes and RST0-7 markers are part of the stream; the first other
    * marker ends it. Returns the index of that marker's 0xFF (or the
    * array end on truncation).
    */
  private def skipEntropy(b: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) p += 2
        else if (m == 0xff) p += 1 // fill byte
        else return p
      } else p += 1
    }
    b.length
  }

  // Exception-free failure signalling inside the scan decoder: the
  // methods return Boolean and the caller nulls out.

  /** Decode a baseline or progressive JPEG to packed pixel bytes:
    * `(width, height, bpp, bytes)` with bpp 1 (grayscale) or 3 (RGB
    * via the JFIF YCbCr transform). Null for anything outside the
    * supported scope, corrupt/truncated streams, or dims past the
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
      var progressive = false
      var w = 0; var h = 0; var nComp = 0
      var frameIds: Array[Int] = null // component id -> quant table
      var frameQ: Array[Int] = null
      var frameH: Array[Int] = null // per-component sampling factors
      var frameV: Array[Int] = null
      // whole-image coefficient storage (zigzag order per block),
      // allocated at the first SOS
      var coefs: Array[Array[Int]] = null
      var bw: Array[Int] = null // blocks across, MCU-padded
      var bh: Array[Int] = null
      var mcusX = 0; var mcusY = 0
      var sawScan = false

      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return null
        val marker = b(j) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i = j + 1 // standalone marker, no length
        } else if (marker == 0xd9) { // EOI: reconstruct if any scan landed
          return if (sawScan) {
            finish(w, h, nComp, coefs, bw, bh, frameH, frameV, frameQ, quant, maxRawBytes)
          } else null
        } else if (marker == 0xc0 || marker == 0xc2) { // SOF0 / SOF2
          if (frameIds != null) return null // second frame: unsupported
          progressive = marker == 0xc2
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
          return null // extended / lossless / arithmetic / hierarchical
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
        } else if (marker == 0xda) { // SOS
          if (frameIds == null) return null
          if (coefs == null) { // first scan: allocate coefficient storage
            val maxH = frameH(0); val maxV = frameV(0)
            mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            bw = Array.tabulate(nComp)(c => mcusX * frameH(c))
            bh = Array.tabulate(nComp)(c => mcusY * frameV(c))
            var bytes = 0L
            var c = 0
            while (c < nComp) { bytes += bw(c).toLong * bh(c) * 64 * 4; c += 1 }
            if (bytes > 4L * maxRawBytes) return null // = 4x the plane cap
            coefs = Array.tabulate(nComp)(c => new Array[Int](bw(c) * bh(c) * 64))
          }
          val ns = b(j + 3) & 0xff
          if (ns < 1 || ns > nComp) return null
          val scanComps = new Array[Int](ns)
          val scanDc = new Array[HuffTable](ns)
          val scanAc = new Array[HuffTable](ns)
          var k = 0
          while (k < ns) {
            val cs = b(j + 4 + 2 * k) & 0xff
            val c = frameIds.indexOf(cs)
            if (c < 0) return null
            scanComps(k) = c
            val tt = b(j + 5 + 2 * k) & 0xff
            scanDc(k) = dcTab(tt >> 4)
            scanAc(k) = acTab(tt & 0x0f)
            k += 1
          }
          val ss = b(j + 4 + 2 * ns) & 0xff
          val se = b(j + 5 + 2 * ns) & 0xff
          val ahAl = b(j + 6 + 2 * ns) & 0xff
          val ah = ahAl >> 4; val al = ahAl & 0x0f
          if (progressive) {
            // T.81 G: DC scans are the 0..0 band; AC scans carry one
            // component only and never mix with DC
            if (ss == 0 && se != 0) return null
            if (ss > 0 && (ns != 1 || ss > se || se > 63)) return null
            if (ah != 0 && ah != al + 1) return null
            if (al > 13) return null
          } else {
            // sequential: full band, no successive approximation;
            // multi-scan sequential (one subset per scan) is legal
            if (ss != 0 || se != 63 || ah != 0 || al != 0) return null
          }
          val scanStart = j + 1 + u16be(b, j + 1)
          if (!decodeScanPass(b, scanStart, w, h, scanComps, scanDc, scanAc, coefs,
            bw, bh, frameH, frameV, mcusX, mcusY, ss, se, ah, al, restartInterval))
            return null
          sawScan = true
          i = skipEntropy(b, scanStart)
        } else { // APPn / COM / anything else with a length field
          val segLen = u16be(b, j + 1)
          if (segLen < 2) return null
          i = j + 1 + segLen
        }
      }
      null // ran out of input before EOI
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  /** One entropy-coded scan into the coefficient buffers. Handles
    * every scan kind: sequential full-band, progressive DC/AC first
    * passes and refinements, interleaved or single-component
    * geometry, restart markers. False on corrupt input.
    */
  private def decodeScanPass(
      b: Array[Byte], scanStart: Int, w: Int, h: Int,
      scanComps: Array[Int], scanDc: Array[HuffTable], scanAc: Array[HuffTable],
      coefs: Array[Array[Int]], bw: Array[Int], bh: Array[Int],
      frameH: Array[Int], frameV: Array[Int], mcusX: Int, mcusY: Int,
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Boolean = {
    val reader = new BitReader(b, scanStart)
    val ns = scanComps.length
    val dcPred = new Array[Int](ns)
    var eobrun = 0
    var mcu = 0

    def maybeRestart(): Boolean = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!reader.expectRst((mcu / restartInterval - 1) % 8)) return false
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
      true
    }

    /** Decode one block's worth of this scan's band into coef(base + k),
      * k in zigzag positions. `sc` indexes the scan's component list.
      */
    def block(sc: Int, coef: Array[Int], base: Int): Boolean = {
      if (ss == 0) { // DC band
        if (ah == 0) {
          val t = reader.decodeHuff(scanDc(sc))
          if (t < 0 || t > 11) return false
          val db = reader.receive(t)
          if (db == Int.MinValue) return false
          dcPred(sc) += extend(db, t)
          coef(base) = dcPred(sc) << al
        } else { // DC refinement: one bit
          val bit = reader.nextBit()
          if (bit < 0) return false
          if (bit == 1) coef(base) |= (1 << al)
        }
      }
      if (se >= 1 && (ss >= 1 || se == 63)) { // AC band (or full-band sequential)
        val lo = math.max(ss, 1)
        if (ah == 0) { // first pass
          if (eobrun > 0) { eobrun -= 1; return true }
          var k = lo
          while (k <= se) {
            val rs = reader.decodeHuff(scanAc(sc))
            if (rs < 0) return false
            val r = rs >> 4; val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else { // EOBn: this block is the first of the run
                val extra = reader.receive(r)
                if (extra == Int.MinValue) return false
                eobrun = (1 << r) - 1 + extra
                return true
              }
            } else {
              k += r
              if (k > se) return false
              val vb = reader.receive(s)
              if (vb == Int.MinValue) return false
              coef(base + k) = extend(vb, s) << al
              k += 1
            }
          }
        } else { // AC refinement (T.81 G.2.2 / the IJG structure)
          val p1 = 1 << al
          val m1 = -1 << al
          def correct(k: Int): Boolean = {
            val bit = reader.nextBit()
            if (bit < 0) return false
            if (bit == 1) {
              val cur = coef(base + k)
              if ((cur & p1) == 0)
                coef(base + k) = if (cur >= 0) cur + p1 else cur + m1
            }
            true
          }
          var k = lo
          if (eobrun == 0) {
            var done = false
            while (!done && k <= se) {
              val rs = reader.decodeHuff(scanAc(sc))
              if (rs < 0) return false
              var r = rs >> 4
              val s = rs & 0x0f
              var insert = 0
              if (s == 0) {
                if (r < 15) { // EOBn: run includes this block's tail
                  val extra = reader.receive(r)
                  if (extra == Int.MinValue) return false
                  eobrun = (1 << r) + extra
                  done = true
                }
                // r == 15: skip over 16 zero-history coefficients
              } else {
                if (s != 1) return false
                val bit = reader.nextBit()
                if (bit < 0) return false
                insert = if (bit == 1) p1 else m1
              }
              if (!done) {
                // advance over history: nonzero coefs take correction
                // bits, zero slots count down r; the new coefficient
                // (if any) lands on the zero slot where r runs out
                var placed = false
                while (!placed && k <= se) {
                  if (coef(base + k) != 0) {
                    if (!correct(k)) return false
                  } else {
                    if (r == 0) {
                      if (insert != 0) coef(base + k) = insert
                      placed = true
                    } else r -= 1
                  }
                  k += 1
                }
                if (!placed && insert != 0) return false // ran off the band
              }
            }
          }
          if (eobrun > 0) { // tail: correction bits only, then consume one
            while (k <= se) {
              if (coef(base + k) != 0) { if (!correct(k)) return false }
              k += 1
            }
            eobrun -= 1
          }
        }
      }
      true
    }

    if (ns > 1) { // interleaved: MCU geometry over the scan's components
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!maybeRestart()) return false
          var sc = 0
          while (sc < ns) {
            val c = scanComps(sc)
            var vby = 0
            while (vby < frameV(c)) {
              var vbx = 0
              while (vbx < frameH(c)) {
                val gx = mx * frameH(c) + vbx
                val gy = my * frameV(c) + vby
                if (!block(sc, coefs(c), (gy * bw(c) + gx) * 64)) return false
                vbx += 1
              }
              vby += 1
            }
            sc += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else { // single component: raster over its true block grid
      val c = scanComps(0)
      val maxH = frameH(0); val maxV = frameV(0)
      val cpw = (w * frameH(c) + maxH - 1) / maxH // component pixel dims
      val cph = (h * frameV(c) + maxV - 1) / maxV
      val wBlocks = (cpw + 7) / 8
      val hBlocks = (cph + 7) / 8
      var by = 0
      while (by < hBlocks) {
        var bx = 0
        while (bx < wBlocks) {
          if (!maybeRestart()) return false
          if (!block(0, coefs(c), (by * bw(c) + bx) * 64)) return false
          mcu += 1
          bx += 1
        }
        by += 1
      }
    }
    true
  }

  /** Dequantize + IDCT every block into component planes, then crop,
    * upsample chroma and color-convert.
    */
  private def finish(
      w: Int, h: Int, nComp: Int, coefs: Array[Array[Int]],
      bw: Array[Int], bh: Array[Int], frameH: Array[Int], frameV: Array[Int],
      frameQ: Array[Int], quant: Array[Array[Int]],
      maxRawBytes: Int): (Int, Int, Int, Array[Byte]) = {
    if (coefs == null) return null
    val maxH = frameH(0); val maxV = frameV(0)
    val pw = Array.tabulate(nComp)(c => bw(c) * 8)
    val ph = Array.tabulate(nComp)(c => bh(c) * 8)
    var planeBytes = 0L
    var c = 0
    while (c < nComp) {
      if (quant(frameQ(c)) == null) return null
      planeBytes += pw(c).toLong * ph(c)
      c += 1
    }
    if (planeBytes > maxRawBytes || w.toLong * h * nComp > maxRawBytes) return null
    val planes = Array.tabulate(nComp)(c => new Array[Byte](pw(c) * ph(c)))
    val nat = new Array[Int](64)
    val tmp = new Array[Double](64)
    c = 0
    while (c < nComp) {
      val q = quant(frameQ(c))
      val co = coefs(c)
      var by = 0
      while (by < bh(c)) {
        var bx = 0
        while (bx < bw(c)) {
          val base = (by * bw(c) + bx) * 64
          var k = 0
          while (k < 64) { nat(zigzag(k)) = co(base + k) * q(k); k += 1 }
          idctBlock(nat, tmp, planes(c), pw(c), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
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
        val sx = maxH / frameH(ci)
        val sy = maxV / frameV(ci)
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
