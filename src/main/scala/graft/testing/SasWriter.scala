package graft.testing

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Test-only minimal SAS7BDAT WRITER: emits 64-bit little-endian
  * uncompressed files following the published format layout (Shotwell,
  * "sas7bdat Database Binary Format"; same constants as the BSD
  * pandas/parso readers). A fixture generator, not a data sink: it
  * feeds Sas7bdatSpec and the q_load_sas driver query. This sandbox
  * has no SAS binaries, so fixtures are cross-validated against
  * pandas.read_sas (an INDEPENDENT reader implementation, via
  * scripts/check_sas.py) to keep writer and reader from sharing a
  * misunderstanding of the format.
  */
object SasWriter {

  case class Col(name: String, isNum: Boolean, width: Int = 8, format: String = "")

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  private val HeaderLength = 1024
  private val PageLength = 4096

  private class W(val b: Array[Byte]) {
    private def bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def u16(off: Int, v: Int): Unit = bb.putShort(off, v.toShort)
    def u32(off: Int, v: Long): Unit = bb.putInt(off, v.toInt)
    def u64(off: Int, v: Long): Unit = bb.putLong(off, v)
    def f64(off: Int, v: Double): Unit = bb.putDouble(off, v)
    def bytes(off: Int, v: Array[Byte]): Unit = System.arraycopy(v, 0, b, off, v.length)
  }

  /** Greedy RLE encoder for COMPRESS=CHAR rows, inverse of the
    * reader's opcode table. Emits space-fill (0x60/0xE0), zero-fill
    * (0x70/0xF0), byte-repeat (0xC0), and literal-copy (0x80-0xB0,
    * 0x00) commands — every documented opcode except the SAS-rare
    * 0x40/0xD0 forms — so compressed fixtures exercise the decoder
    * broadly. Cross-validated against pandas.read_sas's independent
    * decompressor via scripts/check_sas.py.
    */
  private[graft] def rleCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = row.length
    def runLen(at: Int): Int = {
      var j = at + 1
      while (j < n && row(j) == row(at)) j += 1
      j - at
    }
    while (i < n) {
      val r = runLen(i)
      val b = row(i)
      if (r >= 3 && (b == ' ' || b == 0)) {
        val op = if (b == ' ') 0x60 else 0x70
        val opShort = if (b == ' ') 0xe0 else 0xf0
        val take = math.min(r, 15 * 256 + 255 + 17)
        if (take >= 17) {
          val len = take - 17
          out.write(op | (len >> 8)); out.write(len & 0xff)
        } else out.write(opShort | (take - 2)) // 3..16 -> nib 1..14
        i += take
      } else if (r >= 4) { // 0xC0 repeat: nib+3, 3..18 (use from 4 so
        val take = math.min(r, 18)           // 3-byte literals stay literal)
        out.write(0xc0 | (take - 3)); out.write(b & 0xff)
        i += take
      } else {
        // literal run: extend until the next compressible run starts
        var j = i
        while (j < n && {
          val rr = runLen(j)
          !(rr >= 4 || (rr >= 3 && (row(j) == ' ' || row(j) == 0)))
        }) j += runLen(j)
        var len = j - i
        while (len > 0) {
          val take = math.min(len, 15 * 256 + 255 + 64)
          if (take > 64) {
            val l = take - 64
            out.write(l >> 8); out.write(l & 0xff) // 0x00 | hi nibble
          } else {
            val grp = (take - 1) / 16 // 0..3 -> 0x80/0x90/0xA0/0xB0
            out.write((0x80 + grp * 16) | ((take - 1) % 16))
          }
          out.write(row, i, take)
          i += take; len -= take
        }
      }
    }
    out.toByteArray
  }

  /** Greedy RDC (Ross Data Compression) encoder for COMPRESS=BINARY
    * rows, inverse of the reader's `rdcDecompress`: 16-bit control
    * words (one bit per item, MSB first; 0 = literal byte, 1 =
    * command), short/long byte-run fills, and short/long LZ
    * back-references (offset 3..4098, length 3..271, searched
    * greedily). Exercises every RDC command class; cross-validated
    * against pandas.read_sas's independent decompressor via
    * scripts/check_sas.py.
    */
  private[graft] def rdcCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val group = new java.io.ByteArrayOutputStream()
    var mask = 0; var nItems = 0
    def flush(): Unit = if (nItems > 0) {
      val bits = mask << (16 - nItems) // first item = MSB
      out.write((bits >> 8) & 0xff); out.write(bits & 0xff)
      group.writeTo(out)
      group.reset(); mask = 0; nItems = 0
    }
    def item(cmdBit: Int, bs: Int*): Unit = {
      mask = (mask << 1) | cmdBit
      bs.foreach(b => group.write(b & 0xff))
      nItems += 1
      if (nItems == 16) flush()
    }
    val n = row.length
    def runLen(at: Int): Int = {
      var j = at + 1; while (j < n && row(j) == row(at)) j += 1; j - at
    }
    // longest back-reference at `at` (offset 3..4098, length capped
    // 271); O(window) scan per position — fixture-sized inputs only
    def bestMatch(at: Int): (Int, Int) = {
      var bo = 0; var bl = 0
      val maxOfs = math.min(at, 4098)
      val cap = math.min(n - at, 271)
      var ofs = 3
      while (ofs <= maxOfs) {
        var l = 0
        while (l < cap && row(at + l) == row(at - ofs + l)) l += 1
        if (l > bl) { bl = l; bo = ofs }
        ofs += 1
      }
      (bo, bl)
    }
    var i = 0
    while (i < n) {
      val r = runLen(i)
      if (r >= 19) {
        val take = math.min(r, 15 + (255 << 4) + 19)
        val c = take - 19
        item(1, 0x10 | (c & 0xf), (c >> 4) & 0xff, row(i))
        i += take
      } else if (r >= 3) {
        item(1, r - 3, row(i)) // cmd 0: fill nib+3
        i += r
      } else {
        val (ofs, len) = bestMatch(i)
        if (len >= 3) {
          val o3 = ofs - 3
          if (len <= 15) item(1, (len << 4) | (o3 & 0xf), (o3 >> 4) & 0xff)
          else item(1, 0x20 | (o3 & 0xf), (o3 >> 4) & 0xff, len - 16)
          i += len
        } else { item(0, row(i)); i += 1 }
      }
    }
    flush()
    out.toByteArray
  }

  /** Row values: java.lang.Double / null for numeric (dates as raw SAS
    * day counts), String / null for character columns. `u64 = false`
    * emits the 32-bit layout (4-byte subheader ints, 16-byte page bit
    * offset, 12-byte pointers) so the reader's 32-bit branch is
    * exercised too. `compression` is "none", "rle" (COMPRESS=CHAR /
    * SASYZCRL), or "rdc" (COMPRESS=BINARY / SASYZCR2): the marker
    * leads the column text block and every row becomes a compressed
    * data subheader (flag 4) on meta-type pages, exactly how SAS lays
    * out compressed files.
    */
  def write(path: String, cols: Seq[Col], rows: Seq[Seq[Any]], u64: Boolean = true,
      compression: String = "none"): Unit = {
    require(Set("none", "rle", "rdc")(compression), s"bad compression '$compression'")
    val compress = compression != "none"
    require(cols.forall(c => !c.isNum || c.width == 8), "numeric cols must be width 8")
    val intLen = if (u64) 8 else 4
    val bitOff = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12
    // row layout: columns in declared order, numerics 8 bytes
    val offsets = cols.scanLeft(0)((acc, c) => acc + c.width).init
    val rowLength = cols.zip(offsets).map { case (c, o) => o + c.width }.max

    // ---- text block: names + formats, laid out from relative 16 ----
    val textItems = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int)]
    var cursor = 16
    def intern(s: String): (Int, Int) = textItems.getOrElseUpdate(s, {
      val bytesUtf = s.getBytes("UTF-8")
      val at = cursor
      cursor += bytesUtf.length
      cursor = (cursor + 7) / 8 * 8
      (at, bytesUtf.length)
    })
    if (compression == "rle") intern("SASYZCRL") // marker must live in the text block
    if (compression == "rdc") intern("SASYZCR2")
    cols.foreach(c => intern(c.name))
    cols.filter(_.format.nonEmpty).foreach(c => intern(c.format))
    val blockSize = (cursor + 7) / 8 * 8

    // ---- subheaders (content, built before placement) --------------
    val n = cols.length
    def sub(len: Int, sig: Array[Byte])(fill: W => Unit): Array[Byte] = {
      val a = new Array[Byte](len)
      System.arraycopy(sig, 0, a, 0, sig.length)
      fill(new W(a)); a
    }
    // 32-bit signatures are the 4 leading bytes; u64 zero/FF-extends
    def sig(first: Array[Int], extFf: Boolean): Array[Byte] = {
      val head = first.map(_.toByte)
      if (!u64) head
      else head ++ Array.fill(4)(if (extFf) 0xff.toByte else 0x00.toByte)
    }
    val sigRowSize = sig(Array(0xf7, 0xf7, 0xf7, 0xf7), extFf = false)
    val sigColSize = sig(Array(0xf6, 0xf6, 0xf6, 0xf6), extFf = false)
    val sigColText = sig(Array(0xfd, 0xff, 0xff, 0xff), extFf = true)
    val sigColName = sig(Array(0xff, 0xff, 0xff, 0xff), extFf = true)
    val sigColAttr = sig(Array(0xfc, 0xff, 0xff, 0xff), extFf = true)
    val sigFormat = sig(Array(0xfe, 0xfb, 0xff, 0xff), extFf = true)
    def uint(w: W, off: Int, v: Long): Unit = if (u64) w.u64(off, v) else w.u32(off, v)

    val rowSize = sub(if (u64) 808 else 480, sigRowSize) { w =>
      uint(w, 5 * intLen, rowLength)
      uint(w, 6 * intLen, rows.length)
      uint(w, 9 * intLen, n) // col_count_p1 (+p2 at 10*intLen stays 0)
      uint(w, 15 * intLen, 0) // no mix pages
      val (lcs, lcp) = if (u64) (682, 706) else (354, 378)
      w.u16(lcs, 0); w.u16(lcp, 0)
    }
    val colSize = sub(3 * intLen, sigColSize)(w => uint(w, intLen, n))
    val colText = sub(intLen + blockSize, sigColText) { w =>
      w.u16(intLen, blockSize)
      textItems.foreach { case (s, (at, _)) => w.bytes(intLen + at, s.getBytes("UTF-8")) }
    }
    val colName = sub(2 * intLen + 12 + 8 * n, sigColName) { w =>
      cols.zipWithIndex.foreach { case (c, i) =>
        val base = intLen + 8 * (i + 1)
        val (at, len) = textItems(c.name)
        w.u16(base, 0); w.u16(base + 2, at); w.u16(base + 4, len)
      }
    }
    val colAttr = sub(2 * intLen + 12 + (intLen + 8) * n, sigColAttr) { w =>
      cols.zipWithIndex.foreach { case (c, i) =>
        uint(w, intLen + 8 + (intLen + 8) * i, offsets(i))
        w.u32(2 * intLen + 8 + (intLen + 8) * i, c.width)
        w.b(2 * intLen + 14 + (intLen + 8) * i) = (if (c.isNum) 1 else 2).toByte
      }
    }
    val formatSubs = cols.map { c =>
      sub(34 + 3 * intLen, sigFormat) { w =>
        if (c.format.nonEmpty) {
          val (at, len) = textItems(c.format)
          w.u16(22 + 3 * intLen, 0)
          w.u16(24 + 3 * intLen, at)
          w.u16(26 + 3 * intLen, len)
        }
      }
    }
    val subheaders = Seq(rowSize, colSize, colText, colName, colAttr) ++ formatSubs

    def rowBytes(row: Seq[Any]): Array[Byte] = {
      val a = new Array[Byte](rowLength)
      val w = new W(a)
      cols.zipWithIndex.foreach { case (c, i) =>
        row(i) match {
          case null => if (c.isNum) w.f64(offsets(i), Double.NaN)
          case d: java.lang.Double => w.f64(offsets(i), d)
          case s: String =>
            val enc = s.getBytes("UTF-8")
            require(enc.length <= c.width, s"'$s' wider than ${c.width}")
            w.bytes(offsets(i), enc ++ Array.fill(c.width - enc.length)(' '.toByte))
          case other => throw new IllegalArgumentException(s"bad cell $other")
        }
      }
      a
    }

    /** Pack subheaders into meta-type pages: pointers grow from the
      * page header, payloads from the tail, new page when they'd
      * collide. `flag4` marks RLE row subheaders (compression = 4,
      * ptype = 1 in the pointer, the layout pandas expects).
      */
    def packSubheaderPages(subs: Seq[(Array[Byte], Boolean)]): Seq[Array[Byte]] = {
      val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var page: Array[Byte] = null; var mw: W = null
      var count = 0; var tail = 0
      def flush(): Unit = if (page != null) {
        mw.u16(bitOff + 2, count); mw.u16(bitOff + 4, count)
        pages += page; page = null
      }
      def open(): Unit = {
        page = new Array[Byte](PageLength); mw = new W(page)
        mw.u16(bitOff, 0x0000); count = 0; tail = PageLength
      }
      subs.foreach { case (sh, flag4) =>
        val need = (tail - sh.length) / 8 * 8
        if (page == null || bitOff + 8 + (count + 1) * ptrLen > need) { flush(); open() }
        require(bitOff + 8 + (count + 1) * ptrLen <= (tail - sh.length) / 8 * 8,
          s"subheader of ${sh.length} bytes exceeds the $PageLength-byte page")
        tail = (tail - sh.length) / 8 * 8
        mw.bytes(tail, sh)
        val p = bitOff + 8 + count * ptrLen
        uint(mw, p, tail); uint(mw, p + intLen, sh.length)
        page(p + 2 * intLen) = if (flag4) 4 else 0
        page(p + 2 * intLen + 1) = if (flag4) 1 else 0
        count += 1
      }
      flush()
      pages.toSeq
    }

    val allPages: Seq[Array[Byte]] =
      if (compress) {
        // every row is its own subheader: compressed payload when it
        // is actually shorter, raw otherwise (the same length rule
        // both the repo reader and pandas use to decide decompression)
        val codec: Array[Byte] => Array[Byte] =
          if (compression == "rle") rleCompress else rdcCompress
        val rowSubs = rows.map { r =>
          val raw = rowBytes(r)
          val comp = codec(raw)
          (if (comp.length < rowLength) comp else raw, true)
        }
        packSubheaderPages(subheaders.map((_, false)) ++ rowSubs)
      } else {
        val metaPages = packSubheaderPages(subheaders.map((_, false)))
        require(metaPages.length == 1, "metadata should fit one page")
        val rowsPerPage = (PageLength - (bitOff + 8)) / rowLength
        val dataPages = rows.grouped(rowsPerPage).map { chunk =>
          val page = new Array[Byte](PageLength)
          val w = new W(page)
          w.u16(bitOff, 0x0100)
          w.u16(bitOff + 2, chunk.length)
          w.u16(bitOff + 4, 0)
          chunk.zipWithIndex.foreach { case (row, r) =>
            w.bytes(bitOff + 8 + r * rowLength, rowBytes(row))
          }
          page
        }.toSeq
        metaPages ++ dataPages
      }

    // ---- header -----------------------------------------------------
    val align1 = if (u64) 4 else 0
    val header = new Array[Byte](HeaderLength)
    val hw = new W(header)
    hw.bytes(0, Magic)
    if (u64) { header(32) = 0x33; header(35) = 0x33 }
    header(37) = 0x01 // little-endian
    header(39) = '1'.toByte
    header(70) = 20 // utf-8
    hw.f64(164 + align1, 0.0); hw.f64(172 + align1, 0.0) // created/modified
    hw.u32(196 + align1, HeaderLength)
    hw.u32(200 + align1, PageLength)
    hw.u32(204 + align1, allPages.length.toLong)

    val out = new java.io.ByteArrayOutputStream()
    out.write(header); allPages.foreach(out.write)
    Files.write(Paths.get(path), out.toByteArray)
  }
}

/** The canonical sample fixture: a closed-form 4-column table shared
  * by Sas7bdatSpec, the q_load_sas driver query, its DuckDB oracle
  * (which reproduces the SAME closed form in SQL), and the pandas
  * cross-validation script. Content is a pure function of the row
  * index, so every consumer can regenerate it independently.
  */
object SasFixture {
  import SasWriter._

  val columns: Seq[Col] = Seq(
    Col("id", isNum = true),
    Col("ret", isNum = true),
    Col("evtdate", isNum = true, format = "DATE"),
    Col("ticker", isNum = false, width = 8))

  /** Row i: id = i; ret = i/4 - 10 (null when i%7==3); evtdate =
    * 2000-01-01 + i days (14610 = days from the 1960 SAS epoch);
    * ticker = "T"+(i%97) (null when i%11==5).
    */
  def rows(n: Int): Seq[Seq[Any]] = (0 until n).map { i =>
    Seq[Any](
      java.lang.Double.valueOf(i.toDouble),
      if (i % 7 == 3) null else java.lang.Double.valueOf(i * 0.25 - 10),
      java.lang.Double.valueOf((14610 + i).toDouble),
      if (i % 11 == 5) null else s"T${i % 97}")
  }

  /** Write the n-row fixture to a fresh temp path and return it. */
  def writeToTemp(n: Int, compression: String = "none"): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sas").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "fixture.sas7bdat").getAbsolutePath
    SasWriter.write(p, columns, rows(n), compression = compression)
    p
  }
}

/** CLI for cross-validation against pandas.read_sas (check_sas.py).
  * Pass a second arg "32" for the 32-bit layout, "rle" for a
  * COMPRESS=CHAR file, or "rdc" for a COMPRESS=BINARY file.
  */
object SasWriterMain {
  def main(args: Array[String]): Unit = {
    val u64 = !(args.length > 1 && args(1) == "32")
    val compression = if (args.length > 1 && Set("rle", "rdc")(args(1))) args(1) else "none"
    SasWriter.write(args(0), SasFixture.columns, SasFixture.rows(500), u64 = u64, compression = compression)
    println(s"wrote ${args(0)} (u64=$u64, compression=$compression)")
  }
}
