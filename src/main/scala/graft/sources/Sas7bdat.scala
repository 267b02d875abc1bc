package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal pure-JVM SAS7BDAT reader (the `load_sas` ingestion path,
  * reference: pd_utils/load.py:7-42).
  *
  * Scope: uncompressed, RLE-compressed (COMPRESS=CHAR / "SASYZCRL"),
  * and RDC-compressed (COMPRESS=BINARY / "SASYZCR2") sas7bdat files,
  * 32- or 64-bit, little- or big-endian, numeric (possibly
  * truncated-width doubles) and character columns, with SAS
  * DATE/DATETIME formats optionally converted to date/timestamp.
  * This covers everything SAS writes (default, COMPRESS=CHAR, and
  * COMPRESS=BINARY) for the research datasets the reference library
  * targets (CRSP/Compustat extracts).
  *
  * Format layout follows the public reverse-engineered specification
  * ("sas7bdat Database Binary Format", Shotwell,
  * https://cran.r-project.org/package=sas7bdat/vignettes/sas7bdat.pdf)
  * as also implemented by the BSD-licensed pandas and parso readers —
  * header field offsets, subheader signature table, and page/pointer
  * geometry are format constants from that spec.
  *
  * Scale design: metadata (one meta-page scan) parses on the driver;
  * DATA pages are fixed-size blocks at known offsets, so row
  * extraction fans out as one task per page range — each executor
  * seeks straight to its pages. A 100 GB sas7bdat therefore decodes
  * with full cluster parallelism even though the format itself is not
  * line-splittable. (RDD + imperative decode is the right tool here:
  * this IS genuine per-partition binary parsing, not expressible as
  * Catalyst expressions.)
  */
object Sas7bdat {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  // subheader kinds (indices into the processor dispatch)
  private val RowSize = 0; private val ColSize = 1; private val Counts = 2
  private val ColText = 3; private val ColName = 4; private val ColAttrs = 5
  private val Format = 6; private val ColList = 7

  /** Published signature table: hex(signature bytes) -> kind. Both
    * endiannesses and both 32/64-bit widths.
    */
  private val SignatureKind: Map[String, Int] = Map(
    "f7f7f7f7" -> RowSize, "00000000f7f7f7f7" -> RowSize,
    "f7f7f7f700000000" -> RowSize, "f7f7f7f7fffffbfe" -> RowSize,
    "f6f6f6f6" -> ColSize, "00000000f6f6f6f6" -> ColSize,
    "f6f6f6f600000000" -> ColSize, "f6f6f6f6fffffbfe" -> ColSize,
    "00fcffff" -> Counts, "fffffc00" -> Counts,
    "00fcffffffffffff" -> Counts, "fffffffffffffc00" -> Counts,
    "fdffffff" -> ColText, "fffffffd" -> ColText,
    "fdffffffffffffff" -> ColText, "fffffffffffffffd" -> ColText,
    "ffffffff" -> ColName, "ffffffffffffffff" -> ColName,
    "fcffffff" -> ColAttrs, "fffffffc" -> ColAttrs,
    "fcffffffffffffff" -> ColAttrs, "fffffffffffffffc" -> ColAttrs,
    "fefbffff" -> Format, "fffffbfe" -> Format,
    "fefbffffffffffff" -> Format, "fffffffffffffbfe" -> Format,
    "feffffff" -> ColList, "fffffffe" -> ColList,
    "feffffffffffffff" -> ColList, "fffffffffffffffe" -> ColList)

  private[sources] val SasDateFormats = Set(
    "DATE", "DAY", "DDMMYY", "DOWNAME", "JULDAY", "JULIAN", "MMDDYY", "MMYY",
    "MONNAME", "MONTH", "MONYY", "QTR", "WEEKDATE", "WEEKDAY", "WORDDATE",
    "YEAR", "YYMM", "YYMMDD", "YYMON", "YYQ", "E8601DA", "B8601DA")
  private[sources] val SasDatetimeFormats = Set(
    "DATETIME", "B8601DN", "B8601DT", "E8601DN", "E8601DT", "DATEAMPM",
    "DTDATE", "DTMONYY", "DTYEAR", "TOD", "MDYAMPM")

  /** One column: byte layout within a row + logical type. */
  case class SasColumn(name: String, offset: Int, width: Int, isNumeric: Boolean, format: String)

  /** Everything a task needs to turn a page buffer into rows.
    * `rleCompressed` = the file carries the SASYZCRL marker,
    * `rdcCompressed` = SASYZCR2: rows live in per-row data
    * subheaders, decompressed (RLE resp. RDC) when shorter than
    * `rowLength`.
    */
  case class SasMeta(
      u64: Boolean,
      littleEndian: Boolean,
      encoding: String,
      headerLength: Int,
      pageLength: Int,
      rowLength: Int,
      rowCount: Long,
      mixPageRowCount: Long,
      columns: Seq[SasColumn],
      rleCompressed: Boolean = false,
      rdcCompressed: Boolean = false) {
    def intLen: Int = if (u64) 8 else 4
    def pageBitOffset: Int = if (u64) 32 else 16
    def subheaderPtrLen: Int = if (u64) 24 else 12
  }

  // ---------------------------------------------------------------
  // byte-level helpers
  // ---------------------------------------------------------------

  private[sources] class Buf(val bytes: Array[Byte], littleEndian: Boolean) {
    private val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    def uint(off: Int, width: Int): Long = {
      val bb = ByteBuffer.wrap(bytes, off, width).order(order)
      width match {
        case 1 => bytes(off) & 0xffL
        case 2 => bb.getShort & 0xffffL
        case 4 => bb.getInt & 0xffffffffL
        case 8 => bb.getLong
        case w => throw new IllegalArgumentException(s"bad int width $w")
      }
    }
    def double(off: Int, width: Int): Double =
      if (width == 8) ByteBuffer.wrap(bytes, off, 8).order(order).getDouble
      else {
        // truncated numeric: SAS drops LOW-order mantissa bytes, so the
        // stored bytes are the most-significant `width`; re-seat them
        val full = new Array[Byte](8)
        if (littleEndian) System.arraycopy(bytes, off, full, 8 - width, width)
        else System.arraycopy(bytes, off, full, 0, width)
        ByteBuffer.wrap(full).order(order).getDouble
      }
    def slice(off: Int, len: Int): Array[Byte] = java.util.Arrays.copyOfRange(bytes, off, off + len)
    def hex(off: Int, len: Int): String =
      slice(off, len).map(b => f"${b & 0xff}%02x").mkString
  }

  // ---------------------------------------------------------------
  // driver-side metadata parse
  // ---------------------------------------------------------------

  private[sources] def openAt(path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).open(p)
  }

  private[sources] def readFully(in: org.apache.hadoop.fs.FSDataInputStream, pos: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    in.readFully(pos, out, 0, len)
    out
  }

  /** Parse header + metadata pages (stops at the first data/mix page,
    * like every published reader — SAS emits all metadata up front).
    * Returns the meta plus the index of the first page that can carry
    * rows.
    */
  def readMeta(path: String): (SasMeta, Int) = {
    val conf0 = new org.apache.hadoop.conf.Configuration()
    val fsPath0 = new org.apache.hadoop.fs.Path(path)
    val fileLen = fsPath0.getFileSystem(conf0).getFileStatus(fsPath0).getLen
    val in = openAt(path)
    try {
      val head = readFully(in, 0, 288)
      require(head.take(32).sameElements(Magic), s"$path: not a sas7bdat file (magic mismatch)")
      val u64 = head(32) == 0x33.toByte
      val align1 = if (head(35) == 0x33.toByte) 4 else 0
      val littleEndian = head(37) == 0x01.toByte
      val hb = new Buf(head, littleEndian)
      val encoding = (head(70) & 0xff) match {
        case 20 => "UTF-8"
        case 62 => "windows-1252"
        case 29 | 0 => "ISO-8859-1" // 0 = unspecified; latin-1 is lossless on bytes
        case _ => "ISO-8859-1"
      }
      val headerLength = hb.uint(196 + align1, 4).toInt
      val pageLength = hb.uint(200 + align1, 4).toInt
      val intLen = if (u64) 8 else 4
      val bitOff = if (u64) 32 else 16
      val ptrLen = if (u64) 24 else 12

      // mutable collection state for the subheader walk
      var rowLength = 0; var rowCount = 0L; var mixRows = 0L; var colCount = 0
      var rle = false; var rdc = false
      val textBlocks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
      val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
      val numeric = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      val formats = scala.collection.mutable.ArrayBuffer.empty[String]
      def decode(b: Array[Byte]): String = {
        var end = b.length
        while (end > 0 && (b(end - 1) == 0 || b(end - 1) == ' ')) end -= 1
        new String(b, 0, end, encoding)
      }

      val pageCount = ((fileLen - headerLength) / pageLength).toInt
      var pageIdx = 0
      var firstDataPage = -1
      // stop at the first page that can carry rows, or at EOF (a
      // metadata-only file has no data pages at all)
      while (firstDataPage < 0 && pageIdx < pageCount) {
        val page = new Buf(readFully(in, headerLength.toLong + pageIdx.toLong * pageLength, pageLength), littleEndian)
        val pageType = (page.uint(bitOff, 2) & 0xff00L).toInt
        val isMeta = pageType == 0x0000 || pageType == 0x4000
        val isMix = pageType == 0x0200
        val isData = pageType == 0x0100
        var sawDataSubheader = false
        if (isMeta || isMix || pageType == 0x0400) {
          val subCount = page.uint(bitOff + 4, 2).toInt
          for (i <- 0 until subCount) {
            val p = bitOff + 8 + i * ptrLen
            val shOff = page.uint(p, intLen).toInt
            val shLen = page.uint(p + intLen, intLen).toInt
            val compression = page.uint(p + 2 * intLen, 1).toInt
            if (shLen > 0 && compression == 4) {
              sawDataSubheader = true // RLE row payload; never metadata
            } else if (shLen > 0 && compression != 1) { // 1 = truncated
              val sig = page.hex(shOff, intLen)
              SignatureKind.get(sig) match {
                case Some(RowSize) =>
                  rowLength = page.uint(shOff + 5 * intLen, intLen).toInt
                  rowCount = page.uint(shOff + 6 * intLen, intLen)
                  colCount = page.uint(shOff + 9 * intLen, intLen).toInt +
                    page.uint(shOff + 10 * intLen, intLen).toInt
                  mixRows = page.uint(shOff + 15 * intLen, intLen)
                case Some(ColSize) =>
                  val cc = page.uint(shOff + intLen, intLen).toInt
                  if (colCount == 0) colCount = cc
                case Some(ColText) =>
                  val blockSize = page.uint(shOff + intLen, 2).toInt
                  val block = page.slice(shOff + intLen, blockSize)
                  if (textBlocks.isEmpty) {
                    val asLatin = new String(block, "ISO-8859-1")
                    if (asLatin.contains("SASYZCR2")) rdc = true
                    else if (asLatin.contains("SASYZCRL")) rle = true
                  }
                  textBlocks += block
                case Some(ColName) =>
                  val n = (shLen - 2 * intLen - 12) / 8
                  for (j <- 0 until n) {
                    val base = shOff + intLen + 8 * (j + 1)
                    val blockIdx = page.uint(base, 2).toInt
                    val nameOff = page.uint(base + 2, 2).toInt
                    val nameLen = page.uint(base + 4, 2).toInt
                    names += decode(textBlocks(blockIdx).slice(nameOff, nameOff + nameLen))
                  }
                case Some(ColAttrs) =>
                  val n = (shLen - 2 * intLen - 12) / (intLen + 8)
                  for (j <- 0 until n) {
                    offsets += page.uint(shOff + intLen + 8 + j * (intLen + 8), intLen)
                    widths += page.uint(shOff + 2 * intLen + 8 + j * (intLen + 8), 4).toInt
                    numeric += page.uint(shOff + 2 * intLen + 14 + j * (intLen + 8), 1) == 1L
                  }
                case Some(Format) =>
                  val fIdx = math.min(page.uint(shOff + 22 + 3 * intLen, 2).toInt, textBlocks.length - 1)
                  val fOff = page.uint(shOff + 24 + 3 * intLen, 2).toInt
                  val fLen = page.uint(shOff + 26 + 3 * intLen, 2).toInt
                  formats += decode(textBlocks(fIdx).slice(fOff, fOff + fLen))
                case Some(Counts) | Some(ColList) => () // bookkeeping only
                case None =>
                  sawDataSubheader = true // uncompressed row payload on a meta page
              }
            }
          }
        }
        if (isData || isMix || sawDataSubheader) firstDataPage = pageIdx
        else pageIdx += 1
      }
      if (firstDataPage < 0) firstDataPage = pageCount

      require(rowLength > 0 && colCount > 0, s"$path: no row-size/column metadata found")
      require(names.length == colCount && widths.length == colCount,
        s"$path: metadata incomplete (names=${names.length}, attrs=${widths.length}, cols=$colCount)")
      val cols = (0 until colCount).map { i =>
        SasColumn(names(i), offsets(i).toInt, widths(i), numeric(i),
          if (i < formats.length) formats(i) else "")
      }
      (SasMeta(u64, littleEndian, encoding, headerLength, pageLength,
        rowLength, rowCount, mixRows, cols, rle, rdc), firstDataPage)
    } finally in.close()
  }

  // ---------------------------------------------------------------
  // executor-side row extraction
  // ---------------------------------------------------------------

  /** RLE decompression for COMPRESS=CHAR ("SASYZCRL") row payloads.
    * Opcode table from the published Shotwell spec as implemented by
    * the BSD pandas/parso readers; high nibble = command, low nibble
    * (`nib`) = length modifier:
    *   0x0 copy nib*256+next+64 literal bytes   0x8 copy nib+1 literals
    *   0x4 repeat next byte nib*16+next+18 x    0x9 copy nib+17 literals
    *   0x6 emit nib*256+next+17 spaces          0xA copy nib+33 literals
    *   0x7 emit nib*256+next+17 zero bytes      0xB copy nib+49 literals
    *   0xC repeat next byte nib+3 times         0xD emit nib+2 '@'
    *   0xE emit nib+2 spaces                    0xF emit nib+2 zeros
    * Writer fixtures exercise every opcode except 0x4/0xD (SAS-rare;
    * decoded per the published convention) and are cross-validated
    * against pandas.read_sas's independent decompressor.
    */
  private[graft] def rleDecompress(src: Array[Byte], from: Int, len: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = from; var o = 0
    val end = from + len
    // a truncated/corrupt payload must fail as a diagnosable format
    // error, not an ArrayIndexOutOfBoundsException from deep inside a
    // task (same contract as the RDC decoder below)
    def chk(cond: Boolean, at: Int): Unit = if (!cond)
      throw new IllegalStateException(
        s"corrupt RLE stream (truncated or bad command) at input offset ${at - from} of $len")
    def fill(b: Byte, n: Int, at: Int): Unit = { chk(o + n <= outLen, at); java.util.Arrays.fill(out, o, o + n, b); o += n }
    while (i < end && o < outLen) {
      val ctrl = src(i) & 0xf0
      val nib = src(i) & 0x0f
      i += 1
      ctrl match {
        case 0x00 =>
          chk(i < end, i); val n = nib * 256 + (src(i) & 0xff) + 64; i += 1
          chk(i + n <= end && o + n <= outLen, i)
          System.arraycopy(src, i, out, o, n); i += n; o += n
        case 0x40 =>
          chk(i + 1 < end, i); val n = nib * 16 + (src(i) & 0xff) + 18; i += 1
          fill(src(i), n, i); i += 1
        case 0x60 =>
          chk(i < end, i); val n = nib * 256 + (src(i) & 0xff) + 17; i += 1; fill(0x20, n, i)
        case 0x70 =>
          chk(i < end, i); val n = nib * 256 + (src(i) & 0xff) + 17; i += 1; fill(0x00, n, i)
        case 0x80 | 0x90 | 0xa0 | 0xb0 =>
          val n = nib + 1 + ((ctrl - 0x80) >> 4) * 16
          chk(i + n <= end && o + n <= outLen, i)
          System.arraycopy(src, i, out, o, n); i += n; o += n
        case 0xc0 => chk(i < end, i); fill(src(i), nib + 3, i); i += 1
        case 0xd0 => fill(0x40, nib + 2, i)
        case 0xe0 => fill(0x20, nib + 2, i)
        case 0xf0 => fill(0x00, nib + 2, i)
        case c => throw new IllegalStateException(f"bad RLE control byte 0x$c%02x at $i")
      }
    }
    require(o == outLen, s"RLE row decompressed to $o bytes, expected $outLen")
    out
  }

  /** RDC (Ross Data Compression) decompression for COMPRESS=BINARY
    * ("SASYZCR2") row payloads, per the published Shotwell spec as
    * implemented by the BSD pandas/parso readers. The stream is
    * groups of a 16-bit big-endian control word followed by 16 items,
    * one control bit each (MSB first): bit 0 = one literal byte,
    * bit 1 = a command byte whose high nibble selects
    *   0x0 fill next byte cnt+3 times (cnt = low nibble)
    *   0x1 fill next-next byte (cnt | next<<4) + 19 times
    *   0x2 copy (second-next + 16) back-reference bytes from
    *       offset (cnt | next<<4) + 3 behind the output cursor
    *   0x3..0xF copy CMD back-reference bytes from offset
    *       (cnt | next<<4) + 3
    * Back-reference copies go byte-by-byte so overlapping references
    * (offset < length) replicate, LZ-style.
    */
  private[graft] def rdcDecompress(src: Array[Byte], from: Int, len: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = from; var o = 0
    val end = from + len
    var ctrlBits = 0; var ctrlMask = 0
    // truncated/corrupt payloads fail as a diagnosable format error,
    // not an ArrayIndexOutOfBoundsException from deep inside a task
    def chk(cond: Boolean, at: Int): Unit = if (!cond)
      throw new IllegalStateException(
        s"corrupt RDC stream (truncated or bad command) at input offset ${at - from} of $len")
    while (i < end && o < outLen) {
      ctrlMask >>= 1
      if (ctrlMask == 0) {
        chk(i + 1 < end, i)
        ctrlBits = ((src(i) & 0xff) << 8) | (src(i + 1) & 0xff)
        i += 2
        ctrlMask = 0x8000
      }
      if ((ctrlBits & ctrlMask) == 0) {
        chk(i < end, i)
        out(o) = src(i); o += 1; i += 1
      } else {
        chk(i < end, i)
        val cmd = (src(i) >> 4) & 0x0f
        val nib = src(i) & 0x0f
        i += 1
        cmd match {
          case 0 =>
            chk(i < end, i); val n = nib + 3
            chk(o + n <= outLen, i)
            java.util.Arrays.fill(out, o, o + n, src(i)); i += 1; o += n
          case 1 =>
            chk(i + 1 < end, i); val n = nib + ((src(i) & 0xff) << 4) + 19; i += 1
            chk(o + n <= outLen, i)
            java.util.Arrays.fill(out, o, o + n, src(i)); i += 1; o += n
          case 2 =>
            chk(i + 1 < end, i)
            val ofs = nib + 3 + ((src(i) & 0xff) << 4); i += 1
            val n = (src(i) & 0xff) + 16; i += 1
            chk(ofs <= o && o + n <= outLen, i)
            var k = 0
            while (k < n) { out(o) = out(o - ofs); o += 1; k += 1 }
          case c =>
            chk(i < end, i)
            val ofs = nib + 3 + ((src(i) & 0xff) << 4); i += 1
            chk(ofs <= o && o + c <= outLen, i)
            var k = 0
            while (k < c) { out(o) = out(o - ofs); o += 1; k += 1 }
        }
      }
    }
    require(o == outLen, s"RDC row decompressed to $o bytes, expected $outLen")
    out
  }

  /** Rows within one page as (buffer, offset) pairs — offsets into
    * the page itself for uncompressed rows, or into a freshly
    * decompressed row buffer for RLE/RDC subheaders.
    */
  private[sources] def rowsInPage(page: Buf, meta: SasMeta): Seq[(Buf, Int)] = {
    val bitOff = meta.pageBitOffset
    val pageType = (page.uint(bitOff, 2) & 0xff00L).toInt
    pageType match {
      case 0x0100 => // data page: blockCount rows packed after the header
        val blockCount = page.uint(bitOff + 2, 2).toInt
        val base = bitOff + 8
        (0 until blockCount).map(i => (page, base + i * meta.rowLength))
      case 0x0200 => // mix page: rows follow the subheader pointers, 8-aligned
        val subCount = page.uint(bitOff + 4, 2).toInt
        val base0 = bitOff + 8 + subCount * meta.subheaderPtrLen
        val base = base0 + (base0 % 8)
        val n = math.min(meta.mixPageRowCount, meta.rowCount).toInt
        (0 until n).map(i => (page, base + i * meta.rowLength))
      case 0x0000 | 0x4000 => // meta page: data subheaders carry one row each
        val subCount = page.uint(bitOff + 4, 2).toInt
        (0 until subCount).flatMap { i =>
          val p = bitOff + 8 + i * meta.subheaderPtrLen
          val shOff = page.uint(p, meta.intLen).toInt
          val shLen = page.uint(p + meta.intLen, meta.intLen).toInt
          val compression = page.uint(p + 2 * meta.intLen, 1).toInt
          // metadata subheaders always carry compression flag 0, so
          // only consult the signature table for those — a flag-4 row
          // whose payload bytes collide with a signature must still
          // decode as a row
          val isMetaSig = compression == 0 && shLen > 0 &&
            SignatureKind.contains(page.hex(shOff, meta.intLen))
          if (isMetaSig || shLen == 0 || compression == 1) None
          else if (shLen == meta.rowLength) Some((page, shOff)) // stored raw
          else if ((meta.rleCompressed || meta.rdcCompressed) && shLen < meta.rowLength) {
            // shorter-than-row payload in a compressed file = a
            // compressed row (the same length test pandas uses); the
            // file-level marker picked the codec
            val decoded =
              if (meta.rleCompressed) rleDecompress(page.bytes, shOff, shLen, meta.rowLength)
              else rdcDecompress(page.bytes, shOff, shLen, meta.rowLength)
            Some((new Buf(decoded, meta.littleEndian), 0))
          } else None
        }
      case _ => Nil
    }
  }

  private[sources] val SasEpochDay = java.time.LocalDate.of(1960, 1, 1)
  private[sources] val SasEpochMillis = -315619200000L // 1960-01-01T00:00:00Z

  /** Raw numeric cell: Double or null (SAS missing = NaN). Shared by
    * the Row and InternalRow (DataSourceV2) decode paths so the
    * missing-value rule can never drift between them; only the
    * representation-specific date/timestamp conversion stays with
    * each caller.
    */
  private[sources] def numericCell(page: Buf, rowOff: Int, c: SasColumn): java.lang.Double = {
    val d = page.double(rowOff + c.offset, c.width)
    if (d.isNaN) null else java.lang.Double.valueOf(d)
  }

  /** Raw character cell: trailing-space/NUL-trimmed string, or null
    * when fully blank. Shared by both decode paths (see
    * [[numericCell]]).
    */
  private[sources] def stringCell(page: Buf, rowOff: Int, c: SasColumn, encoding: String): String = {
    val raw = page.slice(rowOff + c.offset, c.width)
    var end = raw.length
    while (end > 0 && (raw(end - 1) == ' ' || raw(end - 1) == 0)) end -= 1
    if (end == 0) null else new String(raw, 0, end, encoding)
  }

  private def decodeRow(page: Buf, rowOff: Int, meta: SasMeta, convertDates: Boolean): Row = {
    val vals = meta.columns.map { c =>
      if (c.isNumeric) {
        val d = numericCell(page, rowOff, c)
        if (d == null) null
        else if (convertDates && SasDateFormats.contains(c.format))
          java.sql.Date.valueOf(SasEpochDay.plusDays(d.toLong))
        else if (convertDates && SasDatetimeFormats.contains(c.format))
          new java.sql.Timestamp(SasEpochMillis + math.round(d * 1000.0))
        else d
      } else stringCell(page, rowOff, c, meta.encoding)
    }
    Row.fromSeq(vals)
  }

  /** Spark schema for a parsed file. */
  def sparkSchema(meta: SasMeta, convertDates: Boolean): StructType =
    StructType(meta.columns.map { c =>
      val t =
        if (!c.isNumeric) StringType
        else if (convertDates && SasDateFormats.contains(c.format)) DateType
        else if (convertDates && SasDatetimeFormats.contains(c.format)) TimestampType
        else DoubleType
      StructField(c.name, t, nullable = true)
    })

  /** Read a sas7bdat file into a DataFrame. Pages are decoded in
    * parallel: each task seeks directly to its page range.
    */
  def read(spark: SparkSession, path: String, convertDates: Boolean = true): DataFrame = {
    val (meta, firstDataPage) = readMeta(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fileLen = fsPath.getFileSystem(conf).getFileStatus(fsPath).getLen
    val pageCount = ((fileLen - meta.headerLength) / meta.pageLength).toInt
    val dataPages = pageCount - firstDataPage
    if (dataPages <= 0 || meta.rowCount == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], sparkSchema(meta, convertDates))
    // one partition per ~64 pages (a few hundred KB to a few MB of
    // rows each at common page sizes), capped by default parallelism
    val nParts = math.max(1, math.min(spark.sparkContext.defaultParallelism, (dataPages + 63) / 64))
    val pathStr = path
    val cd = convertDates
    val m = meta
    val rows = spark.sparkContext
      .parallelize(firstDataPage until pageCount, nParts)
      .mapPartitions { pageIdxs =>
        val idxs = pageIdxs.toArray
        if (idxs.isEmpty) Iterator.empty
        else {
          val in = openAt(pathStr)
          // close on task completion, not iterator exhaustion — a
          // limit()/take() that abandons the iterator early would
          // otherwise leak the file handle until GC
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
          idxs.iterator.flatMap { pi =>
            val buf = new Buf(
              readFully(in, m.headerLength.toLong + pi.toLong * m.pageLength, m.pageLength),
              m.littleEndian)
            rowsInPage(buf, m).map { case (b, off) => decodeRow(b, off, m, cd) }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema(meta, convertDates))
  }
}
