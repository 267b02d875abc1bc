package graft.testing

import java.io.ByteArrayOutputStream

/** Closed-form web-ingest fixtures for [[graft.pipeline.WebIngest]]:
  * gzip members whose inflated text is a pure function of the row
  * index, and structurally honest WARC files (version line, headers,
  * Content-Length-framed bodies, CRLF separators) whose record
  * envelopes and body bytes the DuckDB oracle replays closed-form.
  */
object WebFixture {

  /** The inflated text of gzip fixture i (mirrored by the oracle):
    * "line{i};" repeated 3 + i%7 times. Every 10th row (i % 10 == 9)
    * is a truncated stream the decoder must return null for.
    */
  def gzipText(i: Long): String = ("line" + i + ";") * (3 + (i % 7).toInt)

  def gzipPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(gzipText(i).getBytes("UTF-8"))
    gz.close()
    val b = out.toByteArray
    if (i % 10 == 9) java.util.Arrays.copyOfRange(b, 0, math.min(12, b.length)) else b
  }

  /** Chunked transfer-encoding fixture (mirrored by the q_dechunk
    * oracle): piece j of row i is "seg{j}-{i};", one chunk per piece
    * (lowercase hex sizes; the first chunk carries a chunk extension
    * the decoder must ignore), zero-chunk terminator with a trailer
    * line. Every 10th row truncates mid-chunk and must decode null.
    */
  def chunkedPieceCount(i: Long): Int = (2 + i % 4).toInt

  def chunkedText(i: Long): String =
    (0 until chunkedPieceCount(i)).map(j => s"seg$j-$i;").mkString

  def chunkedPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    for (j <- 0 until chunkedPieceCount(i)) {
      val piece = s"seg$j-$i;".getBytes("US-ASCII")
      val ext = if (j == 0) ";x=1" else ""
      out.write(s"${piece.length.toHexString}$ext\r\n".getBytes("US-ASCII"))
      out.write(piece)
      out.write("\r\n".getBytes("US-ASCII"))
    }
    out.write("0\r\nX-Trailer: t\r\n\r\n".getBytes("US-ASCII"))
    val b = out.toByteArray
    if (i % 10 == 9) java.util.Arrays.copyOfRange(b, 0, b.length / 2) else b
  }

  /** WARC fixture closed forms (mirrored by the q_warc oracle):
    * nRec = 2 + i%4 records; record r has type response/request by
    * parity, target URI = [[UrlFixture.canonical]]((i*7 + r) % 100),
    * body length 30 + ((i*11 + r*5) % 50), body byte k =
    * (i*31 + r*17 + k*7 + 3) % 256.
    */
  def warcRecordCount(i: Long): Int = (2 + i % 4).toInt
  def warcBodyLen(i: Long, r: Int): Int = (30 + ((i * 11 + r * 5) % 50)).toInt
  def warcBodyByte(i: Long, r: Int, k: Int): Int = ((i * 31 + r * 17 + k * 7 + 3) % 256).toInt

  /** HTML fixture (mirrored by the q_html_text oracle): head noise
    * (style + script + comment the extractor must drop whole), the
    * title text twice (title tag + h1), and 2 + i%3 paragraphs with
    * an `&amp;` entity and an inline tag each. The oracle emits the
    * EXPECTED extracted text closed-form.
    */
  def htmlParagraphCount(i: Long): Int = (2 + i % 3).toInt

  def htmlPayload(i: Long): String = {
    val paras = (0 until htmlParagraphCount(i)).map(p =>
      s"<p>Paragraph $p of doc $i with 5 &amp; <b>bold</b> words.</p>").mkString
    s"<!DOCTYPE html><html><head><title>Title $i</title>" +
      s"<style>body{color:#${i % 10}${i % 10}f}</style>" +
      s"<SCRIPT type='text/javascript'>var x = $i < 7 && $i > 2;</SCRIPT></head>" +
      s"<body><!-- comment $i --><h1>Title $i</h1>$paras</body></html>"
  }

  /** HTTP-layer WARC fixture closed forms (mirrored by the
    * q_warc_http oracle): record structure as [[warcPayload]], but
    * response records (even r) wrap their body in a real HTTP
    * envelope — status 200/404 by (r/2) parity, Content-Type
    * text/html;charset vs application/json — around an inner entity
    * body of length 20 + ((i*7 + r*3) % 30) (always two digits, so
    * the envelope length is constant per arm) whose byte k is
    * (i*13 + r*11 + k*5 + 7) % 256. Request records (odd r) carry the
    * SAME closed-form bytes raw — so the oracle's digest formula is
    * one expression for every record.
    */
  def httpInnerLen(i: Long, r: Int): Int = (20 + ((i * 7 + r * 3) % 30)).toInt
  def httpInnerByte(i: Long, r: Int, k: Int): Int = ((i * 13 + r * 11 + k * 5 + 7) % 256).toInt

  def warcHttpPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    for (r <- 0 until warcRecordCount(i)) {
      val ibl = httpInnerLen(i, r)
      val inner = Array.tabulate(ibl)(k => httpInnerByte(i, r, k).toByte)
      val body =
        if (r % 2 == 0) {
          val ok = (r / 2) % 2 == 0
          val status = if (ok) "200 OK" else "404 Not Found"
          val ctype = if (ok) "text/html; charset=utf-8" else "application/json"
          (s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n" +
            s"Content-Length: $ibl\r\n\r\n").getBytes("US-ASCII") ++ inner
        } else inner
      val uri = UrlFixture.canonical((i * 7 + r) % 100)
      val tpe = if (r % 2 == 0) "response" else "request"
      val hdr = "WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n"
      out.write(hdr.getBytes("US-ASCII"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  def warcPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    for (r <- 0 until warcRecordCount(i)) {
      val len = warcBodyLen(i, r)
      val uri = UrlFixture.canonical((i * 7 + r) % 100)
      val tpe = if (r % 2 == 0) "response" else "request"
      val hdr = "WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        s"WARC-Record-ID: <urn:uuid:$i-$r>\r\n" + // an envelope header the splitter skips
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: $len\r\n" +
        "\r\n"
      out.write(hdr.getBytes("US-ASCII"))
      for (k <- 0 until len) out.write(warcBodyByte(i, r, k))
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  // ---- charset fixtures -------------------------------------------

  /** Closed-form charset fixtures (mirrored by the q_charset
    * oracle), one detection path per i % 6: BOM'd UTF-8, BOM'd
    * UTF-16LE, Content-Type-declared ISO-8859-1, meta-declared
    * windows-1252 (with a byte only cp1252 maps: the euro at 0x80),
    * plain UTF-8 proven by strict validation, and a lone 0xE9 that
    * fails UTF-8 validation and falls back to windows-1252.
    */
  def charsetName(i: Long): String = (i % 6) match {
    case 0 => "utf-8"
    case 1 => "utf-16le"
    case 2 => "iso-8859-1"
    case 3 => "windows-1252"
    case 4 => "utf-8"
    case _ => "windows-1252"
  }

  def charsetText(i: Long): String = (i % 6) match {
    case 0 => s"bom utf8 doc $i café"
    case 1 => s"utf16 doc $i é"
    case 2 => s"latin doc $i café"
    case 3 => s"""<html><head><meta charset="windows-1252"></head><body>euro € doc $i</body></html>"""
    case 4 => s"plain utf8 doc $i é—ok"
    case _ => s"fallback doc $i café"
  }

  def charsetDeclared(i: Long): String =
    if (i % 6 == 2) "text/html; charset=ISO-8859-1" else null

  def charsetPayload(i: Long): Array[Byte] = (i % 6) match {
    case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ charsetText(i).getBytes("UTF-8")
    case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++ charsetText(i).getBytes("UTF-16LE")
    case 2 => charsetText(i).getBytes("ISO-8859-1")
    case 3 => charsetText(i).getBytes("windows-1252")
    case 4 => charsetText(i).getBytes("UTF-8")
    case _ => charsetText(i).getBytes("windows-1252")
  }

  // ---- archive fixtures (tar / zip) -------------------------------

  /** Closed-form tar fixture fields (mirrored by the q_tar_members
    * oracle): 2 + i%4 regular files, member j named
    * "dir{i}/file{j}.txt" with body byte k = (i*19 + j*11 + k*3 + 5)
    * % 256 of length 30 + ((i*7 + j*13) % 50). Bodies stay under one
    * block, so member j's header sits at 1024*j. Every i % 7 == 6
    * payload is truncated after the LAST member's header — its data
    * is gone, so exactly the first nm-1 members survive the walk.
    */
  def tarMemberCount(i: Long): Int = (2 + i % 4).toInt
  def tarBodyLen(i: Long, j: Int): Int = (30 + ((i * 7 + j * 13) % 50)).toInt
  def tarBodyByte(i: Long, j: Int, k: Int): Int = ((i * 19 + j * 11 + k * 3 + 5) % 256).toInt

  /** One USTAR entry: header block + body padded to 512-byte blocks. */
  private def writeTarEntry(out: ByteArrayOutputStream, name: String, body: Array[Byte]): Unit = {
    val hdr = new Array[Byte](512)
    def putAscii(off: Int, s: String): Unit = {
      val bs = s.getBytes("US-ASCII")
      System.arraycopy(bs, 0, hdr, off, bs.length)
    }
    putAscii(0, name)
    putAscii(100, "0000644")
    putAscii(108, "0000000")
    putAscii(116, "0000000")
    putAscii(124, f"${body.length}%011o")
    putAscii(136, "00000000000")
    hdr(156) = '0' // regular file
    putAscii(257, "ustar")
    putAscii(263, "00")
    // checksum over the header with its own field as spaces
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    for (k <- 0 until 512) sum += hdr(k) & 0xff
    putAscii(148, f"$sum%06o")
    hdr(154) = 0; hdr(155) = ' '
    out.write(hdr)
    out.write(body)
    val pad = (512 - body.length % 512) % 512
    out.write(new Array[Byte](pad))
  }

  def tarPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    for (j <- 0 until tarMemberCount(i))
      writeTarEntry(out, s"dir$i/file$j.txt",
        Array.tabulate(tarBodyLen(i, j))(k => tarBodyByte(i, j, k).toByte))
    out.write(new Array[Byte](1024)) // end-of-archive trailer
    val b = out.toByteArray
    if (i % 7 == 6) java.util.Arrays.copyOfRange(b, 0, 1024 * (tarMemberCount(i) - 1) + 512)
    else b
  }

  /** A tar archive of MEDIA members (the binary end-to-end chain
    * fixture): 3 members "media{i}/f{j}.bin" whose bodies are
    * [[MediaFixture.payload]](i*3 + j) — so the chain tar-walk →
    * member bytes → media-header parse has a closed-form oracle
    * (the q_media_dims formulas at index i*3+j, including the
    * every-5th corrupt payload the parser must classify 'unknown').
    */
  def mediaTarPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    for (j <- 0 until 3)
      writeTarEntry(out, s"media$i/f$j.bin", MediaFixture.payload(i * 3 + j))
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Closed-form zip fixture fields (mirrored by the q_zip_members
    * oracle): 2 + i%3 members, member j named "z{i}/m{j}.bin" with
    * body byte k = (i*23 + j*13 + k*11 + 9) % 256 of length
    * 25 + ((i*5 + j*17) % 60); even members STORED, odd members
    * DEFLATEd (the decoded bytes — and so the digests — are method-
    * independent). Every i % 9 == 8 payload has its end-of-central-
    * directory signature corrupted and must decode to null.
    */
  def zipMemberCount(i: Long): Int = (2 + i % 3).toInt
  def zipBodyLen(i: Long, j: Int): Int = (25 + ((i * 5 + j * 17) % 60)).toInt
  def zipBodyByte(i: Long, j: Int, k: Int): Int = ((i * 23 + j * 13 + k * 11 + 9) % 256).toInt

  def zipPayload(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val nm = zipMemberCount(i)
    val names = (0 until nm).map(j => s"z$i/m$j.bin".getBytes("UTF-8"))
    val bodies = (0 until nm).map(j =>
      Array.tabulate(zipBodyLen(i, j))(k => zipBodyByte(i, j, k).toByte))
    val crcs = bodies.map { d => val c = new java.util.zip.CRC32; c.update(d); c.getValue }
    val stored = (0 until nm).map { j =>
      if (j % 2 == 0) bodies(j)
      else {
        val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        defl.setInput(bodies(j)); defl.finish()
        val tmp = new ByteArrayOutputStream
        val buf = new Array[Byte](1024)
        while (!defl.finished()) { val n = defl.deflate(buf); tmp.write(buf, 0, n) }
        defl.end()
        tmp.toByteArray
      }
    }
    val localOffs = new Array[Long](nm)
    for (j <- 0 until nm) {
      localOffs(j) = out.size().toLong
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      le16(20); le16(0); le16(if (j % 2 == 0) 0 else 8); le16(0); le16(0)
      le32(crcs(j)); le32(stored(j).length.toLong); le32(bodies(j).length.toLong)
      le16(names(j).length); le16(0)
      out.write(names(j)); out.write(stored(j))
    }
    val cdStart = out.size().toLong
    for (j <- 0 until nm) {
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      le16(20); le16(20); le16(0); le16(if (j % 2 == 0) 0 else 8); le16(0); le16(0)
      le32(crcs(j)); le32(stored(j).length.toLong); le32(bodies(j).length.toLong)
      le16(names(j).length); le16(0); le16(0); le16(0); le16(0); le32(0L)
      le32(localOffs(j))
      out.write(names(j))
    }
    val cdSize = out.size() - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    le16(0); le16(0); le16(nm); le16(nm)
    le32(cdSize); le32(cdStart); le16(0)
    val b = out.toByteArray
    if (i % 9 == 8) b(b.length - 22) = 'Q'.toByte // corrupt the EOCD signature
    b
  }
}
