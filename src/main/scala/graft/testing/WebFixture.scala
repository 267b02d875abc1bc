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
}
