package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl ingestion plumbing: gzip payload decode and WARC (ISO
  * 28500) record splitting — the first two steps of turning a raw
  * crawl dump into a document table. Both are pure per-row work that
  * pipelines with the scan (no shuffle), and both treat malformed
  * input as data: a corrupt stream yields null / fewer records, never
  * an exception — at crawl scale broken members and truncated files
  * are routine.
  */
object WebIngest {

  /** Cap on inflated output: a 40-byte gzip bomb can declare
    * gigabytes; past the cap the decode returns null instead of
    * allocating executor memory for it.
    */
  private val maxInflatedBytes: Int = 256 * 1024 * 1024

  /** Decode a gzip payload (multi-member streams included — WARC
    * files are per-record gzip members concatenated) to its raw
    * bytes. Null for non-gzip, corrupt, truncated, or cap-exceeding
    * input IN ANY MEMBER: the members are walked from spec (RFC
    * 1952) with per-member CRC32 + ISIZE verification, because
    * `GZIPInputStream` treats a corrupt or truncated second member
    * as ordinary end-of-stream and would silently return the
    * earlier members' partial bytes instead of failing.
    */
  def gunzip(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return null
    try {
      // long arithmetic: b.length * 4 overflows Int past 512 MiB
      val out = new java.io.ByteArrayOutputStream(math.min(b.length.toLong * 4, 1L << 20).toInt)
      var pos = 0
      while (pos < b.length) {
        pos = inflateMember(b, pos, out)
        if (pos < 0) return null
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null
      case _: OutOfMemoryError => null
    }
  }

  /** Decode ONE gzip member (RFC 1952) starting at `start` into
    * `out`: fixed 10-byte header, optional FEXTRA / FNAME / FCOMMENT
    * / FHCRC fields (FHCRC verified), raw-deflate body, then the
    * 8-byte trailer whose CRC32 and ISIZE are both checked against
    * the inflated bytes. Returns the offset just past the trailer,
    * or -1 on any malformation (reserved flag bits, truncation,
    * deflate error, CRC/length mismatch, inflated-size cap).
    */
  private def inflateMember(b: Array[Byte], start: Int, out: java.io.ByteArrayOutputStream): Int = {
    def u8(i: Int): Int = b(i) & 0xff
    var p = start
    if (b.length - p < 10 || u8(p) != 0x1f || u8(p + 1) != 0x8b || u8(p + 2) != 8) return -1
    val flg = u8(p + 3)
    if ((flg & 0xe0) != 0) return -1 // reserved bits must be zero
    p += 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      if (b.length - p < 2) return -1
      p += 2 + (u8(p) | (u8(p + 1) << 8))
      if (p > b.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC: low 16 bits of the header's CRC32
      if (b.length - p < 2) return -1
      val hc = new java.util.zip.CRC32
      hc.update(b, start, p - start)
      if ((hc.getValue & 0xffffL) != (u8(p) | (u8(p + 1) << 8))) return -1
      p += 2
    }
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return -1 }
        // 0 without finished = needs input we don't have (truncated)
        // or a preset dictionary (not gzip): malformed either way
        if (n == 0 && !inf.finished()) return -1
        if (out.size().toLong + n > maxInflatedBytes) return -1
        crc.update(buf, 0, n)
        out.write(buf, 0, n)
        total += n
      }
      val end = p + inf.getBytesRead.toInt
      if (b.length - end < 8) return -1
      def u32(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      if (u32(end) != crc.getValue) return -1
      if (u32(end + 4) != (total & 0xffffffffL)) return -1
      end + 8
    } finally inf.end()
  }

  private val gunzipUdf = udf((payload: Array[Byte]) => gunzip(payload))

  /** Attach `text` decoded from a gzip payload column (UTF-8, with
    * replacement for invalid sequences — crawl payloads lie about
    * encodings). Undecodable rows get null.
    */
  def withGunzippedText(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("text",
      gunzipUdf(col(payloadCol).cast("binary")).cast("string"))

  /** HTML -> visible text, the step between WARC payloads and the
    * text-analysis operators: drops comments, `<script>`/`<style>`
    * blocks (case-insensitive, contents included), and every
    * remaining tag; decodes the six entities that dominate real
    * markup (`&lt; &gt; &quot; &#39;/&apos; &nbsp; &amp;` — `&amp;`
    * LAST, the single-pass-safe order); collapses all whitespace to
    * single spaces and trims. A chain of codegen'd `regexp_replace`
    * expressions — no UDF, no DOM parse (a DOM is quadratic-ish on
    * the pathological markup a crawl is full of; boilerplate removal
    * beyond tag stripping is [[TextAnalysis.c4Clean]]'s job
    * downstream). Known limit, shared with every regex stripper: a
    * literal `>` inside a quoted attribute value ends the tag early.
    */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Attach `text` extracted from an HTML column. Per-row codegen'd
    * work — pipelines with the scan, no shuffle.
    */
  def withHtmlText(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn("text", htmlToText(col(htmlCol)))

  /** One WARC record's envelope: position in the file payload, the
    * three headers a pipeline routes on, and the body's byte range.
    * The body itself stays IN the payload — like
    * [[Multimodal.mp4SampleTable]], the splitter emits ranges so
    * downstream chooses what to materialize.
    */
  case class WarcRecord(
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      body_offset: Long)

  /** Split a WARC file payload into its records: each starts with a
    * `WARC/x.y` version line, then `Name: value` header lines up to a
    * blank line, then exactly `Content-Length` body bytes, then the
    * `\r\n\r\n` record separator. Header names match
    * case-insensitively (the spec allows any case). Parsing stops at
    * the first malformed record — truncated files yield the records
    * that ARE well-formed. Null for payloads that don't start with a
    * WARC version line.
    */
  def warcSplit(b: Array[Byte]): Array[WarcRecord] = {
    if (b == null || b.length < 9 || !asciiAt(b, 0, "WARC/")) return null
    try {
      val out = Array.newBuilder[WarcRecord]
      var i = 0
      var idx = 0
      while (i < b.length && asciiAt(b, i, "WARC/")) {
        var warcType: String = null
        var uri: String = null
        var len = -1L
        // version line + header lines, each \r\n-terminated
        var lineStart = i
        var headersDone = false
        var ok = true
        while (!headersDone && ok) {
          val eol = indexOfCrlf(b, lineStart)
          if (eol < 0) ok = false
          else if (eol == lineStart) { headersDone = true; lineStart = eol + 2 }
          else {
            val line = new String(b, lineStart, eol - lineStart, "ISO-8859-1")
            val colon = line.indexOf(':')
            if (colon > 0) {
              // Locale.ROOT: the default locale's casing rules (e.g.
              // Turkish dotless i) must not change header matching
              val name = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
              val value = line.substring(colon + 1).trim
              if (name == "warc-type") warcType = value
              else if (name == "warc-target-uri") uri = value
              // a malformed length leaves len at -1: this record is
              // unframeable, and the loop below returns the records
              // accumulated so far instead of nulling the whole file
              else if (name == "content-length") len = value.toLongOption.getOrElse(-1L)
            }
            lineStart = eol + 2
          }
        }
        if (!ok || len < 0 || lineStart + len > b.length) return result(out)
        out += WarcRecord(idx, warcType, uri, len, lineStart.toLong)
        idx += 1
        i = (lineStart + len).toInt
        // the record separator: two CRLFs
        if (i + 4 <= b.length && b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
          i += 4
        else return result(out)
      }
      result(out)
    } catch {
      case _: IndexOutOfBoundsException => null
    }
  }

  private def result(out: scala.collection.mutable.Builder[WarcRecord, Array[WarcRecord]]): Array[WarcRecord] = {
    val r = out.result()
    if (r.isEmpty) null else r
  }

  private def asciiAt(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private val warcSplitUdf = udf((payload: Array[Byte]) => warcSplit(payload))

  /** The one digest convention for exploded byte ranges (md5 over the
    * UPPERCASE hex of `__pl__[off, off+len)`, computed by codegen'd
    * builtins) — shared by [[warcRecords]] and [[warcHttpRecords]] so
    * the convention cannot drift between them.
    */
  private def rangeDigest(offExpr: String, lenExpr: String): Column =
    md5(hex(expr(s"substring(__pl__, CAST($offExpr + 1 AS INT), CAST($lenExpr AS INT))")))

  /** The HTTP envelope inside a WARC response body: status code,
    * media type (the Content-Type value before any `;charset`
    * parameter, trimmed + lowercased), and the entity body's byte
    * range. Null when the range doesn't start with a status line.
    */
  case class HttpParts(status: Int, content_type: String, body_offset: Long, body_len: Long)

  /** Parse the HTTP response envelope in b[off, off+len): status
    * line, case-insensitive headers to the blank line, body = the
    * rest of the range. Same malformed-input stance as
    * [[warcSplit]]: null, never a throw.
    */
  def httpParse(b: Array[Byte], off: Int, len: Int): HttpParts = {
    val end = math.min(off.toLong + len, b.length.toLong).toInt
    if (off < 0 || !asciiAt(b, off, "HTTP/")) return null
    try {
      // every line's CRLF must lie INSIDE the declared range: a pair
      // found straddling `end` belongs to the bytes after the
      // envelope, and treating it as ours parses truncated envelopes
      // as complete ones
      val eol = indexOfCrlf(b, off)
      if (eol < 0 || eol + 2 > end) return null
      val statusLine = new String(b, off, eol - off, "ISO-8859-1")
      val parts = statusLine.split(" ")
      if (parts.length < 2) return null
      val status = parts(1).toIntOption.getOrElse(return null)
      var contentType: String = null
      var lineStart = eol + 2
      while (lineStart < end) {
        val e2 = indexOfCrlf(b, lineStart)
        if (e2 < 0 || e2 + 2 > end) return null
        if (e2 == lineStart) { // blank line: body follows
          val bodyOff = lineStart + 2
          return HttpParts(status, contentType, bodyOff.toLong, math.max(0, end - bodyOff).toLong)
        }
        val line = new String(b, lineStart, e2 - lineStart, "ISO-8859-1")
        val colon = line.indexOf(':')
        if (colon > 0 &&
            line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) == "content-type") {
          // manual ';' slice: a value of ONLY semicolons makes
          // String.split return an EMPTY array, and (0) would abort
          // the whole parse through the catch below
          val value = line.substring(colon + 1)
          val semi = value.indexOf(';')
          contentType = (if (semi >= 0) value.substring(0, semi) else value)
            .trim.toLowerCase(java.util.Locale.ROOT)
        }
        lineStart = e2 + 2
      }
      null // no blank line inside the range: envelope is truncated
    } catch {
      case _: IndexOutOfBoundsException => null
    }
  }

  /** Decode an HTTP/1.1 chunked transfer-encoding body (RFC 9112
    * §7.1): hex-size line (chunk extensions after `;` ignored) CRLF,
    * chunk bytes, CRLF — repeated until the zero-size last chunk
    * (trailers ignored). The OTHER body framing crawls contain
    * besides Content-Length. Null for malformed framing — sizes that
    * aren't hex, chunks running past the buffer — never a throw.
    */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length == 0) return null
    try {
      val out = new java.io.ByteArrayOutputStream
      var i = 0
      while (true) {
        val eol = indexOfCrlf(b, i)
        if (eol < 0) return null
        val line = new String(b, i, eol - i, "ISO-8859-1")
        // manual ';' slice (not split): ";".split(";") is an EMPTY array
        val semi = line.indexOf(';')
        val sizeStr = (if (semi >= 0) line.substring(0, semi) else line).trim
        if (sizeStr.isEmpty || !sizeStr.forall(c => Character.digit(c, 16) >= 0)) return null
        val size = java.lang.Long.parseLong(sizeStr, 16)
        if (size == 0) return out.toByteArray // trailers ignored
        if (size > maxInflatedBytes - out.size()) return null
        val dataStart = eol + 2
        if (dataStart + size + 2 > b.length) return null
        out.write(b, dataStart, size.toInt)
        if (b(dataStart + size.toInt) != '\r' || b(dataStart + size.toInt + 1) != '\n') return null
        i = dataStart + size.toInt + 2
      }
      null // unreachable
    } catch {
      case _: NumberFormatException => null
      case _: IndexOutOfBoundsException => null
    }
  }

  private val dechunkUdf = udf((payload: Array[Byte]) => dechunk(payload))

  /** Attach `text` decoded from a chunked-transfer-encoded body
    * column (UTF-8 with replacement). Malformed framing -> null.
    */
  def withDechunkedText(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("text", dechunkUdf(col(payloadCol).cast("binary")).cast("string"))

  private case class WarcHttpRecord(
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      status: Option[Int],
      content_type: Option[String],
      body_offset: Long,
      body_len: Long)

  private val warcHttpUdf = udf { (payload: Array[Byte]) =>
    val recs = warcSplit(payload)
    if (recs == null) null
    else recs.map { r =>
      val http =
        if (r.warc_type == "response") httpParse(payload, r.body_offset.toInt, r.content_length.toInt)
        else null
      if (http != null)
        WarcHttpRecord(r.rec_idx, r.warc_type, r.target_uri,
          Some(http.status), Option(http.content_type), http.body_offset, http.body_len)
      else
        WarcHttpRecord(r.rec_idx, r.warc_type, r.target_uri,
          None, None, r.body_offset, r.content_length)
    }
  }

  /** [[warcRecords]] plus the HTTP layer: response records'
    * status + media type, and the digest computed over the HTTP
    * ENTITY BODY (what the text pipeline actually consumes), not the
    * raw record body. Non-HTTP or non-response records keep the raw
    * range. The chain a real crawl ingest runs:
    * `warcHttpRecords` -> filter status 200 + text/html ->
    * [[htmlToText]] -> the text operators.
    */
  def warcHttpRecords(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), col("__pl__"), explode(warcHttpUdf(col("__pl__"))).as("__r__"))
      .select(
        col(idCol),
        col("__r__.rec_idx").as("rec_idx"),
        col("__r__.warc_type").as("warc_type"),
        col("__r__.target_uri").as("target_uri"),
        col("__r__.status").as("status"),
        col("__r__.content_type").as("content_type"),
        rangeDigest("__r__.body_offset", "__r__.body_len").as("body_digest"))

  /** Explode a WARC file payload column into one row per record with
    * its envelope headers and a body digest — md5 over the HEX of the
    * body bytes (the [[Multimodal.videoFrames]] convention: faithful,
    * engine-portable, so the operator is oracle-checkable end to
    * end). The digest runs in codegen'd builtins over the exploded
    * ranges; only the envelope parse is a UDF. Per-row work, no
    * shuffle; non-WARC rows vanish.
    */
  def warcRecords(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), col("__pl__"), explode(warcSplitUdf(col("__pl__"))).as("__r__"))
      .select(
        col(idCol),
        col("__r__.rec_idx").as("rec_idx"),
        col("__r__.warc_type").as("warc_type"),
        col("__r__.target_uri").as("target_uri"),
        col("__r__.content_length").as("content_length"),
        rangeDigest("__r__.body_offset", "__r__.content_length").as("body_digest"))

  // ---- archive member extraction (tar / zip) ----------------------

  /** One regular-file member of a tar archive: name, size, and the
    * absolute offset of its data (tar stores bodies uncompressed, so
    * a member is a byte RANGE — digested by builtins, like WARC).
    */
  case class TarMember(member_idx: Int, name: String, n_bytes: Long, body_offset: Long)

  /** Walk a USTAR/POSIX tar payload into its regular-file members:
    * 512-byte headers (checksum VERIFIED — the unsigned byte sum
    * with the checksum field read as spaces), octal sizes, data
    * rounded up to block boundaries, USTAR `prefix` joined onto
    * long names, and the two-zero-block trailer (or EOF) ending the
    * walk. Non-file entries (directories, links, PAX/GNU extension
    * blocks) are skipped but framed over. Same malformed-input
    * stance as [[warcSplit]]: a truncated or corrupt tail yields
    * the members that ARE well-formed; a payload with none is null.
    */
  def tarMembers(b: Array[Byte]): Array[TarMember] = {
    if (b == null || b.length < 512) return null
    try {
      val out = Array.newBuilder[TarMember]
      var i = 0
      var idx = 0
      var done = false
      while (!done && i + 512 <= b.length) {
        var allZero = true
        var k = 0
        while (allZero && k < 512) { if (b(i + k) != 0) allZero = false; k += 1 }
        if (allZero) done = true
        else {
          val stored = tarOctal(b, i + 148, 8)
          var sum = 0L
          k = 0
          while (k < 512) {
            sum += (if (k >= 148 && k < 156) ' '.toInt else b(i + k) & 0xff)
            k += 1
          }
          val size = tarOctal(b, i + 124, 12)
          if (stored < 0 || sum != stored || size < 0) done = true // corrupt header: stop
          else {
            val dataStart = i + 512L
            if (dataStart + size > b.length) done = true // truncated data: stop
            else {
              val typeflag = b(i + 156)
              if (typeflag == '0' || typeflag == 0) {
                val base = tarString(b, i, 100)
                val prefix =
                  if (asciiAt(b, i + 257, "ustar")) tarString(b, i + 345, 155) else ""
                val name = if (prefix.isEmpty) base else prefix + "/" + base
                out += TarMember(idx, name, size, dataStart)
                idx += 1
              }
              i = (dataStart + ((size + 511) / 512) * 512).toInt
            }
          }
        }
      }
      val r = out.result()
      if (r.isEmpty) null else r
    } catch {
      case _: IndexOutOfBoundsException => null
    }
  }

  /** Octal field parse: digits up to the first NUL/space, -1 for
    * anything else (a corrupt header must not frame the walk).
    */
  private def tarOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var k = 0
    var started = false
    while (k < len) {
      val c = b(off + k) & 0xff
      if (c == 0 || c == ' ') { if (started) return v }
      else if (c >= '0' && c <= '7') { started = true; v = v * 8 + (c - '0') }
      else return -1L
      k += 1
    }
    if (started) v else -1L
  }

  private def tarString(b: Array[Byte], off: Int, max: Int): String = {
    var n = 0
    while (n < max && b(off + n) != 0) n += 1
    new String(b, off, n, "ISO-8859-1")
  }

  private val tarUdf = udf((payload: Array[Byte]) => tarMembers(payload))

  /** Explode a tar payload column into one row per regular-file
    * member with a digest over its data range — the [[warcRecords]]
    * convention (md5 over hex, codegen'd; only the header walk is a
    * UDF). Per-row work, no shuffle; non-tar rows vanish.
    */
  def tarMemberRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), col("__pl__"), explode(tarUdf(col("__pl__"))).as("__m__"))
      .select(
        col(idCol),
        col("__m__.member_idx").as("member_idx"),
        col("__m__.name").as("name"),
        col("__m__.n_bytes").as("n_bytes"),
        rangeDigest("__m__.body_offset", "__m__.n_bytes").as("body_digest"))

  /** [[tarMemberRows]] carrying the member BYTES instead of a digest
    * — the feed for downstream binary dispatch (charset sniff, media
    * decode). A tar body is a contiguous range of the payload, so
    * the slice is a codegen'd `substring` on the binary column; only
    * the header walk is a UDF. Per-row, no shuffle.
    */
  def tarMemberBytesRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), col("__pl__"), explode(tarUdf(col("__pl__"))).as("__m__"))
      .select(
        col(idCol),
        col("__m__.member_idx").as("member_idx"),
        col("__m__.name").as("name"),
        col("__m__.n_bytes").as("n_bytes"),
        expr("substring(__pl__, __m__.body_offset + 1, __m__.n_bytes)").as("bytes"))

  /** One decoded zip member: unlike tar, a deflated body is not a
    * byte range of the payload, so the decoded bytes travel in the
    * row (bounded by the same inflation cap as [[gunzip]]).
    */
  case class ZipMember(member_idx: Int, name: String, n_bytes: Long, bytes: Array[Byte])

  /** Decode a zip payload via its CENTRAL DIRECTORY (the correct
    * walk: streaming local headers breaks on data-descriptor
    * entries): locate the end-of-central-directory record from the
    * tail, walk the directory entries, and decode each member from
    * its local header — STORED (method 0) copied, DEFLATE (method 8)
    * inflated raw — verifying the recorded CRC32 against the decoded
    * bytes. Directories (trailing '/') are skipped. Null for
    * non-zip payloads or a corrupt/out-of-range directory; a member
    * that fails its own decode or CRC is dropped (lying members are
    * data), keeping the rest.
    */
  def zipMembers(b: Array[Byte]): Array[ZipMember] = {
    if (b == null || b.length < 22) return null
    try {
      def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
          ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
      // EOCD: last occurrence of PK\x05\x06 within the final 64KB+22
      var eocd = -1
      var p = b.length - 22
      val floor = math.max(0, b.length - 22 - 65535)
      while (eocd < 0 && p >= floor) {
        if (b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 5 && b(p + 3) == 6) eocd = p
        p -= 1
      }
      if (eocd < 0) return null
      val nEntries = u16(eocd + 10)
      val cdOff = u32(eocd + 16)
      if (cdOff > b.length) return null
      val out = Array.newBuilder[ZipMember]
      var e = cdOff.toInt
      var idx = 0
      var total = 0L
      var n = 0
      while (n < nEntries) {
        if (e + 46 > b.length || b(e) != 'P' || b(e + 1) != 'K' || b(e + 2) != 1 || b(e + 3) != 2)
          return result46(out)
        val method = u16(e + 10)
        val crc = u32(e + 16)
        val csize = u32(e + 20)
        val usize = u32(e + 24)
        val nameLen = u16(e + 28)
        val extraLen = u16(e + 30)
        val commentLen = u16(e + 32)
        val localOff = u32(e + 42)
        val name = new String(b, e + 46, nameLen, "UTF-8")
        e += 46 + nameLen + extraLen + commentLen
        n += 1
        if (!name.endsWith("/") && usize <= maxInflatedBytes && total + usize <= maxInflatedBytes &&
            localOff + 30 <= b.length) {
          val lo = localOff.toInt
          if (b(lo) == 'P' && b(lo + 1) == 'K' && b(lo + 2) == 3 && b(lo + 3) == 4) {
            val dataOff = lo + 30 + u16(lo + 26) + u16(lo + 28)
            if (dataOff + csize <= b.length) {
              val decoded: Array[Byte] =
                if (method == 0 && csize == usize)
                  java.util.Arrays.copyOfRange(b, dataOff, dataOff + csize.toInt)
                else if (method == 8) {
                  val inf = new java.util.zip.Inflater(true)
                  try {
                    inf.setInput(b, dataOff, csize.toInt)
                    val buf = new Array[Byte](usize.toInt)
                    var off = 0
                    var bad = false
                    while (!bad && off < buf.length && !inf.finished()) {
                      val got =
                        try inf.inflate(buf, off, buf.length - off)
                        catch { case _: java.util.zip.DataFormatException => bad = true; 0 }
                      if (got == 0 && !inf.finished()) bad = true
                      off += got
                    }
                    if (bad || off != buf.length) null else buf
                  } finally inf.end()
                } else null
              if (decoded != null) {
                val c = new java.util.zip.CRC32
                c.update(decoded)
                if (c.getValue == crc) {
                  out += ZipMember(idx, name, usize, decoded)
                  idx += 1
                  total += usize
                }
              }
            }
          }
        }
      }
      result46(out)
    } catch {
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  private def result46(out: scala.collection.mutable.Builder[ZipMember, Array[ZipMember]]): Array[ZipMember] = {
    val r = out.result()
    if (r.isEmpty) null else r
  }

  private val zipUdf = udf((payload: Array[Byte]) => zipMembers(payload))

  /** Explode a zip payload column into one row per decoded member,
    * digest over the DECODED bytes (md5 over hex — the shared
    * convention, but computed on the inflated member since a
    * deflated body is not a payload range). Per-row work, no
    * shuffle; non-zip rows vanish.
    */
  def zipMemberRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("__pl__"))
      .select(col(idCol), explode(zipUdf(col("__pl__"))).as("__m__"))
      .select(
        col(idCol),
        col("__m__.member_idx").as("member_idx"),
        col("__m__.name").as("name"),
        col("__m__.n_bytes").as("n_bytes"),
        md5(hex(col("__m__.bytes"))).as("body_digest"))

  // ---- charset detection + decode ---------------------------------

  /** Strict UTF-8 validation of b[from, to): continuation structure,
    * overlong forms, surrogate range and the U+10FFFF ceiling all
    * rejected — a permissive check would classify most of Latin-1 as
    * UTF-8 and mojibake the corpus.
    */
  def utf8Valid(b: Array[Byte], from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val (n, min, max) =
          if (c >= 0xc2 && c <= 0xdf) (1, 0x80, 0x7ff)
          else if (c >= 0xe0 && c <= 0xef) (2, 0x800, 0xffff)
          else if (c >= 0xf0 && c <= 0xf4) (3, 0x10000, 0x10ffff)
          else return false // 0x80-0xC1 lead (continuation/overlong) or 0xF5+
        if (i + n >= to) return false
        var cp = c & (0x3f >> n)
        var k = 1
        while (k <= n) {
          val cc = b(i + k) & 0xff
          if ((cc & 0xc0) != 0x80) return false
          cp = (cp << 6) | (cc & 0x3f)
          k += 1
        }
        if (cp < min || cp > max || (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += n + 1
      }
    }
    true
  }

  /** Detect a text payload's charset the way crawl pipelines do, in
    * priority order: byte-order mark; `charset=` parameter of the
    * declared Content-Type; an HTML `<meta charset>` /
    * `http-equiv` declaration in the first 1024 bytes; strict
    * UTF-8 validation of the whole body; windows-1252 as the
    * terminal fallback (the de-facto reading of undeclared 8-bit
    * web bytes — it decodes every byte, so the fallback never
    * fails). Returns a lowercase canonical name.
    */
  def detectCharset(b: Array[Byte], declaredContentType: String): String = {
    if (b == null) return null
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf)
      return "utf-8"
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) return "utf-16be"
    def fromParam(s: String): String = {
      if (s == null) return null
      val m = java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9._:-]+)")
        .matcher(s)
      if (m.find()) canonicalCharset(m.group(1)) else null
    }
    val declared = fromParam(declaredContentType)
    if (declared != null) return declared
    // meta scan over the ASCII shadow of the head (spec: 1024 bytes)
    val head = new String(b, 0, math.min(b.length, 1024), "ISO-8859-1")
    val meta = java.util.regex.Pattern.compile("(?is)<meta\\s[^>]*>").matcher(head)
    while (meta.find()) {
      val tag = meta.group()
      val cs = java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9._:-]+)")
        .matcher(tag)
      if (cs.find()) return canonicalCharset(cs.group(1))
    }
    if (utf8Valid(b, 0, b.length)) "utf-8" else "windows-1252"
  }

  /** Canonical lowercase charset names for the aliases crawl data
    * actually carries; unknown names fall to windows-1252 (decoding
    * must never fail on a label).
    */
  private def canonicalCharset(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "utf8" | "utf-8"                      => "utf-8"
      case "utf-16le" | "utf16le"                => "utf-16le"
      case "utf-16be" | "utf16be" | "utf-16"     => "utf-16be"
      case "latin1" | "latin-1" | "iso-8859-1" | "iso8859-1" => "iso-8859-1"
      case "us-ascii" | "ascii"                  => "us-ascii"
      case "windows-1252" | "cp1252" | "win-1252" => "windows-1252"
      case _                                      => "windows-1252"
    }

  /** Decode `b` under a [[detectCharset]] verdict, stripping the BOM
    * when present. Never throws: every supported charset decodes
    * every byte sequence (malformed UTF-8 inputs never reach here —
    * detection already demoted them to windows-1252).
    */
  def decodeText(b: Array[Byte], charset: String): String = {
    if (b == null || charset == null) return null
    val (from, cs) = charset match {
      case "utf-8" =>
        (if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0,
          java.nio.charset.StandardCharsets.UTF_8)
      case "utf-16le" =>
        (if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) 2 else 0,
          java.nio.charset.StandardCharsets.UTF_16LE)
      case "utf-16be" =>
        (if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) 2 else 0,
          java.nio.charset.StandardCharsets.UTF_16BE)
      case "iso-8859-1" => (0, java.nio.charset.StandardCharsets.ISO_8859_1)
      case "us-ascii"   => (0, java.nio.charset.StandardCharsets.ISO_8859_1) // superset-safe
      case _            => (0, java.nio.charset.Charset.forName("windows-1252"))
    }
    new String(b, from, b.length - from, cs)
  }

  private val charsetUdf = udf((b: Array[Byte], declared: String) => detectCharset(b, declared))
  private val decodeTextUdf = udf((b: Array[Byte], cs: String) => decodeText(b, cs))

  /** Attach `charset` (detected) and `text` (decoded, BOM-stripped)
    * to a raw byte-payload column, given the transport's declared
    * Content-Type column (pass a null literal column when absent).
    * Per-row work, no shuffle — the step between the HTTP envelope
    * and every downstream text operator.
    */
  def withDecodedText(df: DataFrame, payloadCol: String, contentTypeCol: String): DataFrame =
    df.withColumn("charset", charsetUdf(col(payloadCol).cast("binary"), col(contentTypeCol)))
      .withColumn("text", decodeTextUdf(col(payloadCol).cast("binary"), col("charset")))
}
