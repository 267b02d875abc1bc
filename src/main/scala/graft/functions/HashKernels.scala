package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native Catalyst hash expressions
  * ([[graft.plans.MinhashSignatureExpr]] /
  * [[graft.plans.SimhashBitsExpr]]). They operate directly on
  * Tungsten's `UTF8String`/`ArrayData` — no encoder round-trip to
  * `Seq[String]` like a Scala UDF pays — and are called by the
  * generated code of whole-stage codegen (objects compile to static
  * forwarders, so `graft.functions.MinhashKernel.signature(...)` is a
  * plain static call in janino's output).
  *
  * Semantics are bit-identical to the oracle-mirrored expression
  * specs ([[graft.pipeline.Dedup.minhashSignature]] /
  * [[graft.pipeline.Dedup.simhashFromMd5s]]), including their
  * null-element behavior: `least` skips nulls, so a null shingle is a
  * no-op lane update; a null word votes -1 on every simhash bit
  * (when(null).otherwise(-1)).
  */
object MinhashKernel {

  private val hexChars = "0123456789abcdef".toCharArray
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Lexicographic-min lanes over 8-hex-char md5 slices — see
    * [[graft.pipeline.Dedup.minhashSignature]] for the lane layout
    * (digest d feeds lanes [4d, 4d+4); "g" is the fold's +infinity).
    */
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val nDigests = (numHashes + 3) / 4
    val md = mdPool.get()
    val mins = Array.fill(numHashes)("g")
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val sBytes = s.getBytes
        var d = 0
        while (d < nDigests) {
          md.reset()
          md.update(sBytes)
          var j = 0
          while (j < d) { md.update('#'.toByte); j += 1 }
          val dig = md.digest()
          var lane = d * 4
          val laneEnd = math.min(lane + 4, numHashes)
          while (lane < laneEnd) {
            val b0 = (lane % 4) * 4
            val sb = new java.lang.StringBuilder(8)
            var b = b0
            while (b < b0 + 4) {
              sb.append(hexChars((dig(b) >> 4) & 0xf))
              sb.append(hexChars(dig(b) & 0xf))
              b += 1
            }
            val hex = sb.toString
            if (hex.compareTo(mins(lane)) < 0) mins(lane) = hex
            lane += 1
          }
          d += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = UTF8String.fromString(mins(k)); k += 1 }
    new GenericArrayData(out)
  }

  /** Banded LSH signatures in ONE kernel call: band `b` is the
    * `"|"`-join of signature lanes `[b*r, (b+1)*r)` (`r = numHashes /
    * nBands`) — exactly the band construction of
    * `Dedup.minhashCandidates`. A single-call form matters wherever a
    * persist barrier is unavailable (streaming plans): a banding
    * expression that references a signature COLUMN once per lane gets
    * projection-collapsed into `numHashes` signature evaluations per
    * row, re-hashing every shingle each time.
    */
  def bands(shingles: ArrayData, numHashes: Int, nBands: Int): ArrayData = {
    val rows = numHashes / nBands
    val sig = signature(shingles, numHashes)
    val out = new Array[AnyRef](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(rows * 9)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('|')
        sb.append(sig.getUTF8String(b * rows + r).toString)
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Kernel behind [[graft.plans.DotProductExpr]]: left-to-right
  * double accumulation over the element pairs — the SAME summation
  * order as the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` expression
  * spec, so results are bit-identical, INCLUDING the HOF edge cases:
  * zip_with pads a length mismatch with nulls and `null * x` /
  * `acc + null` null out the whole fold, so `dotOrNull` returns null
  * (boxed) exactly when the HOF form would — which is what lets
  * [[graft.plans.RewriteDotProduct]] substitute it for user-written
  * folds as a true semantics-preserving optimization.
  */
object ShingleKernel {

  private val space = UTF8String.fromString(" ")

  /** All word n-grams joined by single spaces — the codegen'd twin
    * of [[graft.pipeline.Dedup.shinglesFromWords]] (the oracle-
    * mirrored expression spec: `concat_ws` semantics, so a null word
    * is skipped by the join — unreachable from `splitWords` anyway).
    * Fewer than `n` words yields an empty array. Replaces the Scala
    * UDF on the dedup hot paths: same output, no encoder round-trip
    * (the UDF decoded the word array to Seq[String] and re-encoded
    * the shingle Seq per row), and the codegen span stays unbroken.
    */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = words.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object VectorKernel {

  /** One-pass int8 quantization of a double vector — the fused twin
    * of the `array_max(transform(abs)) / 127` + `transform(round(x /
    * scale))` expression pair [[graft.pipeline.Similarity.quantizeInt8]]
    * replaced: three interpreted lambda passes become one primitive
    * loop. Returns (codes: int[], scale) as an InternalRow.
    *
    * Bit-identical by construction: the scale is the same
    * `maxAbs / 127.0` IEEE division, and each code replays Spark's
    * own `round(x, 0)` arithmetic for DoubleType —
    * `BigDecimal.valueOf(x)` (decimal-string construction) rounded
    * HALF_UP — so an existing oracle replay of the expression form
    * gates this kernel unchanged. Null elements stay null-propagated
    * like the lambda form (a null component yields a null code); the
    * all-zero vector gets scale 0 and all-zero codes.
    *
    * NaN contract (r16): a vector with ANY NaN component quantizes
    * like the zero vector — scale 0.0, every non-null code 0. The
    * pre-r16 behavior (NaN scale, all-zero codes via `NaN.toInt`)
    * let a corrupt embedding slip past zero-vector guards and serve
    * garbage from a stored index; scale 0.0 makes the row
    * indistinguishable from the zero vector every Similarity path
    * already excludes. (In-repo top-k callers never reach this:
    * `dropZeroVectors` explicitly filters NaN-bearing vectors — NaN
    * orders GREATER than every number in both Spark and DuckDB, so
    * its `dot > 0` alone would have kept them — but the quantize
    * surface is public and the stored-index layout is long-lived, so
    * the kernel defends its own contract too.)
    */
  def int8Quantize(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var hasNaN = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (java.lang.Double.isNaN(a)) hasNaN = true
        else if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = if (hasNaN) 0.0 else maxAbs / 127.0
    // Exact half-away-from-zero on the BINARY value: c = floor(|x|),
    // frac = |x| - c is computed exactly (both are multiples of
    // ulp(|x|) in the same binade), so the >= 0.5 test never
    // misreads a near-boundary double the way floor(x + 0.5) does.
    // For scale-0 rounding this is bit-identical to Spark's
    // BigDecimal(shortest-decimal) HALF_UP — every k.5 decimal
    // boundary below 2^51 is an exactly-representable double, so the
    // decimal and binary readings of "the half" coincide — and to
    // DuckDB's std::round; the int8 oracles gate all three.
    def roundHalfAway(x: Double): Int = {
      val a = math.abs(x)
      val f = math.floor(a)
      val r = if (a - f >= 0.5) f + 1.0 else f
      (if (x < 0) -r else r).toInt
    }
    var hasNull = false
    i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (!hasNull) {
      val codes = new Array[Int](n)
      if (scale != 0.0) {
        i = 0
        while (i < n) { codes(i) = roundHalfAway(v.getDouble(i) / scale); i += 1 }
      }
      row.update(0, org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes))
    } else {
      val codes = new Array[Any](n)
      i = 0
      while (i < n) {
        if (v.isNullAt(i)) codes(i) = null
        else if (scale == 0.0) codes(i) = 0
        else codes(i) = roundHalfAway(v.getDouble(i) / scale)
        i += 1
      }
      row.update(0, new GenericArrayData(codes))
    }
    row.update(1, scale)
    row
  }

  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[dotOrNull]] over int8 CODE arrays kept in their stored 1-byte
    * form — the element product is at most 127², the 64-term sum far
    * below 2^53, so accumulating in double is EXACT and the result
    * is bit-identical to casting both sides to `array<double>`
    * first. Keeping the cast out means the scoring joins and
    * shuffles of the int8 ANN paths carry 1-byte elements instead of
    * the 8-byte doubles the cast would inflate them to.
    */
  def dotOrNullBB(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toDouble * b.getByte(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Mixed double × int8 dot — same exactness argument as
    * [[dotOrNullBB]] (the byte side widens to double losslessly).
    */
  def dotOrNullDB(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getByte(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

object SimhashKernel {

  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Per-bit sign of word-hash votes — see
    * [[graft.pipeline.Dedup.simhashFromMd5s]] for the bit layout
    * (bit k = high bit of md5 hex nibble k).
    */
  def bits(words: ArrayData, nBits: Int): UTF8String = {
    val md = mdPool.get()
    val votes = new Array[Int](nBits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w == null) {
        // mirror the expression spec: when(substring(null..)).otherwise(-1)
        var b = 0
        while (b < nBits) { votes(b) -= 1; b += 1 }
      } else {
        md.reset()
        val dig = md.digest(w.getBytes)
        var b = 0
        while (b < nBits) {
          val by = dig(b >> 1)
          val hi = if ((b & 1) == 0) (by >> 7) & 1 else (by >> 3) & 1
          votes(b) += (if (hi == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(nBits)
    var b = 0
    while (b < nBits) { sb.append(if (votes(b) >= 0) '1' else '0'); b += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** One-pass sliding-window xxhash64 kernel behind
  * [[graft.plans.WindowHashesExpr]] — the ExactSubstr grid hot path.
  * `substr(o+1, window)` in a loop is quadratic on UTF8String (every
  * call scans from byte 0 to find its codepoint offset) and the
  * struct-lambda `transform` form is an interpreted codegen barrier;
  * this computes the char→byte offset table once and hashes each
  * window's byte range in place. Hashes equal Spark's
  * `xxhash64(substr(text, o+1, window))` EXACTLY (same bytes, same
  * seed-42 XXH64), pinned in PipelineSpec.
  */
object WindowHashKernel {

  /** xxhash64 of every `stride`-spaced `window`-char window of
    * `text`, in offset order; empty array when the text is shorter
    * than the window.
    */
  def hashes(text: UTF8String, window: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes // materializes at most once (heap copy if off-heap slice)
    val n = bytes.length
    // char-start byte offsets (ASCII fast path: offsets are identity)
    var nChars = 0
    var i = 0
    while (i < n) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    if (nChars < window) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < n) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(nChars) = n
    val nWin = (nChars - window) / stride + 1
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val o = w * stride
      val from = starts(o)
      val until = starts(o + window)
      out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      w += 1
    }
    new GenericArrayData(out)
  }
}

object WinnowKernel {

  private val Mod = 1000000007L
  private val Base = 31L

  /** Winnowed fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm) of ALREADY-NORMALIZED ASCII text: polynomial k-gram
    * hashes (base 31 mod 1e9+7 — the [[graft.pipeline.TextAnalysis]]
    * rolling-hash arithmetic, replayable in any exact-integer SQL
    * engine), then the RIGHTMOST minimum of every window of `w`
    * consecutive grams, deduplicated by gram position. Returns
    * array<struct<pos:int, hash:long>> in position order; fewer than
    * `w` grams select the single rightmost minimum; fewer than `k`
    * chars select nothing.
    *
    * Guarantee (mirrors the ExactSubstr stride contract): at least
    * one gram of every `w` consecutive is fingerprinted, so any two
    * documents sharing a normalized substring of length >=
    * `w + k - 1` share at least one fingerprint HASH. O(n) via a
    * rolling hash and a monotonic deque (pop `>=` so ties keep the
    * newer index — the rightmost-min rule that makes the selection
    * position-stable under prefix edits).
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val ng = n - k + 1
    if (ng <= 0) return new GenericArrayData(Array.empty[Any])
    // precompute Base^(k-1) mod Mod for the rolling drop term
    var powK = 1L
    var t = 0
    while (t < k - 1) { powK = powK * Base % Mod; t += 1 }
    val hashes = new Array[Long](ng)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xffL)) % Mod; i += 1 }
    hashes(0) = h
    var j = 1
    while (j < ng) {
      val drop = (bytes(j - 1) & 0xffL) * powK % Mod
      h = ((h - drop + Mod) % Mod * Base + (bytes(j + k - 1) & 0xffL)) % Mod
      hashes(j) = h
      j += 1
    }
    // monotonic deque of gram indices, hashes strictly increasing
    // front->back; popping >= keeps the NEWER equal hash (rightmost)
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var lastSel = -1
    val firstWindowEnd = math.min(w, ng) - 1
    var g = 0
    while (g < ng) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(g)) tail -= 1
      deque(tail) = g; tail += 1
      val windowStart = g - w + 1
      while (deque(head) < windowStart) head += 1
      // a window completes at each g >= firstWindowEnd; record its
      // (rightmost) minimum once per distinct selected position
      if (g >= firstWindowEnd && deque(head) != lastSel) {
        lastSel = deque(head)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](lastSel, hashes(lastSel)))
      }
      g += 1
    }
    new GenericArrayData(out.toArray)
  }
}
