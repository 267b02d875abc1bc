package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so codecs initialize once
  * per task, not once per row.
  *
  * The actual media codecs are NOT available in this environment, so
  * `decodeStub` produces a deterministic fake feature vector from the
  * bytes — the Spark-side contract (schema, batching, partition
  * shape) is real and tested; swap `decodeStub` for a real codec at
  * deployment.
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

  /** Wrap a binary column with extracted metadata (codegen'd — no
    * decode needed for length/digest bookkeeping).
    */
  def withMediaMetadata(df: DataFrame, payloadCol: String, mime: String): DataFrame =
    df.withColumn("mime", lit(mime))
      .withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("digest", md5(col(payloadCol)))

  /** Deterministic fake "decode": feature d is the mean normalized
    * byte value over the stride lane `i % dims == d` (0 when the lane
    * is empty). Stands in for image-resize/audio-spectrogram feature
    * extraction; the real implementation replaces ONLY this body.
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
