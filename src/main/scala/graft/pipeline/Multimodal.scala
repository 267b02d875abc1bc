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

  /** Deterministic fake "decode": a fixed-size feature vector derived
    * from the payload bytes (byte histogram moments + length). Stands
    * in for image-resize/audio-spectrogram feature extraction; the
    * real implementation replaces ONLY the body of `features`.
    */
  def decodeStub(payload: Array[Byte], dims: Int): Array[Float] = {
    if (payload == null) return Array.fill(dims)(0f)
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    if (payload.length > 0) {
      var d = 0
      while (d < dims) { out(d) /= math.max(1, payload.length / dims).toFloat; d += 1 }
    }
    out
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
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, frames: Int): DataFrame = {
    val n = octet_length(col(payloadCol))
    val step = greatest((n / frames), lit(1))
    df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), lit(frames - 1)),
          i => md5(substring(col(payloadCol), (i * step + 1).cast("int"), step.cast("int")))
        )
      ).as(Seq("frame_idx", "frame_digest"))
    )
  }
}
