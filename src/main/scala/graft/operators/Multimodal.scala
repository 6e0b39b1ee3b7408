package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as partition-wise batch transforms.
  *
  * The Spark-side architecture is real and tested — schema, partitioning,
  * batch iteration shape — while the actual media decoding is STUBBED
  * (no image/audio libraries in this environment) with a deterministic
  * fake so the plumbing can be verified end-to-end. On a real cluster the
  * stub body is replaced by the codec call (e.g. JNI/FFI decode or a
  * Pandas-UDF in the Python surface); nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps the decode batched per-partition
  * (amortizes codec init), the binary column is never shuffled except by
  * explicit repartition on the id, and feature outputs are narrow columns
  * so downstream pruning drops the payload immediately.
  */
object Multimodal {

  /** Media row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Wrap a text table as fake media rows (payload = utf-8 bytes) so the
    * pipeline can be exercised on the driver testdata.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"))

  /** Frame sampling over an opaque video/audio payload: treat the payload
    * as `ceil(n_bytes / frameBytes)` fixed-size frames and emit every
    * `stride`-th one as (media_id, frame_idx, byte_offset, frame_hash).
    * The plumbing — per-row frame-count arithmetic, `sequence`+`explode`
    * with a stride, offset computation, payload dropped immediately after
    * the per-frame transform — is the real distributed shape; the frame
    * "decode" is the STUBBED deterministic hash of the frame's byte slice
    * (a real codec call replaces exactly that expression). Output is
    * narrow (4 numeric columns), so nothing downstream carries payloads.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    media.select(col("media_id"), col("payload"))
      .withColumn("n_frames",
        ceil(length(col("payload")).cast("double") / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("byte_offset", (col("frame_idx") * frameBytes).cast("long"))
      // stub decode: hash the frame's byte slice (ASCII corpus ⇒ byte
      // slice == character slice, mirrored exactly by the oracle)
      .withColumn("frame_hash", graft.functions.Hashing.polyHash(
        col("payload").cast("string")
          .substr((col("frame_idx") * frameBytes) + 1, lit(frameBytes))))
      .select(col("media_id"), col("frame_idx"), col("byte_offset"), col("frame_hash"))
  }

  /** Resize plumbing: emit a new payload sized for `w`×`h` with updated
    * metadata. The real resample is STUBBED as a deterministic byte
    * truncation/pad to w×h bytes (1 "byte per pixel"); schema flow —
    * payload replaced in place, metadata columns updated, output width
    * bounded regardless of input size — is the production shape, and a
    * codec-backed scaler replaces exactly the payload expression.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    val target = w * h
    media
      .withColumn("payload",
        rpad(col("payload").cast("string").substr(lit(1), lit(target)), target, " ")
          .cast("binary"))
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_hash", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Feature extraction over the opaque payload column.
    *
    * The STUB decode ([[graft.expr.MediaFeatures]]) is a native expression
    * — pure byte arithmetic stays inside the scan pipeline (pruning and
    * pushdown intact, no RDD round-trip). When a real codec replaces the
    * stub, move the call behind `mapInPandas`/`mapPartitions` to amortize
    * codec init per batch; the schema and callers don't change.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val payload = coalesce(col("payload"), lit(Array.empty[Byte]))
    media.select(col("media_id"),
      Bridge.column(graft.expr.MediaFeatures(Bridge.expression(payload))).as("_f"))
      .select(col("media_id"), col("_f.n_bytes").as("n_bytes"),
        col("_f.byte_hash").as("byte_hash"), col("_f.features").as("features"))
  }
}
