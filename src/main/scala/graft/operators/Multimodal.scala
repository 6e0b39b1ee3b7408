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

  /** STUB decode: a real deployment calls the media codec here. The fake
    * derives deterministic "features" from the raw bytes so the batch
    * shape, schema, and partition-wise execution are fully testable.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Long, Array[Double]) = {
    // ??? <- real codec goes here (e.g. JPEG decode → pixels)
    val nBytes = payload.length
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h * 31 + (payload(i) & 0xff)) % 2147483647L; i += 1 }
    val feat = Array.tabulate(4)(j => ((h >> (j * 8)) & 0xff) / 255.0)
    (nBytes, h, feat)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_hash", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Partition-wise feature extraction over the opaque payload column. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (n, h, feat) = decodeStub(payload)
        Row(id, n, h, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
