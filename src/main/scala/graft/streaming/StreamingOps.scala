package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming surface — extension beyond the reference (which has
  * no streaming at all, SURVEY.md §2.10). The transforms are shared with
  * the batch `Events` queries so stream and batch results are provably
  * identical on the same input (StreamingSpec asserts this).
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded by
  * (window span / slide) × key cardinality; state lives in the state store
  * per shuffle partition, so key skew is the only thing to watch —
  * high-cardinality keys partition evenly by hash.
  */
object StreamingOps {

  /** The events schema as the streaming reader needs it declared. */
  def eventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** Tumbling 1-hour window aggregation — same shape as the batch
    * `events_tumbling_window` query, expressed with a streaming-native
    * `window()` + watermark for late data.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Run a streaming query over a bounded source into an in-memory table
    * and block until all available input is processed (test/dev harness).
    */
  def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
