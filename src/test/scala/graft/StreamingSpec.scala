package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Structured Streaming parity: the streaming tumbling-window aggregation
  * over a bounded file source must equal the batch expression of the same
  * query.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling window equals batch aggregation") {
    // stage the events table as a one-file streaming source dir
    val srcDir = "/root/repo/target/graft-tmp/stream_events"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.tumblingCounts(stream), "tumbling_test")
      .select("hour_start", "event_type", "n_events")

    val batch = spark.read.parquet(srcDir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup drops repeated fingerprints across the stream") {
    import graft.functions.Hashing
    val srcDir = "/root/repo/target/graft-tmp/stream_docs"
    // stage documents twice → every fingerprint appears at least twice
    val docs = Tables.df(spark, sf, "documents").select("doc_id", "text")
    docs.unionAll(docs).coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
      .withColumn("doc_hash", Hashing.polyHash(col("text")))
      .dropDuplicates("doc_hash")

    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("dedup_test")
    assert(out.count() == docs.select("text").distinct().count())
  }
}
