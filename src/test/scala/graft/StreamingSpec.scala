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

  test("incremental matview refresh equals a streaming aggregation over the table dir") {
    // a warehouse table directory IS a file streaming source: appends
    // land as new parquet files, exactly what both the matview's
    // incremental refresh and Structured Streaming's file source pick
    // up. The matview after each refresh must equal the complete-mode
    // streaming aggregation of the same query — the "materialized view
    // = continuous query" equivalence, checked batch by batch.
    val wh = freshDir("/root/repo/target/graft-tmp/ivm-stream-warehouse")
    val engine = new graft.engine.Engine(spark, wh)
    engine.run("create table ivs(g varchar, v int)")
    engine.run("insert into ivs values ('a', 1), ('b', 2)")
    engine.run("create materialized view ivsv as " +
      "select g, count(*) as n, sum(v) as s from ivs group by g")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("g string, v int"))
      .parquet(s"$wh/ivs")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ivm_twin").start()
    try {
      val appends = Seq(
        "insert into ivs values ('a', 10), ('c', 3)",
        "insert into ivs values (NULL, 7), ('c', 4)",
        "insert into ivs values ('b', 5), (NULL, 1)")
      appends.foreach { ins =>
        engine.run(ins)
        val mode = engine.run("refresh materialized view ivsv")
          .collect()(0).getString(0)
        assert(mode == "incremental", s"expected incremental, got $mode")
        q.processAllAvailable()
        val view = engine.run("select g, n, s from ivsv").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        val streamed = spark.table("ivm_twin").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(view == streamed, s"view=$view streamed=$streamed")
      }
    } finally q.stop()
  }

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

  test("streaming sliding window equals batch aggregation") {
    val srcDir = "/root/repo/target/graft-tmp/stream_events"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.slidingCounts(stream), "sliding_test")
    val batch = spark.read.parquet(srcDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n_events"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // overlap invariant: every event is in exactly 4 windows
    val evs = spark.read.parquet(srcDir).count()
    val winTotal = batch.agg(sum(col("n_events"))).head().getLong(0)
    assert(winTotal == 4 * evs)
  }

  test("curation operators run unchanged on a stream (quality-filter pipeline)") {
    // per-row curation transforms (language ID, quality scoring, token
    // counts, fingerprints) are narrow maps, so the SAME operator code
    // drives a streaming quality-filter pipeline — the shape a continuous
    // ingestion corpus filter runs at scale
    val srcDir = "/root/repo/target/graft-tmp/stream_docs"
    Tables.df(spark, sf, "documents").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)

    val streamed = StreamingOps.runToMemory(
      graft.operators.TextAnalysis.qualityScore(stream, "doc_id", "text")
        .filter(col("quality") >= 0.5),
      "quality_stream", outputMode = "append")
    val batch = graft.operators.TextAnalysis
      .qualityScore(spark.read.parquet(srcDir), "doc_id", "text")
      .filter(col("quality") >= 0.5)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("gopher quality filter runs unchanged on a stream (batch parity)") {
    // the rule battery is pure per-row expressions, so the same operator
    // drives a continuous ingestion filter with exact batch parity
    val srcDir = "/root/repo/target/graft-tmp/stream_docs_gopher"
    Tables.df(spark, sf, "documents").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val sw = Seq("the", "a", "of", "and", "is")
    val streamed = StreamingOps.runToMemory(
      graft.operators.TextAnalysis.gopherQuality(stream, "doc_id", "text", sw)
        .filter(col("keep")),
      "gopher_stream", outputMode = "append")
    val batch = graft.operators.TextAnalysis
      .gopherQuality(spark.read.parquet(srcDir), "doc_id", "text", sw)
      .filter(col("keep"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("custom-state sessionization (flatMapGroupsWithState) equals batch sessions on the flushed prefix") {
    val srcDir = "/root/repo/target/graft-tmp/stream_events"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)

    val streamed = StreamingOps.runToMemory(
      StreamingOps.sessionizeStream(stream, 1800), "sessionize_test", "append")
      .select("user_id", "start_s", "end_s", "n_events")

    // batch twin: same gap rule over the same file
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_s"))
    val batch = spark.read.parquet(srcDir)
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("t_s"))
      .withColumn("prev", lag(col("t_s"), 1).over(w))
      .withColumn("new_sess", when(col("prev").isNull || col("t_s") - col("prev") > 1800, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min(col("t_s")).as("start_s"), max(col("t_s")).as("end_s"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_s", "end_s", "n_events")

    // sessions still open at end-of-stream may not flush under AvailableNow;
    // everything the stream DID emit must be a batch session, and every
    // batch session that ended a full gap before the watermark must appear
    val maxTs = spark.read.parquet(srcDir)
      .agg(max(col("ts").cast("timestamp").cast("long"))).collect()(0).getLong(0)
    val mustFlush = batch.filter(col("end_s") + 1800 + 2 < maxTs)
    assert(streamed.exceptAll(batch).isEmpty, "stream emitted a session batch does not have")
    assert(mustFlush.exceptAll(streamed).isEmpty, "a closed session was never emitted")
    assert(streamed.count() > 0)
  }

  test("streaming EWMA equals the batch windowed EWMA bit-for-bit") {
    val srcDir = "/root/repo/target/graft-tmp/stream_events"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)

    val streamed = StreamingOps.runToMemory(
      StreamingOps.ewmaStream(stream), "ewma_test", "append")
      .select("user_id", "event_id", "ewma")

    // batch twin IS the gate query (same k=8, alpha=0.5 fold); exact
    // equality works because every weight is a power of two
    val batch = SparkEntry.registry("events_ewma").fn(spark, sf)

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming rolling z-score equals the batch window bit-for-bit") {
    val srcDir = "/root/repo/target/graft-tmp/stream_events"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)

    val streamed = StreamingOps.runToMemory(
      StreamingOps.zscoreStream(stream), "zscore_test", "append")
      .select("user_id", "event_id", "z", "is_anom")

    val batch = SparkEntry.registry("events_rolling_zscore").fn(spark, sf)

    assert(streamed.count() == batch.count())
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

  test("streaming curation equals the batch filter/redact/dedup, across batches") {
    import spark.implicits._
    import graft.functions.Hashing
    import org.apache.spark.sql.expressions.Window
    val srcDir = "/root/repo/target/graft-tmp/stream_curate"
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(120)
    // exact copies with HIGHER ids arriving as a separate file (later
    // micro-batch): the stream must keep only the originals
    val copies = docs.limit(40)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val d = new java.io.File(srcDir)
    if (d.exists()) d.listFiles().foreach(_.delete())
    docs.coalesce(1).write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes: the file SOURCE orders batches by them
    copies.coalesce(1).write.mode("append").parquet(srcDir)
    val qMin = 0.3
    val pii = """\d{3}-\d{2}-\d{4}"""

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.curateStream(stream, qualityMin = qMin, piiPattern = pii),
      "curate_test", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

    // batch twin: quality filter → first-id-per-hash → redact
    val all = docs.unionAll(copies)
    val w = Window.partitionBy(col("_h")).orderBy(col("doc_id"))
    val batch = all
      .filter(graft.operators.TextAnalysis.qualityExpr(col("text")) >= qMin)
      .withColumn("_h", Hashing.polyHash(col("text")))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("doc_id"),
        regexp_replace(col("text"), pii, "[REDACTED]").as("redacted"),
        size(regexp_extract_all(col("text"), lit(pii), lit(0))).as("n_redacted"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(2)} batch-only=${(batch -- streamed).take(2)}")
    // the late exact copies were all suppressed
    assert(!streamed.exists(_._1 >= 1000000L))
  }

  test("streaming exact-substring evidence is verified and catches every copy") {
    import spark.implicits._
    val srcDir = "/root/repo/target/graft-tmp/stream_substr"
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(40)
    // exact copies (id-shifted) arrive alongside: every copy shares all
    // its windows with the original and must emit evidence against it
    val copies = docs.filter(length(col("text")) >= 30)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    docs.unionAll(copies).coalesce(1).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val out = StreamingOps.runToMemory(
      StreamingOps.exactSubstringStream(stream, span = 30),
      "substr_stream_test", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    // every evidence row is TRUE: the span occurs in both docs' texts
    val txt = docs.unionAll(copies).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, rep, s) =>
      assert(s.length == 30 && txt(id).contains(s) && txt(rep).contains(s),
        s"false evidence: ($id, $rep, '$s')")
    }
    // every exact copy emits evidence (its windows all collide with the
    // original's buckets, and the rep's span string verifies)
    val flagged = out.map(_._1).toSet
    val copyIds = copies.collect().map(_.getLong(0)).toSet
    assert(copyIds.subsetOf(flagged),
      s"copies without evidence: ${copyIds.diff(flagged).take(5)}")
  }

  test("streaming near-dup flags exact and near copies, not distinct docs") {
    import spark.implicits._
    val srcDir = "/root/repo/target/graft-tmp/stream_neardup"
    // corpus + an exact copy (ids shifted) + clearly-distinct docs: every
    // copy must flag against its original, no distinct doc may flag
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(50)
    val copies = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    docs.unionAll(copies).coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val out = StreamingOps.runToMemory(
      StreamingOps.nearDupStream(stream, threshold = 0.9),
      "neardup_test", outputMode = "append")
      .select("doc_id", "dup_of").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // every flagged pair must be a true near-dup (exact shingle Jaccard —
    // an est ≥ 0.9 from a 16-hash signature implies true J well above 0.5;
    // the corpus contains ORGANIC near-dups, so text equality is too strict)
    import graft.functions.Hashing
    assert(out.nonEmpty)
    val t = docs.unionAll(copies)
    val falseFlags = out.toSeq.toDF("id", "rep")
      .join(t.select(col("doc_id").as("id"), col("text").as("_ta")), "id")
      .join(t.select(col("doc_id").as("rep"), col("text").as("_tb")), "rep")
      .withColumn("jac", Hashing.jaccard(
        Hashing.shingleHashes(col("_ta"), 3), Hashing.shingleHashes(col("_tb"), 3)))
      .filter(col("jac") < 0.5).collect()
    assert(falseFlags.isEmpty, s"false near-dups: ${falseFlags.take(3).mkString}")
    // every exact copy is flagged (identical signature → est = 1.0 in
    // every band; the copy always probes its original's buckets)
    val flagged = out.map(_._1).toSet
    val dupIds = copies.collect().map(_.getLong(0)).toSet
    assert(dupIds.subsetOf(flagged),
      s"unflagged exact copies: ${dupIds.diff(flagged).take(5)}")
  }

  test("bpe encoding and temperature sampling run unchanged on a stream") {
    // both are stateless per-row transforms once their tiny frames exist
    // (merge table / per-domain rates) — the continuous-ingestion shape:
    // train offline, apply on the stream
    val srcDir = "/root/repo/target/graft-tmp/stream_docs_bpe"
    val docs = Tables.df(spark, sf, "documents")
    docs.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val merges = graft.operators.Bpe.trainMerges(docs, "text", numMerges = 20)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)

    val streamed = StreamingOps.runToMemory(
      graft.operators.Bpe.tokenized(stream, "doc_id", "text", merges)
        .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 100, "str") < 50),
      "bpe_stream_test", outputMode = "append")
    val batch = graft.operators.Bpe.tokenized(
        spark.read.parquet(srcDir), "doc_id", "text", merges)
      .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 100, "str") < 50)

    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("sq8 encoding runs unchanged on a stream (fit offline, apply live)") {
    // the production quantization shape: bounds fit on the offline corpus
    // (plan literals), the byte encode is a stateless per-row map that
    // applies to a continuous embedding stream with batch parity
    val srcDir = "/root/repo/target/graft-tmp/stream_emb_sq8"
    val emb = Tables.df(spark, sf, "embeddings")
    emb.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val bounds = graft.operators.Similarity.sq8Bounds(emb)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      graft.operators.Similarity.sq8Codes(stream, bounds),
      "sq8_stream_test", outputMode = "append")
    val batch = graft.operators.Similarity.sq8Codes(
      spark.read.parquet(srcDir), bounds)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("stream-stream interval join equals the batch join on bounded input") {
    val srcDir = "/root/repo/target/graft-tmp/stream_events_ssj"
    Tables.df(spark, sf, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    def stream() = spark.readStream
      .schema(StreamingOps.eventsSchema).parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.viewClickJoin(stream(), stream(), withinSeconds = 600),
      "ssj_test", outputMode = "append")
    val batch = StreamingOps.viewClickJoin(
      spark.read.parquet(srcDir), spark.read.parquet(srcDir),
      withinSeconds = 600)
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("decontamination runs unchanged as a stream-static broadcast join") {
    // continuous-ingestion shape: new train docs arrive as a stream and
    // are checked against a STATIC benchmark gram set — the same
    // Curation.decontaminate code, fed a streaming frame, becomes a
    // stream-static broadcast join + streaming aggregation
    val srcDir = "/root/repo/target/graft-tmp/stream_train_docs"
    val docs = Tables.df(spark, sf, "documents")
    val train = docs.filter(col("source") =!= "src0")
    val evalSet = docs.filter(col("source") === "src0")
    train.coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val streamed = StreamingOps.runToMemory(
      graft.operators.Curation.decontaminate(stream, evalSet, "doc_id", "text", w = 5),
      "decon_stream")
    val batch = graft.operators.Curation.decontaminate(
      spark.read.parquet(srcDir), evalSet, "doc_id", "text", w = 5)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
