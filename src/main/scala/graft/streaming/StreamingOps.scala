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

  /** Sliding 1-hour window advancing every 15 minutes — each event lands
    * in exactly size/slide = 4 overlapping windows. Same expression works
    * batch-side (the `events_sliding_window` gate row), so stream==batch
    * is provable on the bounded source.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n_events"))

  /** Stream-stream interval join: pair each 'view' event with the same
    * user's 'click' events landing within `withinSeconds` AFTER it.
    * Both sides carry watermarks and the join condition bounds the event
    * time range, so each side's state store holds only the watermark
    * horizon — the canonical bounded-state stream-stream join. The batch
    * twin is the identical join expression on static frames
    * (StreamingSpec proves equality on a bounded source).
    */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
      withinSeconds: Long): DataFrame = {
    val l = views.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val r = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    l.join(r,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"interval $withinSeconds seconds"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Run a streaming query over a bounded source into an in-memory table
    * and block until all available input is processed (test/dev harness).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Gap-based sessionization with CUSTOM state (flatMapGroupsWithState —
    * the extension point the built-in windowed aggs can't express): one
    * `SessionAcc` per live (user, session); a session closes and emits
    * when the event-time watermark passes its end + gap.
    *
    * Scale/semantics: state is one small struct per ACTIVE user (bounded
    * by the timeout, not by history); events inside a micro-batch are
    * sorted per user before folding, and the watermark bounds cross-batch
    * disorder. Batch twin: the `events_sessionize` gate query (same gap,
    * same session stats) — StreamingSpec proves stream == batch on the
    * flushed prefix.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start_s, s.end_s, s.n_events))
          } else {
            val times = it.map(_._2.getTime / 1000).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(p) if t - p.end_s <= gapSeconds =>
                  cur = Some(SessionAcc(p.start_s, math.max(p.end_s, t), p.n_events + 1))
                case Some(p) =>
                  out += SessionOut(uid, p.start_s, p.end_s, p.n_events)
                  cur = Some(SessionAcc(t, t, 1))
                case None =>
                  cur = Some(SessionAcc(t, t, 1))
              }
            }
            cur.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp((p.end_s + gapSeconds) * 1000 + 1000)
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** Streaming EWMA — the continuous twin of the batch `events_ewma`
    * gate query: per user, the exponentially-weighted moving average of
    * the last `k` values (weight alpha^age, newest = 1). State is the ≤
    * k−1 most recent values per user — O(k) per key, bounded regardless
    * of stream length. Events inside a micro-batch are sorted per user
    * by (ts, event_id) before folding, and the fold is the SAME
    * left-to-right double accumulation as the batch expression, so with
    * alpha = 0.5 (power-of-two weights, exact products) stream == batch
    * bit-for-bit on in-order input.
    */
  def ewmaStream(events: DataFrame, k: Int = 8, alpha: Double = 0.5): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaAcc, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          var tail = state.getOption.map(_.tail).getOrElse(Seq.empty[Double])
          // order by exact event-time micros (getTime alone is millis and
          // would tie-break same-millisecond events differently than the
          // batch ORDER BY ts), then event_id
          def micros(t: java.sql.Timestamp): Long =
            (t.getTime / 1000) * 1000000L + t.getNanos / 1000
          val out = it.toArray.sortBy(r => (micros(r._3), r._2)).map { r =>
            val xs = tail :+ r._4
            val n = xs.length
            val e = xs.zipWithIndex.foldLeft(0.0) {
              case (a, (v, i)) => a + v * math.pow(alpha, (n - 1 - i).toDouble)
            }
            tail = xs.takeRight(k - 1)
            EwmaOut(uid, r._2, e)
          }
          state.update(EwmaAcc(tail))
          out.iterator
      }
      .toDF()
  }

  /** Streaming rolling z-score — the continuous twin of the batch
    * `events_rolling_zscore` gate query: per user, z of the current value
    * against the trailing `win`-event window, from the SAME centi-fixed-
    * point integer sums, so stream == batch bit-for-bit (the core is
    * integer math until two exact int→double casts). State: the ≤ win−1
    * most recent quantized values per user — O(win) per key.
    */
  def zscoreStream(events: DataFrame, win: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ZScoreAcc, ZScoreOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          var tail = state.getOption.map(_.tail).getOrElse(Seq.empty[Long])
          def micros(t: java.sql.Timestamp): Long =
            (t.getTime / 1000) * 1000000L + t.getNanos / 1000
          val out = it.toArray.sortBy(r => (micros(r._3), r._2)).map { r =>
            // same quantization as the batch query's roundAwayLong —
            // the SHARED scalar kernel (expr/RoundAway.scala), so the
            // streaming and batch paths cannot diverge, including the
            // ±2^63 saturation branch (r19, from r18 advice).
            val x = graft.expr.RoundAwayLong.scalar(r._4 * 1e2)
            val xs = (tail :+ x).takeRight(win)
            val n = xs.length.toLong
            val s1 = xs.sum
            val s2 = xs.map(v => v * v).sum
            val den = n * s2 - s1 * s1
            val z = if (n < 2 || den <= 0) None
              else Some((n * x - s1).toDouble / math.sqrt(den.toDouble))
            tail = xs.takeRight(win - 1)
            ZScoreOut(uid, r._2, z, z.map(v => math.abs(v) > 2.0))
          }
          state.update(ZScoreAcc(tail))
          out.iterator
      }
      .toDF()
  }

  /** Streaming MinHash near-dup detection — the continuous-ingestion twin
    * of `Dedup.minhashPairsIncremental`: each arriving document's LSH band
    * keys probe per-bucket state (the first document that claimed the
    * bucket, with its signature); a collision whose signature-agreement
    * Jaccard estimate clears the threshold emits (doc_id, dup_of, est).
    *
    * Semantics vs batch: the estimator is the standard MinHash one
    * (matching signature positions / k) rather than the batch path's exact
    * shingle Jaccard — state carries the k-long signature, never shingle
    * sets. A doc colliding with its representative in several bands emits
    * one row per band; consumers take `dropDuplicates(doc_id, dup_of)`.
    *
    * Scale: state is one (id, signature) per OCCUPIED bucket — corpus
    * bands, not corpus pairs. This demo keeps state forever (NoTimeout);
    * a production sliding-corpus deployment sets EventTimeTimeout to evict
    * buckets older than the dedup horizon.
    */
  def nearDupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleWidth: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val banded = graft.operators.Dedup
      .minhashed(docs, idCol, textCol, shingleWidth, numHashes, bands)
      .select(col(idCol).cast("long").as("id"), col("sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .as[BandedDoc]
    banded.groupByKey(b => (b.band_idx, b.band_key))
      .flatMapGroupsWithState[BucketRep, NearDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val out = scala.collection.mutable.ArrayBuffer[NearDup]()
          // deterministic fold order inside a micro-batch
          it.toArray.sortBy(_.id).foreach { b =>
            state.getOption match {
              case None => state.update(BucketRep(b.id, b.sig))
              case Some(rep) if rep.repId == b.id => () // re-delivery of the rep
              case Some(rep) =>
                val est = b.sig.zip(rep.repSig)
                  .count { case (x, y) => x == y }.toDouble / b.sig.length
                if (est >= threshold) out += NearDup(b.id, rep.repId, est)
            }
          }
          out.iterator
      }
      .toDF()
  }

  /** Streaming twin of the exact-substring dedup tier
    * ([[graft.operators.Dedup.exactSubstringPairs]]) for live ingestion:
    * every arriving doc's rolling-hash windows key into per-fingerprint
    * state holding the FIRST (doc, pos, span string) that produced the
    * fingerprint; later docs whose window lands in the bucket emit a
    * VERIFIED (dup_id, first_id, span) evidence row — verified against
    * the stored span STRING, so a 31-bit collision never emits (the same
    * necessary-not-sufficient contract as the batch operator; first-wins
    * rep semantics match [[nearDupStream]]). State mass: one cell per
    * distinct span fingerprint (id + pos + span chars) — the same mass
    * the batch pipeline shuffles, held in the state store.
    */
  def exactSubstringStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", span: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spans = docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("_t"),
        posexplode(graft.functions.Hashing.charSpanHashes(col(textCol), span))
          .as(Seq("pos", "h")))
      .withColumn("s", expr(s"substring(_t, pos + 1, $span)"))
      .select(col("id"), col("pos"), col("h"), col("s"))
      .as[SpanRow]
    spans.groupByKey(_.h)
      .flatMapGroupsWithState[SpanRep, SpanDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val out = scala.collection.mutable.ArrayBuffer[SpanDup]()
          // deterministic fold order inside a micro-batch
          it.toArray.sortBy(r => (r.id, r.pos)).foreach { r =>
            state.getOption match {
              case None => state.update(SpanRep(r.id, r.pos, r.s))
              case Some(rep) if rep.repId == r.id => () // same doc / re-delivery
              case Some(rep) =>
                if (rep.s == r.s) out += SpanDup(r.id, rep.repId, r.s)
            }
          }
          out.iterator
      }
      .toDF("doc_id", "dup_of", "span")
  }

  /** Streaming curation — the streaming twin of `Curation.curate`'s
    * filter/redact/dedup stages, for ingesting a live crawl: the quality
    * gate and PII redaction are STATELESS narrow expressions that fuse
    * into the stream scan; exact near-dup suppression keys one tiny
    * state cell per text hash (`mapGroupsWithState`-style first-wins),
    * so a document seen in ANY earlier micro-batch — or earlier in the
    * same batch, lowest id wins, matching the batch operator's
    * row_number-over-hash rule — never re-emits. Output (append mode):
    * one (doc_id, redacted, n_redacted) row per surviving document.
    *
    * Scale: state is one (hash → id) entry per distinct document —
    * the same mass the batch dedup shuffles, held in the state store;
    * everything else is scan-speed per-row work.
    */
  def curateStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", qualityMin: Double = 0.0,
      piiPattern: String = """\d{3}-\d{2}-\d{4}"""): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val cleaned = docs
      .filter(graft.operators.TextAnalysis.qualityExpr(col(textCol)) >= qualityMin)
      .select(col(idCol).cast("long").as("id"),
        regexp_replace(col(textCol), piiPattern, "[REDACTED]").as("redacted"),
        size(regexp_extract_all(col(textCol), lit(piiPattern), lit(0)))
          .as("n_redacted"),
        graft.functions.Hashing.polyHash(col(textCol)).as("h"))
      .as[CurateDoc]
    cleaned.groupByKey(_.h)
      .flatMapGroupsWithState[SeenHash, CuratedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          if (state.exists) Iterator.empty
          else it.toArray.sortBy(_.id).headOption match {
            case Some(first) =>
              state.update(SeenHash(first.id))
              Iterator.single(CuratedDoc(first.id, first.redacted, first.n_redacted))
            case None => Iterator.empty
          }
      }
      .toDF("doc_id", "redacted", "n_redacted")
  }
}

/** Live-session state: one per (user, open session). */
case class SessionAcc(start_s: Long, end_s: Long, n_events: Long)

/** Emitted closed session. */
case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

/** One (doc, band) probe row for streaming near-dup. */
/** ewmaStream state: the ≤ k−1 most recent values for one user, oldest first. */
case class EwmaAcc(tail: Seq[Double])

/** zscoreStream state: ≤ win−1 most recent centi-quantized values, oldest first. */
case class ZScoreAcc(tail: Seq[Long])

/** One rolling z-score observation; None = undefined (n<2 or zero variance). */
case class ZScoreOut(user_id: Long, event_id: Long, z: Option[Double],
    is_anom: Option[Boolean])

/** One EWMA observation emitted per event. */
case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

case class BandedDoc(id: Long, sig: Seq[Long], band_idx: Int, band_key: Long)

/** Per-bucket state: the first doc that claimed the bucket. */
case class BucketRep(repId: Long, repSig: Seq[Long])

/** Emitted near-duplicate: `doc_id` duplicates `dup_of`. */
case class NearDup(doc_id: Long, dup_of: Long, est_jaccard: Double)

/** One rolling-hash window of a streaming doc (exactSubstringStream). */
case class SpanRow(id: Long, pos: Int, h: Long, s: String)

/** First (doc, pos, span) seen for a fingerprint — the bucket rep. */
case class SpanRep(repId: Long, repPos: Int, s: String)

/** Verified shared-span evidence: doc_id duplicates dup_of's span. */
case class SpanDup(doc_id: Long, dup_of: Long, span: String)

/** One quality-passing, redacted doc entering streaming dedup. */
case class CurateDoc(id: Long, redacted: String, n_redacted: Int, h: Long)

/** Dedup state: the id that first claimed this text hash. */
case class SeenHash(firstId: Long)

/** One surviving curated document. */
case class CuratedDoc(doc_id: Long, redacted: String, n_redacted: Int)
