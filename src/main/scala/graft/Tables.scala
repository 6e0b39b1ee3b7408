package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table registry.
  *
  * Loads the driver-generated parquet tables (TESTDATA.md) from a scale-factor
  * directory and registers them as temp views so both the DataFrame API and
  * `spark.sql` can reach them. Column pruning / predicate pushdown reach the
  * parquet scans automatically (DataSource V2).
  *
  * Reference surface: risinglight's catalog + table scan
  * (`/root/reference/src/catalog/root.rs`, `src/executor/table_scan.rs`) —
  * re-expressed as Spark temp views over parquet.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session defaults every entry point (Verify/Bench/tests) should apply.
    * - ANSI off: reference semantics (div-by-zero -> NULL, lenient casts),
    *   matches risinglight `safen_dividend` (`src/array/ops.rs:759+`).
    * - UTC: oracle (DuckDB) reads parquet timestamps as naive; UTC session
    *   makes Spark agree on the same wall-clock values.
    * - nanosAsLong: events.parquet carries timestamp[ns]; read as Long and
    *   convert explicitly (see [[events]]).
    */
  def sessionConfs: Map[String, String] = Map(
    // native vector-distance expressions (l2_distance / cosine_sim /
    // neg_inner_product) available to SQL in every entry point — the
    // Engine rewrites the reference's `<->`/`<=>`/`<#>` onto them
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString
  )

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Schema memo (r19, guide §1.4/§6): every `spark.read.parquet` without
    * a declared schema runs a footer-inference JOB on the driver — ~30 ms
    * per table per query build, repeated for every table of every query
    * (q5 alone: 7 such jobs ≈ 210 ms of its 1.4 s wall). A real engine
    * resolves table schemas from its catalog, not by re-reading footers
    * per statement; this memo IS that catalog. Only the StructType is
    * memoized — table DATA is still read from parquet on every run (the
    * bench stays cold end-to-end). Keyed by (dir, table): the testdata
    * dirs are immutable for a session's lifetime, and a regenerated dir
    * under a NEW path (ScaleUp output) gets its own entry.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaMemo.computeIfAbsent((dir, name),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** `events` with `ts` normalized to a microsecond timestamp regardless of
    * the parquet physical unit (ns at the driver's generator). DuckDB oracle
    * side does the same with `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division: `/` on Long promotes to Double, whose 53-bit
        // mantissa loses 1µs on ns-scale epochs; `div` stays exact.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Physical timestamp[us] with no zone: the session is pinned to UTC,
        // so casting NTZ -> TIMESTAMP keeps the same wall-clock values and
        // the DuckDB oracles stay valid; downstream unix_micros/watermarks
        // require a zoned TimestampType.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** `embeddings` with the vector column normalized to `array<float>` —
    * the element type every distance/ANN kernel compiles against. The
    * driver's generator writes `list<float>` today; this arm is drift
    * insurance (the events `ts` lesson: a silent regen to `list<double>`
    * would otherwise fail seven ANN/dedup queries at analysis).
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => raw
      case _: org.apache.spark.sql.types.ArrayType =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => raw
    }
  }

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case "embeddings" => embeddings(spark, dir)
      case _ => load(spark, dir, name)
    }

  /** Register all tables as temp views named exactly like the oracle side. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
