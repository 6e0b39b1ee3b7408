package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measures what CLUSTERED BY buys the fact⋈fact TPC-H queries at scale:
  * runs the SAME registry query programs (via the `@catalog` table
  * sentinel) against (a) plain parquet and (b) lineitem+orders bucketed
  * and sorted on the order key — the layout `CREATE TABLE ... CLUSTERED
  * BY` produces — and reports wall, shuffle bytes, and the number of
  * hash-partitioning exchanges in the executed (AQE-final) plan.
  *
  * BucketingSpec proves the zero-Exchange plan shape at test scale; this
  * harness prices it on real volume. The one-time bucket write is
  * reported too: at 100 TB that cost amortizes across every downstream
  * orderkey join, which is the warehouse argument for the layout.
  *
  * Run: `sbt "Test/runMain graft.BucketedBench target/scale100 [rounds]"`.
  */
object BucketedBench {
  private final class MetricsListener extends SparkListener {
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val spilled = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snapshot: Array[Long] = Array(shufRead.get, shufWrite.get, spilled.get)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scale100")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    // a fresh in-memory catalog knows nothing of a previous run's managed
    // table dirs — saveAsTable would refuse the leftover locations
    val wh = new java.io.File("target/bucketed-warehouse")
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete(); ()
    }
    if (wh.exists()) rmr(wh)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "target/bucketed-warehouse")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)

    // dims resolve as temp views for the @catalog runs (broadcast-sized;
    // layout is irrelevant for them)
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").createOrReplaceTempView(n)
    }
    // facts: bucketed + sorted on the order key, bucket count = the
    // shuffle partition count the plain plans use
    spark.sql("DROP TABLE IF EXISTS orders")
    spark.sql("DROP TABLE IF EXISTS lineitem")
    val tb0 = System.nanoTime()
    spark.read.parquet(s"$src/orders.parquet").write.mode("overwrite")
      .bucketBy(32, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders")
    spark.read.parquet(s"$src/lineitem.parquet").write.mode("overwrite")
      .bucketBy(32, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem")
    val bucketBuildSec = (System.nanoTime() - tb0) / 1e9

    val reg = graft.SparkEntry.registry
    val targets = Seq(
      "q7_nation_volume", "q9_profit_by_nation_year", "q21_waiting_suppliers")
    val planDir = new java.io.File("target/bucketed_plans")
    planDir.mkdirs()

    // one timed run: cold cache, full materialization; returns wall,
    // shuffle/spill deltas, and the AQE-final plan text
    def once(name: String, dir: String): (Double, Array[Long], String) = {
      spark.catalog.clearCache()
      val before = listener.snapshot
      val t0 = System.nanoTime()
      val df = reg(name).fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val after = listener.snapshot
      (wall, after.zip(before).map { case (a, b) => a - b },
        df.queryExecution.executedPlan.toString)
    }

    def measure(name: String, dir: String): (Double, Array[Long], Int, Int) = {
      once(name, dir) // warm-up: codegen, footers, page cache
      val runs = (1 to rounds).map(_ => once(name, dir))
      val best = runs.minBy(_._1)
      val plan = best._3
      val layout = if (dir == "@catalog") "bucketed" else "parquet"
      val pw = new java.io.PrintWriter(new java.io.File(planDir, s"${name}_$layout.txt"))
      try pw.write(plan) finally pw.close()
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val bcastEx = "BroadcastExchange".r.findAllIn(plan).length
      (best._1, best._2, hashEx, bcastEx)
    }

    val out = targets.map { name =>
      val (pw, pm, phe, pbe) = measure(name, src)
      val (bw, bm, bhe, bbe) = measure(name, "@catalog")
      val obj =
        s""""$name":{"parquet":{"sec":${fmt(pw)},"shuffle_read_mb":${fmt(pm(0) / 1e6)},"shuffle_write_mb":${fmt(pm(1) / 1e6)},"spilled_mb":${fmt(pm(2) / 1e6)},"hash_exchanges":$phe,"broadcast_exchanges":$pbe},""" +
        s""""bucketed":{"sec":${fmt(bw)},"shuffle_read_mb":${fmt(bm(0) / 1e6)},"shuffle_write_mb":${fmt(bm(1) / 1e6)},"spilled_mb":${fmt(bm(2) / 1e6)},"hash_exchanges":$bhe,"broadcast_exchanges":$bbe}}"""
      println(s"DONE $name parquet=${fmt(pw)}s bucketed=${fmt(bw)}s " +
        s"shuffleMB ${fmt(pm(0) / 1e6)}->${fmt(bm(0) / 1e6)} hashEx $phe->$bhe")
      obj
    }
    println(s"""{"metric":"bucketed_vs_parquet","sf":"$src","rounds":$rounds,"bucket_build_sec":${fmt(bucketBuildSec)},"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
