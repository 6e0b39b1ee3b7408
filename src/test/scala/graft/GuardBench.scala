package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Prices the BroadcastRowGuard on real volume: runs the registry's
  * fact⋈fact TPC-H programs over PLAIN parquet at scale-N with the guard
  * disabled (maxRows=0) vs enabled (default 4M cap), and reports wall,
  * shuffle bytes, and the LARGEST broadcast build measured in ROWS —
  * read from BroadcastExchangeExec's own numOutputRows metric in the
  * AQE-final plan, so the "no multi-million-row broadcast" claim is a
  * measured number, not a plan-text grep.
  *
  * The r12 bucketed experiment found AQE broadcasting a 15M-row pruned
  * fact under the 64 MB byte threshold (driver-side hash build
  * dominating q7/q9); the guard must kill exactly those builds while
  * leaving true dimension broadcasts alone.
  *
  * Run: `sbt "Test/runMain graft.GuardBench target/scale100 [rounds]"`.
  */
object GuardBench {
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

  /** Every physical node, descending through AQE wrappers and stages. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case s: QueryStageExec => s +: allNodes(s.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def maxBroadcastRows(p: SparkPlan): Long =
    allNodes(p).collect {
      case b: BroadcastExchangeExec =>
        b.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }.foldLeft(0L)(math.max)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scale100")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)

    val reg = graft.SparkEntry.registry
    val targets = Seq("q5_local_supplier_revenue", "q7_nation_volume",
      "q9_profit_by_nation_year")
    val planDir = new java.io.File("target/guard_plans")
    planDir.mkdirs()

    def once(name: String): (Double, Array[Long], Long, String) = {
      spark.catalog.clearCache()
      val before = listener.snapshot
      val t0 = System.nanoTime()
      val df = reg(name).fn(spark, src)
      // execute THE DATAFRAME'S OWN QueryExecution (a write command plans
      // a fresh one, leaving df's plan unexecuted and its metrics zero)
      df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val after = listener.snapshot
      (wall, after.zip(before).map { case (a, b) => a - b },
        maxBroadcastRows(df.queryExecution.executedPlan),
        df.queryExecution.executedPlan.toString)
    }

    def measure(name: String, label: String): (Double, Array[Long], Long) = {
      once(name) // warm-up: codegen, footers, page cache
      val runs = (1 to rounds).map(_ => once(name))
      val best = runs.minBy(_._1)
      val pw = new java.io.PrintWriter(new java.io.File(planDir, s"${name}_$label.txt"))
      try pw.write(best._4) finally pw.close()
      (best._1, best._2, runs.map(_._3).max)
    }

    val out = targets.map { name =>
      spark.conf.set(graft.plans.BroadcastRowGuard.confKey, "0")
      val (ow, om, obr) = measure(name, "unguarded")
      spark.conf.unset(graft.plans.BroadcastRowGuard.confKey) // default cap
      val (gw, gm, gbr) = measure(name, "guarded")
      println(s"DONE $name unguarded=${fmt(ow)}s guarded=${fmt(gw)}s " +
        s"maxBroadcastRows $obr->$gbr")
      s""""$name":{"unguarded":{"sec":${fmt(ow)},"shuffle_read_mb":${fmt(om(0) / 1e6)},"spilled_mb":${fmt(om(2) / 1e6)},"max_broadcast_rows":$obr},""" +
        s""""guarded":{"sec":${fmt(gw)},"shuffle_read_mb":${fmt(gm(0) / 1e6)},"spilled_mb":${fmt(gm(2) / 1e6)},"max_broadcast_rows":$gbr}}"""
    }
    println(s"""{"metric":"broadcast_row_guard","sf":"$src","rounds":$rounds,"cap_rows":${graft.plans.BroadcastRowGuard.defaultMaxRows},"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
