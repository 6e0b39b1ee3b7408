package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Measurement harness for the optimization rounds (guide §1): for each
  * requested query, writes `<outDir>/<name>_<tag>.txt` with the formatted
  * physical plan plus planning-phase timings, and prints one summary line
  * per query (wall, #jobs, #stages/tasks via listener deltas) so plan-shape
  * claims in OPTIMIZATION_r18.md are reproducible from the repo.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [nameFilter,...]
  * Bench-flagged queries only unless a filter matches others explicitly.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = if (args.length > 2) args(2) else "before"
    val only: String => Boolean = args.drop(3).headOption match {
      case Some(pats) => name => pats.split(',').exists(name.contains)
      case None => _ => true
    }
    val all = args.drop(3).nonEmpty // explicit filter reaches non-bench rows
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // stage/task counters around each run
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    // per-job wall + callsite ledger (r19): multi-job iterative queries
    // (CC loops, UnionLoop, eager checkpoints) spend their time OUTSIDE
    // the final save's plan, so attribution needs job-level timing
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
      }
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val p = Option(e.properties)
        val site = p.flatMap(pp => Option(pp.getProperty("spark.job.description")))
          .orElse(p.flatMap(pp => Option(pp.getProperty("callSite.short"))))
          .map(_.take(90))
          .getOrElse("?") +
          p.flatMap(pp => Option(pp.getProperty("spark.sql.execution.id")))
            .fold("")(id => s" [exec=$id]")
        jobStarts.put(e.jobId, (e.time, site))
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStarts.remove(e.jobId)
        if (st != null) jobLog.add((e.jobId, e.time - st._1, st._2))
      }
    })
    // capture the FINAL (post-AQE) plan of the timed query. Only `save`
    // executions count: iterative operators fire many internal actions
    // (count/isEmpty/localCheckpoint) whose events would otherwise race
    // the final noop write's on the async listener bus (r18 advice).
    @volatile var lastExec: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      // the noop sink's funcName in Spark 4.1 is "overwrite" (v2 write
      // path); "save" kept for v1-path robustness
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        if (f == "overwrite" || f == "save") lastExec = qe
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    val qs = (if (all) SparkEntry.queries
              else SparkEntry.benchQueries).filter(kv => only(kv._1)).toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      val pre = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val phases = qe.tracker.phases.map { case (k, v) =>
        f"$k%-16s ${(v.endTimeMs - v.startTimeMs)}%5d ms"
      }.mkString("\n")
      // warm run (codegen/JIT), then a timed run
      df.write.format("noop").mode("overwrite").save()
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      spark.catalog.clearCache()
      // onSuccess is delivered asynchronously on the listener bus: reading
      // lastExec right after the timed write could observe the WARM run's
      // QueryExecution (r18 advice). Reset and poll for the timed run's.
      lastExec = null
      jobLog.clear()
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (lastExec == null && System.nanoTime() < deadline) Thread.sleep(10)
      val (j1, s1, t1) = (jobs.get, stages.get, tasks.get)
      val post =
        if (lastExec != null)
          lastExec.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        else "<no executed plan captured>"
      // per-operator metrics of the final executed plan (SQL-tab equivalent;
      // the UI is disabled in this harness, so this is how operator-level
      // time/rows claims in OPTIMIZATION_r18.md are made reproducible)
      def metricTree(p: org.apache.spark.sql.execution.SparkPlan, depth: Int,
          sb: StringBuilder): Unit = {
        val ms = p.metrics.toSeq
          .filter { case (_, m) => m.value != 0 }
          .sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        sb.append("  " * depth).append(p.nodeName).append(": ").append(ms).append('\n')
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
          case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(b.child)
          case other => other.children
        }
        kids.foreach(metricTree(_, depth + 1, sb))
        p.subqueries.foreach { sq =>
          sb.append("  " * (depth + 1)).append("[subquery]\n")
          metricTree(sq, depth + 2, sb)
        }
      }
      val metricStr =
        if (lastExec != null) {
          val sb = new StringBuilder
          try metricTree(lastExec.executedPlan, 0, sb)
          catch { case e: Throwable => sb.append(s"<metric walk failed: $e>") }
          sb.toString
        } else ""
      val nEx = "Exchange".r.findAllIn(post).size
      // timed run's job ledger, slowest first — the attribution view for
      // multi-job queries whose time is outside the final save's plan
      val jobLines = {
        import scala.jdk.CollectionConverters._
        val all = jobLog.asScala.toSeq.sortBy(-_._2)
        val top = all.take(25).map { case (id, ms, site) =>
          f"  job=$id%4d ${ms}%6d ms  $site"
        }.mkString("\n")
        f"jobs=${all.size} sum=${all.map(_._2).sum} ms (wall gaps = driver/AQE time)\n$top"
      }
      val body =
        s"""== $name ($tag) ==
           |wall=${f"$wall%.3f"}s jobs=${j1 - j0} stages=${s1 - s0} tasks=${t1 - t0} exchanges(final-plan-text)=$nEx
           |
           |-- planning phases (first build) --
           |$phases
           |
           |-- timed-run job ledger (slowest 25) --
           |$jobLines
           |
           |-- initial physical plan (pre-execution, AQE isFinalPlan=false) --
           |$pre
           |
           |-- final executed plan (post-AQE) --
           |$post
           |
           |-- executed operator metrics (timed run) --
           |$metricStr
           |""".stripMargin
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), body)
      // driver-JVM GC + heap + persistent-block telemetry: long one-JVM
      // sessions (Verify runs all 206 queries in one) showed 5-15x
      // slowdowns on queries that are fast in a fresh JVM — attribute it
      val gcMs = scala.jdk.CollectionConverters.ListHasAsScala(
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans)
        .asScala.map(_.getCollectionTime).sum
      val heapMb = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1024 * 1024)
      val nPersist = spark.sparkContext.getPersistentRDDs.size
      println(f"[plandump] $name%-28s wall=$wall%7.3f jobs=${j1 - j0}%3d stages=${s1 - s0}%3d tasks=${t1 - t0}%5d gcCumMs=$gcMs%6d heapMb=$heapMb%5d persistRdds=$nPersist%3d")
    }
    spark.stop()
  }
}
