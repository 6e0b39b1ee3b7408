package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: attribute q11's executor time (VERDICT r6 #1 — 148 exec-sec
  * vs 0.72 for q2 which shares the partsupp derivation). Replicates the
  * bench protocol exactly (cold DataFrame cache, noop sink, task-metric
  * deltas) and times variants of the per-part-aggregate materialization.
  */
object Q11Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) runMs.addAndGet(e.taskMetrics.executorRunTime)
    })

    def time(name: String)(f: => DataFrame): Unit = {
      // warm once, then two timed cold-cache runs like the bench
      spark.catalog.clearCache()
      f.write.format("noop").mode("overwrite").save()
      val walls = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val e0 = runMs.get
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, (runMs.get - e0) / 1e3)
      }
      spark.catalog.clearCache()
      val best = walls.minBy(_._1)
      println(f"== $name%-34s wall=${best._1}%.2f s exec=${best._2}%.1f s (runs: ${walls.map(w => f"${w._1}%.2f").mkString(", ")})")
    }

    import graft.queries.{dsum, t}
    def byPartRaw(s: SparkSession): DataFrame = {
      val ps = graft.queries.TpchExt.partsupp(s, d)
      val su = t(s, d, "supplier")
      val n = t(s, d, "nation").filter(col("n_name") === "NATION_7")
      ps.join(su, ps("ps_suppkey") === su("s_suppkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("ps_partkey"))
        .agg(dsum(col("ps_supplycost") * col("ps_availqty")).as("value"))
    }
    def finish(byPart: DataFrame): DataFrame = {
      val threshold = byPart.agg(
        ((sum(round(col("value") * 1e6).cast("long")).cast("double") / 1e6)
          * 0.004).as("_threshold"))
      byPart.crossJoin(broadcast(threshold))
        .filter(col("value") > col("_threshold"))
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }

    time("byPart alone (no cache)")(byPartRaw(spark))
    time("q11 current (.cache)")(finish(byPartRaw(spark).cache()))
    time("q11 no cache (dup subtree)")(finish(byPartRaw(spark)))
    time("q11 localCheckpoint(eager)")(finish(byPartRaw(spark).localCheckpoint()))
    time("q2 for comparison")(SparkEntry.registry("q2_min_cost_supplier").fn(spark, d))
    time("q11 registry as-is")(SparkEntry.registry("q11_important_stock").fn(spark, d))
    spark.stop()
  }
}
