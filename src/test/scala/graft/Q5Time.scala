package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: time one registry query at a SF dir under two guard caps. */
object Q5Time {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale100")
    val qname = args.drop(1).headOption.getOrElse("q5_local_supplier_revenue")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    Seq("4000000" -> "default", Long.MaxValue.toString -> "off").foreach {
      case (cap, label) =>
        spark.conf.set(graft.plans.BroadcastRowGuard.confKey, cap)
        val times = (1 to 3).map(_ => run())
        println(f"$qname guard=$label%-8s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
