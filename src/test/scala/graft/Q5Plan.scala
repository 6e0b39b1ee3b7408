package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: q5 plan at a given SF dir with the broadcast row guard at
  * its default vs disabled — planning only, no execution.
  */
object Q5Plan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale100")
    val qname = args.drop(1).headOption.getOrElse("q5_local_supplier_revenue")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("4000000" -> "GUARD DEFAULT", Long.MaxValue.toString -> "GUARD OFF")
      .foreach { case (cap, label) =>
        spark.conf.set(graft.plans.BroadcastRowGuard.confKey, cap)
        val df = SparkEntry.queries(qname)(spark, dir)
        println(s"==== $label ====")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("Scan") || l.contains("Broadcast"))
          .map(_.take(160)).mkString("\n"))
      }
    spark.stop()
  }
}
