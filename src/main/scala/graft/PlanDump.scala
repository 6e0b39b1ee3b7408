package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: dump executed plans of selected bench queries at sf0.1. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val df = SparkEntry.registry(q).fn(spark, "/root/testdata/sf0.1")
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") || l.contains("Aggregate"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
