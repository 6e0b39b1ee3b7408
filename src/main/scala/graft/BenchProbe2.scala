package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: bench-config experiment matrix (AQE, shuffle partitions). */
object BenchProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val heavy = Seq("q5_local_supplier_revenue", "q7_nation_volume",
      "q9_profit_by_nation_year", "q18_large_orders", "q1_agg", "q13_order_distribution")

    def measure(tag: String, confs: Map[String, String]): Unit = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
      Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
      confs.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val total = heavy.map { q =>
        val fn = SparkEntry.registry(q).fn
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        math.min(System.nanoTime() - t1, t1 - t0) / 1e9
      }.sum
      println(f"== $tag%-36s total=$total%.2f s")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    measure("baseline (AQE on, 32 part)", Map())
    measure("AQE off", Map("spark.sql.adaptive.enabled" -> "false"))
    measure("8 shuffle partitions", Map("spark.sql.shuffle.partitions" -> "8"))
    measure("AQE off + 8 partitions", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8"))
  }
}
