package graft

import org.apache.spark.sql.SparkSession

/** Test-scoped timing sweep over the non-TPC-H registry queries — the
  * pipeline/operator gate set that Bench (TPC-H headline) doesn't time.
  * Run: `sbt "Test/runMain graft.TimingSweep [sfDir]"`. One cold pass,
  * cache cleared per query, full materialization via the noop sink.
  */
object TimingSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional 2nd arg: comma-separated name substrings (dev filter)
    val only: String => Boolean = args.drop(1).headOption match {
      case Some(pats) => name => pats.split(',').exists(name.contains)
      case None => _ => true
    }
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.registry.keys.toSeq.sorted
      .filterNot(_.matches("q\\d+_.*")).filter(only)
    println(s"SWEEP ${names.size} queries on $dir")
    var total = 0.0
    for (n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        SparkEntry.registry(n).fn(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        total += s
        println(f"TIME $n $s%.2f")
      } catch {
        case e: Throwable =>
          println(s"FAIL $n ${Option(e.getMessage).getOrElse(e.toString).take(120)}")
      }
    }
    println(f"SWEEP DONE total $total%.1f s")
    spark.stop()
  }
}
