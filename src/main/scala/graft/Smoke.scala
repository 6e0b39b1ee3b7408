package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke: read every table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Tables.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val d = Tables.df(spark, dir, n)
      println(s"== $n rows=${d.count()} schema=${d.schema.simpleString}")
    }
    spark.stop()
  }
}
