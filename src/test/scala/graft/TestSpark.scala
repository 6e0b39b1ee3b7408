package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", "/root/repo/target/graft-tmp/spark-warehouse")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
