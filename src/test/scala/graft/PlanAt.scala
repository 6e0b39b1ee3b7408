package graft

import org.apache.spark.sql.SparkSession

/** Test-scoped plan inspector: print the executed plan of a registry
  * query against an arbitrary data dir (the plan goldens pin shapes at
  * sf0.001 — this shows what AQE actually picks at other volumes).
  * Run: `sbt "Test/runMain graft.PlanAt <query> [dir] [--run]"`.
  */
object PlanAt {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.drop(1).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val run = args.contains("--run")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.registry(name).fn(spark, dir)
    if (run) df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
