package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: isolate where q1 time goes at sf0.1. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.df(spark, d, "lineitem")

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"== $name%-28s ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f s")
    }

    time("scan_only")(li.select(col("l_quantity")))
    time("scan_filter")(li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType)))
    time("agg_double_sums") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
          avg(col("l_quantity")), avg(col("l_extendedprice")), avg(col("l_discount")),
          count(lit(1)))
    }
    time("agg_dec28_sums") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(28, 6))),
          sum(col("l_extendedprice").cast(DecimalType(28, 6))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(DecimalType(28, 6))),
          count(lit(1)))
    }
    time("agg_dec18_sums") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 6))),
          sum(col("l_extendedprice").cast(DecimalType(18, 6))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 6))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(DecimalType(18, 6))),
          count(lit(1)))
    }
    time("agg_long_micros") {
      // fixed-point in LONG: exact and primitive-typed all the way
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity") * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6).cast("long")),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1e6).cast("long")),
          count(lit(1)))
    }
    spark.stop()
  }
}
