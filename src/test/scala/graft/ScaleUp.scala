package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped scale-up generator: derives an N× copy of an existing
  * testdata dir by unioning key-shifted shards, preserving referential
  * integrity (lineitem↔orders shift together; dims stay fixed, so fact
  * tables fan out over the same dimension keys — the realistic shape).
  * Text/document ids shift and each shard's text gets a distinct suffix
  * token so exact-dup structure doesn't multiply across shards.
  *
  * Run: `sbt "Test/runMain graft.ScaleUp <srcDir> <outDir> [factor]"`.
  * Used for the measured scale-up section of SCALING.md — the point is
  * to observe the ACTUAL growth curve of the plans (linear for scans/
  * aggregates, bounded for codebooks, output-driven for pair ops), not
  * to extend the correctness gate.
  */
object ScaleUp {
  private val KeyBase = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shards(name: String)(shard: (DataFrame, Int) => DataFrame): Unit = {
      // batch the union (≤50 branches per write pass, append mode) so
      // large factors don't build thousand-branch plans
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).grouped(50).zipWithIndex.foreach { case (batch, bi) =>
        val part = batch.map(i => shard(base, i)).reduce(_ unionAll _)
        part.write.mode(if (bi == 0) "overwrite" else "append")
          .parquet(s"$out/$name.parquet")
      }
      println(s"SCALED $name x$factor")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"COPIED $name")
    }

    // dims fixed — fact keys fan out over them
    Seq("region", "nation", "customer", "supplier", "part").foreach(copy)

    shards("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KeyBase))
    }
    shards("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KeyBase))
    }
    shards("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * KeyBase))
        .withColumn("user_id", col("user_id") + lit(i * KeyBase))
    }
    shards("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * KeyBase))
        .withColumn("text", concat(col("text"), lit(s" shard$i")))
    }
    shards("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * KeyBase))
    }
    println("SCALEUP DONE")
    spark.stop()
  }
}
