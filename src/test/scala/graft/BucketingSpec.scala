package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the warehouse-side answer to the
  * reference's "storage returns rows sorted by PK, merge join exploits
  * it" (SURVEY.md §4.3 sortedness contract). Two tables bucketed+sorted
  * on the join key join WITHOUT a shuffle: at 100 TB this is the
  * difference between an hourly job and re-shuffling the fact table
  * every query.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("join of co-bucketed tables plans no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // in-memory catalog forgets tables between JVMs but the dirs persist
    Seq("b_lineitem", "b_orders").foreach { t =>
      val p = java.nio.file.Paths.get(s"/root/repo/target/graft-tmp/spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    Tables.df(spark, sf, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    Tables.df(spark, sf, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")

    // hint merge: at test scale Spark would broadcast; the bucketing claim
    // is about the shuffle-free sort-merge path a fact-fact join takes
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not be preceded by a shuffle of either side
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    val beforeAgg = plan.substring(joinIdx)
    assert(!beforeAgg.contains("Exchange hashpartitioning(l_orderkey") &&
      !beforeAgg.contains("Exchange hashpartitioning(o_orderkey"), plan)

    // and results equal the plain join
    val plain = Tables.df(spark, sf, "lineitem")
      .join(Tables.df(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).isEmpty)
  }
}
