package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: bit-level correctness of the Morton code and the
  * locality property that justifies it — each range partition covers a
  * compact rectangle of the two clustered dimensions.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Naive reference: interleave bit-by-bit. */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
    z
  }

  test("zorder equals the bit-by-bit reference interleave") {
    val pairs = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (255, 256), (40000, 7), (65536 + 5, 3)) // last: only low 16 bits count
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a & 0xFFFF, b & 0xFFFF),
        s"mismatch for ($a, $b)")
    }
  }

  test("zorder is self-similar: top bits of the code are the code of the top bits") {
    // points sharing their high bytes in both dimensions share the top 16
    // bits of their z code — the nesting that makes file-level min/max
    // ranges meaningful at every granularity
    val vals = (0 until 500).map(i => ((i * 2654435761L) % 65536).toInt)
    val df = vals.zip(vals.reverse).toDF("a", "b")
      .select(Layout.zorder(col("a"), col("b")).as("z"),
        Layout.zorder(shiftright(col("a"), 8), shiftright(col("b"), 8)).as("zhi"))
      .filter(shiftright(col("z"), 16) =!= col("zhi"))
    assert(df.count() == 0)
  }

  test("clusterByZ partitions cover compact rectangles of both dimensions") {
    val n = 64
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a, b)
    val df = grid.toDF("a", "b")
    val parts = Layout.clusterByZ(df, "a", "b", numPartitions = 16)
      .select(spark_partition_id().as("pid"), col("a"), col("b"))
      .groupBy("pid")
      .agg((max(col("a")) - min(col("a"))).as("span_a"),
        (max(col("b")) - min(col("b"))).as("span_b"),
        count(lit(1)).as("rows"))
      .collect()
    assert(parts.map(_.getLong(3)).sum == n.toLong * n)
    // with 16 range partitions over a 64×64 grid, the average per-partition
    // span must be far below the global span in BOTH dimensions — that is
    // the pruning win over a plain (a, b) sort, where span_b stays ~global
    val avgA = parts.map(_.getInt(1)).sum.toDouble / parts.length
    val avgB = parts.map(_.getInt(2)).sum.toDouble / parts.length
    assert(avgA < n / 2.0, s"dimension a not localized: avg span $avgA")
    assert(avgB < n / 2.0, s"dimension b not localized: avg span $avgB")
  }

  test("clusterByZ plans a range exchange on the z code (no global sort)") {
    val docs = Tables.df(spark, sf, "documents")
    val plan = Layout.clusterByZ(docs.select(col("doc_id"),
        length(col("text")).as("a"), col("doc_id").cast("int").as("b")),
      "a", "b", numPartitions = 8)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    // Sort's toString is "Sort [keys], <global>, <offset>" — the flag after
    // the key list must be false (partition-local), never a global sort
    val sortLine = plan.split("\n").find(_.contains("Sort [z_code"))
    assert(sortLine.exists(_.contains("], false,")), s"not partition-local: $sortLine")
  }
}
