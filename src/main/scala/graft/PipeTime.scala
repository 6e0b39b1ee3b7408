package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: time the heavy pipeline queries at sf0.1. */
object PipeTime {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash_lsh", "dedup_clusters", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding_cosine", "ann_brute_force_topk", "ann_ivf_topk", "ann_lsh_topk",
        "text_fingerprint", "events_range_join")
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.registry(q).fn(spark, "/root/testdata/sf0.1").count()
      println(f"== $q%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
