package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the two heaviest shuffle pipelines — MinHash near-dup pairs
  * and the LSH k-NN graph — under a memory budget small enough that the
  * external sorters/aggregators actually SPILL, then fingerprints the
  * results so a normal-memory run can prove spilling never changes the
  * answer. This is the 100 TB claim the bench never exercises (every
  * bench row reads `spilled_mb: 0.000`): on a real cluster these
  * operators WILL spill, and correctness must not depend on fitting in
  * execution memory.
  *
  * Run (sbt forks a fresh JVM per run, so the heap cap is real):
  *   SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.SpillSoak target/scale100"
  *   SPARK_DRIVER_MEM=3g SPILL_MEM_FRACTION=0.05 \
  *     sbt "Test/runMain graft.SpillSoak target/scale100"
  * and compare the fingerprint fields (must be identical) while
  * spilled_mb goes 0 → nonzero.
  */
object SpillSoak {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scale100")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      // the spill lever: fraction of heap usable for execution+storage.
      // 0.05 of a 3g heap ≈ 150 MB shared by 8 concurrent tasks.
      .config("spark.memory.fraction",
        sys.env.getOrElse("SPILL_MEM_FRACTION", "0.6"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilledMem = new java.util.concurrent.atomic.AtomicLong()
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spilledMem.addAndGet(m.memoryBytesSpilled)
          spilledDisk.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)
    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // 1. MinHash+LSH near-dup pairs over the 500k-doc corpus. The
    // fingerprint folds every (id_a, id_b) pair and the quantized
    // jaccard through a commutative sum of hashes — partition- and
    // order-invariant, so runs at different parallelism/spill behavior
    // compare bit-exactly.
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val (dedupSec, dedupFp) = timed {
      val pairs = operators.Dedup.minhashPairs(
        docs, "doc_id", "text", shingleWidth = 3, numHashes = 16,
        bands = 4, threshold = 0.5)
      val r = pairs.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("id_a"), col("id_b"),
          round(col("jaccard") * 1000000).cast("long"))).as("fp"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // 2. LSH k-NN graph over the 200k embeddings (k=10). Same
    // commutative fingerprint over (src, dst, quantized cosine).
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val (knnSec, knnFp) = timed {
      val g = operators.Similarity.knnGraph(emb, k = 10, nPlanes = 12)
      val r = g.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("src_id"), col("neighbor_id"),
          round(col("cos_sim") * 1000000).cast("long"))).as("fp"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // 3. Exact-substring pairs (r15): ~138M rolling-hash window rows
    // (500k docs × ~276 windows) shuffle once on the fingerprint, then
    // bucket-join and substring-verify. The hot-span cap bounds
    // boilerplate buckets exactly as a production run would. Same
    // commutative fingerprint over (id_a, id_b, n_shared_spans).
    val (subSec, subFp) = timed {
      val pairs = operators.Dedup.exactSubstringPairs(
        docs, "doc_id", "text", span = 30, maxOccurrences = Some(16))
      val r = pairs.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("id_a"), col("id_b"),
          col("n_shared_spans"))).as("fp"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"metric":"spill_soak","heap_mb":$heap,""" +
      s""""mem_fraction":"${sys.env.getOrElse("SPILL_MEM_FRACTION", "0.6")}",""" +
      s""""dedup_sec":${fmt(dedupSec)},"dedup_pairs":${dedupFp._1},""" +
      s""""dedup_fp":${dedupFp._2},""" +
      s""""knn_sec":${fmt(knnSec)},"knn_edges":${knnFp._1},""" +
      s""""knn_fp":${knnFp._2},""" +
      s""""substr_sec":${fmt(subSec)},"substr_pairs":${subFp._1},""" +
      s""""substr_fp":${subFp._2},""" +
      s""""spilled_mem_mb":${fmt(spilledMem.get / 1048576.0)},""" +
      s""""spilled_disk_mb":${fmt(spilledDisk.get / 1048576.0)}}""")
    spark.stop()
  }
}
