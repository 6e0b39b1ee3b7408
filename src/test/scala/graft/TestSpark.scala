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

  /** Delete-then-return a scratch directory path (fresh warehouse per test). */
  def freshDir(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    path
  }
}
