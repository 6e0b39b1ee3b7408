package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** DML block-hygiene soak (r19): drives one long engine session through
  * the checkpoint-bearing statement shapes (nondeterministic INSERT,
  * UPDATE/DELETE ... RETURNING, MERGE, upsert) and samples the driver's
  * persistent-RDD count and block-manager usage every `step` statements.
  * Before the statement-scoped release, each such statement pinned one or
  * more localCheckpoint RDDs forever; the artifact pins the flat curve.
  *
  * Run: `sbt "Test/runMain graft.DmlSoak [statements] [step]"` — prints
  * one JSON line (save as SOAK_DML_rNN.json).
  */
object DmlSoak {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(300)
    val step = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/graft-tmp/dml-soak"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    val eng = new Engine(spark, dir)
    eng.run("create table soak(id bigint, v double, s varchar)")
    eng.run("insert into soak values (1, 1.0, 'a'), (2, 2.0, 'b')")
    eng.run("create table soaksrc(id bigint, v double)")

    val samples = collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    def sample(i: Int): Unit = {
      val n = spark.sparkContext.getPersistentRDDs.size
      val mem = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      samples += ((i, n, mem))
    }
    sample(0)
    val t0 = System.nanoTime()
    var i = 0
    while (i < total) {
      val k = 10 + i
      i % 5 match {
        case 0 => eng.run(s"insert into soak select $k, rand(), 'x'")
        case 1 =>
          eng.run(s"update soak set v = v + 1 where id = ${k - 5} returning id")
            .collect()
        case 2 =>
          eng.run(s"delete from soak where id = ${k - 10} returning id")
            .collect()
        case 3 =>
          eng.run("delete from soaksrc") // MERGE needs unique source keys
          eng.run(s"insert into soaksrc select ${k % 40}, rand()")
          eng.run("merge into soak using soaksrc on soak.id = soaksrc.id " +
            "when matched then update set v = soaksrc.v " +
            "when not matched then insert (id, v, s) values (soaksrc.id, soaksrc.v, 'm')")
        case 4 =>
          eng.run(s"insert into soak values ($k, $k.5, 'c') " +
            "on conflict (id) do nothing")
      }
      i += 1
      if (i % step == 0) sample(i)
    }
    // one trailing statement releases the last DML's pending blocks
    eng.run("select count(*) from soak").collect()
    sample(i + 1)
    val sec = (System.nanoTime() - t0) / 1e9
    val curve = samples.map { case (n, rdds, mem) =>
      s"""{"stmt":$n,"persist_rdds":$rdds,"block_mem_bytes":$mem}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"dml_soak","statements":$total,"sec":${f"$sec%.1f"},"curve":$curve}""")
    spark.stop()
  }
}
