package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** Prices file-granular copy-on-write DML against the former O(table)
  * full rewrite: load scale-N lineitem into multi-file engine tables,
  * then time a one-key selective DELETE at two base sizes. The claim
  * under test is the complexity class — a selective delete should cost
  * O(matched files) I/O, so its wall time should stay ~flat as the base
  * grows, while a full (unselective) rewrite scales with the table.
  *
  * Run: `sbt "Test/runMain graft.CowBench /root/testdata/sf0.1 [mult]"`
  * → one JSON line.
  */
object CowBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = new java.io.File("target/graft-tmp/cow-bench-warehouse")
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete(); ()
    }
    if (wh.exists()) rmr(wh)
    val engine = new Engine(spark, wh.getPath)
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)
    def timed(sql: String): Double = {
      val t0 = System.nanoTime()
      engine.run(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }

    spark.read.parquet(s"$src/lineitem.parquet").createOrReplaceTempView("li_src")
    // small base: 1× lineitem, appended in 8 slices → 8+ file families
    engine.run("create table cow_s as select * from li_src where 1 = 0")
    (0 until 8).foreach(i => engine.run(
      s"insert into cow_s select * from li_src where l_orderkey % 8 = $i"))
    // big base: mult× lineitem (shifted keys), same slice count per copy
    engine.run("create table cow_b as select * from li_src where 1 = 0")
    (0 until mult).foreach { m =>
      (0 until 8).foreach(i => engine.run(
        s"insert into cow_b select l_orderkey + ${m * 100000000L} as l_orderkey, " +
          "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, " +
          "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate " +
          s"from li_src where l_orderkey % 8 = $i"))
    }
    val nS = engine.run("select count(*) as n from cow_s").collect()(0).getLong(0)
    val nB = engine.run("select count(*) as n from cow_b").collect()(0).getLong(0)
    // warm both scans so the first timed run isn't paying cold file listing
    engine.run("select count(*) from cow_s").collect()
    engine.run("select count(*) from cow_b").collect()

    val key = spark.sql("select l_orderkey from li_src limit 1")
      .collect()(0).getLong(0)
    val selS = timed(s"delete from cow_s where l_orderkey = $key")
    val selB = timed(s"delete from cow_b where l_orderkey = $key")
    // the O(table) comparator: an unselective delete rewrites everything
    val fullS = timed("delete from cow_s where l_quantity >= 0")
    val fullB = timed("delete from cow_b where l_quantity >= 0")

    // r17 bucket-granular COW: same claim on the engine's recommended
    // 100 TB layout (CLUSTERED BY). A bucket-key-equality DELETE should
    // rewrite ONE bucket's files and hard-link the other 15, so its wall
    // time should stay ~flat as the base grows mult×.
    def mkBucketed(name: String, copies: Int): Unit = {
      engine.run(s"create table $name(l_orderkey bigint, l_quantity double) " +
        "clustered by (l_orderkey) into 16 buckets")
      (0 until copies).foreach(m => engine.run(
        s"insert into $name select l_orderkey + ${m * 100000000L}, " +
          s"l_quantity from li_src"))
    }
    mkBucketed("cowbk_s", 1)
    mkBucketed("cowbk_b", mult)
    engine.run("select count(*) from cowbk_s").collect()
    engine.run("select count(*) from cowbk_b").collect()
    val bselS = timed(s"delete from cowbk_s where l_orderkey = $key")
    val bselB = timed(s"delete from cowbk_b where l_orderkey = $key")

    // r18 PARTITIONED BY: the retention-delete claim on the date-
    // partitioned fact layout. `DELETE WHERE ds = month` drops whole
    // k=v directories — survivors hard-link, no data file is read for
    // the rewrite — so wall time should stay ~flat as rows grow mult×.
    // The insert DISTRIBUTEs BY the partition expression so each month
    // gets O(1) files per load (the layout a real pipeline would write).
    def mkPartitioned(name: String, copies: Int): Unit = {
      engine.run(s"create table $name(l_orderkey bigint, l_quantity double, " +
        "ds varchar) partitioned by (ds)")
      (0 until copies).foreach(m => engine.run(
        s"insert into $name select l_orderkey + ${m * 100000000L}, " +
          "l_quantity, substr(cast(l_shipdate as varchar), 1, 7) as ds " +
          "from li_src distribute by substr(cast(l_shipdate as varchar), 1, 7)"))
    }
    mkPartitioned("cowpt_s", 1)
    mkPartitioned("cowpt_b", mult)
    engine.run("select count(*) from cowpt_s").collect()
    engine.run("select count(*) from cowpt_b").collect()
    val pselS = timed("delete from cowpt_s where ds = '1995-03'")
    val pselB = timed("delete from cowpt_b where ds = '1995-03'")

    println(s"""{"metric":"cow_selective_delete","unit":"sec",""" +
      s""""rows_small":$nS,"rows_big":$nB,""" +
      s""""selective_small":${fmt(selS)},"selective_big":${fmt(selB)},""" +
      s""""full_small":${fmt(fullS)},"full_big":${fmt(fullB)},""" +
      s""""selective_ratio":${fmt(selB / selS)},"full_ratio":${fmt(fullB / fullS)},""" +
      s""""bucketed_selective_small":${fmt(bselS)},"bucketed_selective_big":${fmt(bselB)},""" +
      s""""bucketed_selective_ratio":${fmt(bselB / bselS)},""" +
      s""""partition_drop_small":${fmt(pselS)},"partition_drop_big":${fmt(pselB)},""" +
      s""""partition_drop_ratio":${fmt(pselB / pselS)}}""")
    spark.stop()
  }
}
