package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Engine

/** Scale-soak of the round-12/13 surfaces the small-SF gate can't
  * stress, run at scale100 volumes:
  *
  *  - recursive CTE (Spark 4 UnionLoop) enumerating depth-bounded paths
  *    over a CYCLIC synthetic graph — millions of path rows through the
  *    loop, checking lineage/memory behavior, not just correctness;
  *  - `shortestHops` BFS over the same graph (the scale-correct twin);
  *  - VARIANT shredding over the full scale-100 events table (parse
  *    once, binary traversal, aggregate — no row collection);
  *  - SCROLL-cursor DECLARE over 60M-row lineitem (the distributed
  *    zipWithIndex position stamp + spill) with absolute/backward
  *    fetches against the middle of the snapshot.
  *
  * Prints one JSON line; recorded in SCALING.md.
  * Run: `sbt "Test/runMain graft.Soak13 target/scale100"`.
  */
object Soak13 {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scale100")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)
    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // cyclic graph: 1M nodes, out-degree 2, hash-scrambled destinations
    // (affine maps compose into heavy collisions — hash edges make the
    // reachable set explode, the BFS stress this soak wants)
    val n = 1000000L
    spark.range(n).selectExpr("id AS src", s"pmod(xxhash64(id), $n) AS dst")
      .unionAll(spark.range(n)
        .selectExpr("id AS src", s"pmod(xxhash64(id + $n), $n) AS dst"))
      .createOrReplaceTempView("soak_edges")
    spark.range(50000).selectExpr("id AS node")
      .createOrReplaceTempView("soak_seeds")

    // warehouse + engine up front: the ENGINE owns the recursion valve
    // (constructor raises spark.sql.cteRecursionRowLimit to 100M; no
    // manual session conf needed — the soak13 finding, productized)
    val wh0 = new java.io.File("target/graft-tmp/soak13-warehouse")
    def rmr0(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr0)
      f.delete(); ()
    }
    if (wh0.exists()) rmr0(wh0)
    val engine = new Engine(spark, wh0.getPath)

    // 1. UnionLoop path recursion, depth 8: ~50k seeds x 2^8 paths,
    // driven through Engine.run so the engine-default valve applies
    val (recSec, recRows) = timed {
      engine.run(
        """WITH RECURSIVE paths(node, hops) AS (
          |  SELECT node, 0 AS hops FROM soak_seeds
          |  UNION ALL
          |  SELECT e.dst, p.hops + 1 FROM paths p
          |  JOIN soak_edges e ON e.src = p.node WHERE p.hops < 8
          |)
          |SELECT count(*) AS n, max(hops) AS d FROM paths""".stripMargin)
        .collect()(0).getLong(0)
    }

    // 2. BFS reachability twin: frontier-deduped, cycle-safe
    val (bfsSec, bfsRows) = timed {
      graft.operators.Graph.shortestHops(
        spark.table("soak_edges"), "src", "dst",
        spark.range(1).selectExpr("id AS node"), "node", maxHops = 25).count()
    }

    // 3. VARIANT shred over the whole scale-100 events table
    val (varSec, varRows) = timed {
      val ev = Tables.df(spark, src, "events")
      val v = parse_json(to_json(struct(
        col("event_type").as("t"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))))
      ev.select(
          variant_get(v, "$.t", "string").as("t"),
          variant_get(v, "$.k", "int").as("k"))
        .agg(count(lit(1)), count(col("k")), sum(col("k")))
        .collect()(0).getLong(0)
    }

    // 4. SCROLL declare over 60M-row lineitem + mid-snapshot fetches
    spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .createOrReplaceTempView("soak_li")
    val (declSec, _) = timed {
      engine.run("declare soakc scroll cursor for " +
        "select l_orderkey, l_linenumber, l_extendedprice from soak_li " +
        "order by l_orderkey, l_linenumber").collect()
    }
    val (fetchSec, fetched) = timed {
      val a = engine.run("fetch absolute 30000000 from soakc").collect().length
      val b = engine.run("fetch backward 3 from soakc").collect().length
      val c = engine.run("fetch forward 100 from soakc").collect().length
      a + b + c
    }
    engine.run("close soakc")

    println(s"""{"metric":"soak13","sf":"$src","recursive_cte":{"sec":${fmt(recSec)},"path_rows":$recRows},"bfs":{"sec":${fmt(bfsSec)},"reached":$bfsRows},"variant_shred":{"sec":${fmt(varSec)},"rows":$varRows},"scroll_declare":{"sec":${fmt(declSec)},"fetch_sec":${fmt(fetchSec)},"fetched":$fetched}}""")
    spark.stop()
  }
}
