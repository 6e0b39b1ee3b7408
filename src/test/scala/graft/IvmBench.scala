package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** Prices incremental materialized-view refresh against full recompute
  * on a fact-sized base: load scale-N lineitem into an engine table,
  * anchor an aggregate matview, then time three refresh paths —
  * append-delta (insert 1k rows), delete-delta (delete a 1k-row slice;
  * the recorded pre-image subtracts through the sidecar), and full
  * recompute (an UPDATE commit is not incrementally maintainable). The
  * claim under test is the complexity class — refresh cost
  * O(delta + view), not O(base) — so the interesting numbers are the
  * RATIOS and how they move with base size, not the absolute wall.
  *
  * Run: `sbt "Test/runMain graft.IvmBench target/scale10 [rounds]"`.
  */
object IvmBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scale10")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = new java.io.File("target/graft-tmp/ivm-bench-warehouse")
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete(); ()
    }
    if (wh.exists()) rmr(wh)
    val engine = new Engine(spark, wh.getPath)
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.US, d)
    def timed(sql: String): (Double, String) = {
      val t0 = System.nanoTime()
      val rows = engine.run(sql).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, rows.headOption.map(_.get(0).toString).getOrElse(""))
    }

    spark.read.parquet(s"$src/lineitem.parquet").createOrReplaceTempView("li_src")
    engine.run("create table ivm_fact as select * from li_src")
    val baseRows = engine.run("select count(*) as c from ivm_fact")
      .collect()(0).getLong(0)
    engine.run("create materialized view ivm_view as " +
      "select l_returnflag, l_linestatus, count(*) as n, sum(l_quantity) as q, " +
      "min(l_extendedprice) as lo, max(l_extendedprice) as hi " +
      "from ivm_fact group by l_returnflag, l_linestatus")

    // incremental: append a 1k-row delta per round, refresh
    val inc = (1 to rounds).map { i =>
      engine.run(s"insert into ivm_fact select * from li_src limit 1000")
      val (w, mode) = timed("refresh materialized view ivm_view")
      require(mode == "incremental", s"round $i expected incremental, got $mode")
      w
    }
    // delete-delta: remove a small slice per round; the recorded
    // pre-image delta keeps the refresh incremental (an eviction of a
    // group extremum would re-aggregate just that group)
    val del = (1 to rounds).map { i =>
      engine.run(s"delete from ivm_fact where l_orderkey = ${i * 32}")
      val (w, mode) = timed("refresh materialized view ivm_view")
      require(mode == "incremental", s"round $i expected incremental delete, got $mode")
      w
    }
    // update-delta: rewrite a small slice per round (update decomposes
    // into recorded delete+insert deltas, still incremental)
    val upd = (1 to rounds).map { i =>
      engine.run("update ivm_fact set l_quantity = l_quantity + 1 " +
        s"where l_orderkey = ${i * 64}")
      val (w, mode) = timed("refresh materialized view ivm_view")
      require(mode == "incremental", s"round $i expected incremental update, got $mode")
      w
    }
    // join body (fact ⋈ dim): the delta replays through the join while
    // the dim holds still — refresh stays O(delta ⋈ dim + view), not
    // O(base ⋈ dim). The ~1k-row delta broadcasts against the dim.
    spark.read.parquet(s"$src/part.parquet").createOrReplaceTempView("part_src")
    engine.run("create table ivm_dim as select * from part_src")
    engine.run("create materialized view ivm_jview as " +
      "select p_brand, count(*) as n, sum(l_quantity) as q " +
      "from ivm_fact join ivm_dim on l_partkey = p_partkey group by p_brand")
    val jinc = (1 to rounds).map { i =>
      engine.run("insert into ivm_fact select * from li_src limit 1000")
      val (w, mode) = timed("refresh materialized view ivm_jview")
      require(mode == "incremental", s"round $i expected join incremental, got $mode")
      w
    }
    val jdel = (1 to rounds).map { i =>
      engine.run(s"delete from ivm_fact where l_orderkey = ${i * 96}")
      val (w, mode) = timed("refresh materialized view ivm_jview")
      require(mode == "incremental", s"round $i expected join delete, got $mode")
      w
    }
    // BOTH sides move by appends: the telescoping cross-delta
    // (ΔF ⋈ D_old + F_new ⋈ ΔD) keeps the refresh incremental
    val jx = (1 to rounds).map { i =>
      engine.run("insert into ivm_fact select * from li_src limit 1000")
      engine.run("insert into ivm_dim select * from part_src limit 100")
      val (w, mode) = timed("refresh materialized view ivm_jview")
      require(mode == "incremental", s"round $i expected join cross, got $mode")
      w
    }

    // BOTH sides move with deletes in ONE window: the delete enters as
    // the negated telescoping term at its table's position — fact
    // delete + dim append one round, fact append + dim delete the next
    val jxd = (1 to rounds).map { i =>
      if (i % 2 == 1) {
        engine.run(s"delete from ivm_fact where l_orderkey = ${i * 128}")
        engine.run("insert into ivm_dim select * from part_src limit 100")
      } else {
        engine.run("insert into ivm_fact select * from li_src limit 1000")
        engine.run(s"delete from ivm_dim where p_partkey = ${i * 17}")
      }
      val (w, mode) = timed("refresh materialized view ivm_jview")
      require(mode == "incremental",
        s"round $i expected join cross-delete, got $mode")
      w
    }

    // deletes in BOTH windows (r15): COUNT/SUM fold linearly, so each
    // window's negated term enters at its own position and the refresh
    // stays incremental even with every moved table deleting
    val jxdd = (1 to rounds).map { i =>
      engine.run(s"delete from ivm_fact where l_orderkey = ${i * 160}")
      engine.run(s"delete from ivm_dim where p_partkey = ${i * 23}")
      val (w, mode) = timed("refresh materialized view ivm_jview")
      require(mode == "incremental",
        s"round $i expected join both-deleted, got $mode")
      w
    }

    // EXTREMUM over the join under deletes (r15): deleting the stored
    // minimum flags its group for eviction; the evicted brands push into
    // the DIM as a broadcast semi-filter, the join narrows the fact
    // behind it, and the rescan is trimmed to exactly the evicted
    // groups — so the refresh pays one fact scan joined against a
    // handful of dim rows plus the view merge, never the view-wide
    // re-aggregation shuffle of a full recompute
    engine.run("create materialized view ivm_jxm as " +
      "select p_brand, count(*) as n, min(l_extendedprice) as lo, " +
      "max(l_extendedprice) as hi " +
      "from ivm_fact join ivm_dim on l_partkey = p_partkey group by p_brand")
    val jxm = (1 to rounds).map { i =>
      val mn = engine.run("select min(l_extendedprice) as m from ivm_fact")
        .collect()(0).get(0)
      engine.run(s"delete from ivm_fact where l_extendedprice = $mn")
      val (w, mode) = timed("refresh materialized view ivm_jxm")
      require(mode == "incremental",
        s"round $i expected extremum evict, got $mode")
      w
    }
    // ... and with deletes in BOTH windows (fact extremum + dim row):
    // the folded delete term still carries the extremum over all removed
    // contributions, so detection fires and the same rescan applies
    val jxmdd = (1 to rounds).map { i =>
      val mn = engine.run("select min(l_extendedprice) as m from ivm_fact")
        .collect()(0).get(0)
      engine.run(s"delete from ivm_fact where l_extendedprice = $mn")
      engine.run(s"delete from ivm_dim where p_partkey = ${i * 29}")
      val (w, mode) = timed("refresh materialized view ivm_jxm")
      require(mode == "incremental",
        s"round $i expected extremum both-deleted, got $mode")
      w
    }

    // LEFT OUTER join body (r18): probe-side deltas distribute (same
    // replay as inner); a NULL-SIDE delta takes the two-term signed arm
    // — agg(A ⟗ dim_new) − agg(A ⟗ dim_old) over just the affected
    // probe rows A — so a dim append/delete refreshes at
    // O(A ⋈ dim + view), flat in the fact size
    engine.run("create materialized view ivm_oj as " +
      "select p_brand, count(*) as n, sum(l_quantity) as q, " +
      "count(p_partkey) as matched " +
      "from ivm_fact left join ivm_dim on l_partkey = p_partkey " +
      "group by p_brand")
    val ojProbe = (1 to rounds).map { i =>
      engine.run("insert into ivm_fact select * from li_src limit 1000")
      val (w, mode) = timed("refresh materialized view ivm_oj")
      require(mode == "incremental",
        s"round $i expected outer probe-side incremental, got $mode")
      w
    }
    val ojNull = (1 to rounds).map { i =>
      if (i % 2 == 1)
        engine.run("insert into ivm_dim select * from part_src limit 100")
      else engine.run(s"delete from ivm_dim where p_partkey = ${i * 37}")
      val (w, mode) = timed("refresh materialized view ivm_oj")
      require(mode == "incremental",
        s"round $i expected outer null-side incremental, got $mode")
      w
    }
    engine.run("drop materialized view ivm_oj")

    // SELECT DISTINCT body (r18): group-by-everything with the hidden
    // count carrying row lifetimes — appends that mostly add
    // multiplicity still refresh at O(delta + touched groups)
    engine.run("create materialized view ivm_dist as " +
      "select distinct l_returnflag, l_linestatus, l_linenumber from ivm_fact")
    val dist = (1 to rounds).map { i =>
      engine.run("insert into ivm_fact select * from li_src limit 1000")
      val (w, mode) = timed("refresh materialized view ivm_dist")
      require(mode == "incremental",
        s"round $i expected distinct incremental, got $mode")
      w
    }
    engine.run("drop materialized view ivm_dist")

    // UNGROUPED extremum under interior deletes (r16): the one "group"
    // is the whole body, so until r16 ANY delete forced the full
    // recompute. Lazy eviction now compares the delete window's own
    // min/max against the stored extremum on the merged row — an
    // interior delete (strictly inside [lo, hi]) merges incrementally
    // like a COUNT/SUM, flat in the base size
    engine.run("create materialized view ivm_gx as " +
      "select count(*) as n, min(l_extendedprice) as lo, " +
      "max(l_extendedprice) as hi from ivm_fact")
    val gx = (1 to rounds).map { i =>
      // guard interiority explicitly: rows at the stored extremes stay,
      // so the delete can never evict by construction
      val ex = engine.run(
        "select min(l_extendedprice), max(l_extendedprice) from ivm_fact")
        .collect()(0)
      engine.run(s"delete from ivm_fact where l_orderkey = ${i * 192} " +
        s"and l_extendedprice > ${ex.get(0)} and l_extendedprice < ${ex.get(1)}")
      val (w, mode) = timed("refresh materialized view ivm_gx")
      require(mode == "incremental",
        s"round $i expected ungrouped-extremum interior delete, got $mode")
      w
    }
    // ... and deleting the stored extremum itself recomputes, honestly
    val gxFull = (1 to rounds).map { i =>
      val mn = engine.run("select min(l_extendedprice) as m from ivm_fact")
        .collect()(0).get(0)
      engine.run(s"delete from ivm_fact where l_extendedprice = $mn")
      val (w, mode) = timed("refresh materialized view ivm_gx")
      require(mode == "full",
        s"round $i expected ungrouped-extremum eviction full, got $mode")
      w
    }
    engine.run("drop materialized view ivm_gx")

    // full: every DML shape is delta-decomposed now, so the poison is a
    // VACUUMED delta window — append one row, then drop the version
    // archives the file diff needs; the refresh falls back to full and
    // re-anchors (the same contract a time-travel vacuum has)
    val full = (1 to rounds).map { i =>
      engine.run("insert into ivm_fact select * from li_src limit 1")
      engine.run("vacuum ivm_fact retain 0 versions")
      val (w, mode) = timed("refresh materialized view ivm_view")
      require(mode == "full", s"round $i expected full, got $mode")
      w
    }
    println(s"""{"metric":"ivm_refresh","base_rows":$baseRows,"delta_rows":1000,"rounds":$rounds,"incremental_sec":${fmt(inc.min)},"delete_delta_sec":${fmt(del.min)},"update_delta_sec":${fmt(upd.min)},"join_incremental_sec":${fmt(jinc.min)},"join_delete_sec":${fmt(jdel.min)},"join_cross_sec":${fmt(jx.min)},"join_cross_delete_sec":${fmt(jxd.min)},"join_both_delete_sec":${fmt(jxdd.min)},"join_extremum_evict_sec":${fmt(jxm.min)},"join_extremum_both_delete_sec":${fmt(jxmdd.min)},"outer_probe_sec":${fmt(ojProbe.min)},"outer_nullside_sec":${fmt(ojNull.min)},"distinct_sec":${fmt(dist.min)},"global_extremum_delete_sec":${fmt(gx.min)},"global_extremum_evict_full_sec":${fmt(gxFull.min)},"full_sec":${fmt(full.min)},"speedup":${fmt(full.min / inc.min)}}""")
    spark.stop()
  }
}
