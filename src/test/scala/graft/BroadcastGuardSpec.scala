package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** BroadcastRowGuard end to end: the session is built with
  * `spark.sql.extensions=graft.GraftExtensions`, so the rule is live in
  * both the static optimizer and AQE's re-optimization. These tests
  * assert on the FINAL executed plan (post-AQE), the same artifact the
  * scale100 experiment audits.
  */
class BroadcastGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: DataFrame): String = {
    df.collect() // force execution so AQE finalizes
    df.queryExecution.executedPlan.toString
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("fact-fact join above the row cap is not broadcast") {
    // static row estimates derive from COMPRESSED parquet bytes / row
    // width, so they undershoot true rows by the compression ratio —
    // the cap sits well under the estimate, as it does at real scale
    // (a 15M-row pruned fact estimates ~8M rows against a 4M cap)
    withConf(graft.plans.BroadcastRowGuard.confKey -> "200") {
      val l = Tables.df(spark, sf, "lineitem")
      val o = Tables.df(spark, sf, "orders")
      val p = finalPlan(
        l.join(o, l("l_orderkey") === o("o_orderkey")).groupBy().count())
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    }
  }

  test("small true dimension still broadcasts under the default cap") {
    val o = Tables.df(spark, sf, "orders")
    val n = Tables.df(spark, sf, "nation")
    val p = finalPlan(
      o.join(n, o("o_custkey") % 25 === n("n_nationkey")).groupBy().count())
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("an explicit broadcast hint is respected over the cap") {
    import org.apache.spark.sql.functions.broadcast
    withConf(graft.plans.BroadcastRowGuard.confKey -> "10") {
      val l = Tables.df(spark, sf, "lineitem")
      val o = Tables.df(spark, sf, "orders")
      val p = finalPlan(
        l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
          .groupBy().count())
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("AQE runtime conversion to broadcast is vetoed by exact row counts") {
    // static broadcast off -> the initial plan is SMJ; AQE would flip it
    // to BHJ from runtime sizes. The runtime rule sees EXACT stage row
    // counts and must veto at cap 1000 and allow when disabled.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> (64L << 20).toString)
    def q = {
      val l = Tables.df(spark, sf, "lineitem")
      val o = Tables.df(spark, sf, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey")).groupBy().count()
    }
    withConf(confs :+ (graft.plans.BroadcastRowGuard.confKey -> "1000"): _*) {
      val p = finalPlan(q)
      assert(!p.contains("BroadcastHashJoin"), p)
    }
    withConf(confs :+ (graft.plans.BroadcastRowGuard.confKey -> "0"): _*) {
      val p = finalPlan(q)
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }
}
