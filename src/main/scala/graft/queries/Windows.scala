package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions — SURVEY.md §2.5. The reference runtime supports
  * `row_number` + any aggregate as a *running* (rows unbounded
  * preceding..current) computation and ignores PARTITION/ORDER at runtime
  * (`/root/reference/src/executor/window.rs:16-34`); we implement the full
  * correct semantics (strict improvement, same results on its test surface)
  * plus rank/lag/lead as extensions.
  *
  * Running double sums go through the decimal detour (window prefix sums are
  * order-fixed, but DuckDB may use a different accumulation tree).
  */
object Windows {

  def all: Registry = Map(
    // the reference's actual surface: running aggregate over a global order
    "window_running_sum" -> Q(
      (s, d) => {
        val w = Window.orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_orderkey"),
            sum(col("o_totalprice").cast(Dec)).over(w).cast("double").as("running_total"),
            row_number().over(Window.orderBy(col("o_orderkey"))).as("rn"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
             |  OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             |ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // proper PARTITION BY + ORDER BY running aggregate
    "window_partitioned_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(Dec)).over(w).cast("double").as("cust_running"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
             |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cust_running
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    "window_row_number" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"))
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            row_number().over(w).as("rn"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // extensions beyond the reference: rank/dense_rank/lag/lead
    "window_rank_lag_lead" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            lag(col("c_custkey"), 1).over(w).as("prev_key"),
            lead(col("c_custkey"), 1).over(w).as("next_key"))
          .orderBy("c_nationkey", "rnk", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey,
             |RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
             |LAG(c_custkey, 1) OVER w AS prev_key, LEAD(c_custkey, 1) OVER w AS next_key
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin)),

    // bounded ROWS frame — moving average (the reference's binder
    // todo!()s window frames entirely, src/binder/expr.rs:477-479; we
    // support the full frame surface). avg computed as sum/count of the
    // SAME doubles on both engines so fp division is bit-identical.
    "window_moving_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-3, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(col("o_totalprice").cast(Dec)).over(w).cast("double") /
              count(lit(1)).over(w)).as("moving_avg"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE)
             |  / COUNT(*) OVER w AS moving_avg
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // RANGE frame — peers by ORDER-BY value distance, not row position:
    // all earlier orders of the customer within 1000.0 of the current
    // price (value-bounded sliding aggregate)
    "window_range_frame" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("price_i"))
          .rangeBetween(-1000L, 0L)
        t(s, d, "orders")
          .withColumn("price_i", floor(col("o_totalprice")).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"), col("price_i"),
            count(lit(1)).over(w).as("n_near"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(FLOOR(o_totalprice) AS BIGINT) AS price_i,
             |COUNT(*) OVER (PARTITION BY o_custkey
             |               ORDER BY CAST(FLOOR(o_totalprice) AS BIGINT)
             |               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // top-k per group via row_number filter (classic pattern; the reference
    // has no QUALIFY — expressed as subquery on both sides)
    "window_topk_per_group" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) x
             |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin)),

    // distribution window functions — ntile / percent_rank / cume_dist
    // (SQL-standard semantics on both engines; the rank ratios are single
    // IEEE divisions of identical integers, r6 guards the formatting edge)
    "window_ntile_cume" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).as("quartile"),
            r6(percent_rank().over(w)).as("pct_rank"),
            r6(cume_dist().over(w)).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |NTILE(4) OVER w AS quartile,
             |round(PERCENT_RANK() OVER w, 6) AS pct_rank,
             |round(CUME_DIST() OVER w, 6) AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
