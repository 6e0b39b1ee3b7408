package graft.queries

import org.apache.spark.sql.functions._

/** TPC-H-shaped headline queries, adapted to the driver testdata schema
  * (TESTDATA.md — no partsupp table; fewer columns; dates span 1995-2001).
  * Reference runs all 22 on its own tiny dataset
  * (`/root/reference/tests/sql/tpch/`); these are the bench workload, so
  * every one is marked bench=true. Q1/Q6 live in Relational.
  *
  * Scale notes: customer/supplier/part/nation/region are dim-sized →
  * Spark broadcast-joins them automatically; lineitem⋈orders is the only
  * genuine shuffle join and AQE handles its partitioning.
  */
object Tpch {

  def all: Registry = Map(
    // Q3: shipping-priority — 3-way join, agg, top-10 by revenue
    "q3_top_orders" -> Q(
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").filter(col("o_orderdate") < tsLit("1998-01-01 00:00:00"))
        val l = t(s, d, "lineitem").filter(col("l_shipdate") > tsLit("1998-01-01 00:00:00"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
              |strftime(o_orderdate, '%Y-%m-%d') AS o_date
              |FROM customer, orders, lineitem
              |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              |AND l_orderkey = o_orderkey
              |AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // Q4-shape: order-priority count with correlated EXISTS
    "q4_order_priority" -> Q(
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
            col("o_orderdate") < tsLit("1997-01-01 00:00:00"))
        val l = t(s, d, "lineitem").filter(col("l_quantity") >= 48)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |AND EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      bench = true),

    // Q5: local-supplier revenue — 6-way join through region
    "q5_local_supplier_revenue" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
        val n = t(s, d, "nation"); val r = t(s, d, "region")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer, orders, lineitem, supplier, nation, region
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true),

    // Q7-shape: revenue between nation pairs by ship year
    "q7_nation_volume" -> Q(
      (s, d) => {
        val su = t(s, d, "supplier"); val l = t(s, d, "lineitem")
        val o = t(s, d, "orders"); val c = t(s, d, "customer")
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        l.join(su, l("l_suppkey") === su("s_suppkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n1, su("s_nationkey") === col("sk"))
          .join(n2, c("c_nationkey") === col("ck"))
          .filter(col("supp_nation") < col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
              |${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM supplier, lineitem, orders, customer, nation n1, nation n2
              |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              |AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              |AND c_nationkey = n2.n_nationkey AND n1.n_name < n2.n_name
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      bench = true),

    // Q9-shape: profit by nation and year (no partsupp → cost term dropped)
    "q9_profit_by_nation_year" -> Q(
      (s, d) => {
        val p = t(s, d, "part")
        val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
        val o = t(s, d, "orders"); val n = t(s, d, "nation")
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name").as("nation_name"), year(col("o_orderdate")).as("o_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_profit"))
          .orderBy(col("nation_name"), col("o_year").desc)
      },
      // NB: alias must not be `nation` — DuckDB resolves that to the table
      Some(s"""SELECT n_name AS nation_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
              |${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_profit
              |FROM lineitem, part, supplier, orders, nation
              |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
              |AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
              |GROUP BY n_name, o_year ORDER BY nation_name, o_year DESC""".stripMargin),
      bench = true),

    // Q10: returned-item revenue per customer, top 20
    "q10_returned_revenue" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val n = t(s, d, "nation")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= tsLit("1996-10-01 00:00:00") &&
            col("o_orderdate") < tsLit("1997-01-01 00:00:00"))
        val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
              |${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer, orders, lineitem, nation
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
              |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              |AND l_returnflag = 'R' AND c_nationkey = n_nationkey
              |GROUP BY c_custkey, c_name, c_acctbal, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      bench = true),

    // Q12-shape: line-priority classification (no shipmode column →
    // classified on returnflag) with conditional aggregation
    "q12_priority_lines" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
            col("l_shipdate") < tsLit("1997-01-01 00:00:00"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      // CAST to BIGINT: DuckDB SUM(int) yields HUGEINT, which the driver's
      // hasher distinguishes from Spark's LongType even when values agree.
      Some("""SELECT l_returnflag,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders, lineitem
             |WHERE o_orderkey = l_orderkey
             |AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      bench = true),

    // Q14: promo revenue share — conditional agg over part join
    "q14_promo_revenue" -> Q(
      (s, d) => {
        val p = t(s, d, "part"); val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= tsLit("1997-01-01 00:00:00") &&
            col("l_shipdate") < tsLit("1997-02-01 00:00:00"))
        l.join(p, l("l_partkey") === p("p_partkey"))
          .agg((lit(100.0) *
            dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) /
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("promo_revenue"))
      },
      Some(s"""SELECT 100.0 *
              |${oSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
              |${oSum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
              |FROM lineitem, part WHERE l_partkey = p_partkey
              |AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              |AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin),
      bench = true),

    // Q18: large-quantity orders (agg subquery as semi-join filter)
    "q18_large_orders" -> Q(
      // ONE lineitem pass: the output's per-order quantity sum IS the
      // HAVING sum (the final group is one order), so the canonical
      // semi-join + re-join + re-aggregate would scan and shuffle lineitem
      // twice to recompute a value the first aggregate already holds. The
      // filtered aggregate is tiny (orders over the threshold), so AQE
      // broadcasts it into the orders join — lineitem is aggregated once
      // and never revisited.
      (s, d) => {
        val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val big = l.groupBy(col("l_orderkey").as("big_okey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        o.join(big, o("o_orderkey") === col("big_okey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
              |o_totalprice, ${oSum("l_quantity")} AS sum_qty
              |FROM customer, orders, lineitem
              |WHERE o_orderkey IN (
              |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
              |  HAVING CAST(SUM(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 > 150)
              |AND c_custkey = o_custkey AND o_orderkey = l_orderkey
              |GROUP BY c_name, c_custkey, o_orderkey, o_date, o_totalprice
              |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      bench = true),

    // Q19: disjunctive multi-attribute predicates (brand × size × quantity)
    "q19_disjunctive_filter" -> Q(
      (s, d) => {
        val p = t(s, d, "part"); val l = t(s, d, "lineitem")
        l.join(p, l("l_partkey") === p("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 40)))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
              |COUNT(*) AS n_lines
              |FROM lineitem, part WHERE l_partkey = p_partkey AND (
              |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) OR
              |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30) OR
              |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))""".stripMargin),
      bench = true),

    // Q8-shape: market share of one supplier nation within a region, by year
    "q8_market_share" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
        val p = t(s, d, "part").filter(col("p_type") === "STANDARD")
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("ck"), col("n_regionkey"))
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n1, c("c_nationkey") === col("ck"))
          .join(r, col("n_regionkey") === r("r_regionkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(n2, su("s_nationkey") === col("sk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((dsum(when(col("supp_nation") === "CHINA",
              col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) /
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
              |${oSum("CASE WHEN n2.n_name = 'CHINA' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
              |${oSum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |GROUP BY o_year ORDER BY o_year""".stripMargin),
      bench = true),

    // Q13: customer order-count distribution (left join + double aggregation)
    "q13_order_distribution" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        // pre-aggregate orders per buyer BEFORE the left join: the join
        // then carries ≤ |customers| rows (dimension-bounded) instead of
        // raw orders, and broadcasts — the same fact-side pre-aggregation
        // as q22's buyer set. count(o_orderkey) == count(*) per custkey
        // (the key is never null), and customers with no orders coalesce
        // to 0 exactly as the outer-join count did.
        val perCust = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
          .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey) x
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      bench = true),

    // Q15: top supplier by revenue (agg view + scalar-subquery max)
    "q15_top_supplier" -> Q(
      (s, d) => {
        val su = t(s, d, "supplier")
        // The 1-row max branch re-runs the lineitem aggregation (Spark
        // doesn't unify a plan with its own aggregate) — deliberate, same
        // finding as q11 (Q11Probe): an InMemoryRelation build costs more
        // than a second pass of a pushed-down filtered scan with map-side
        // partial aggregation, and never unpersisting leaked storage
        // across the bench JVM. Both passes stay fully parallel at 100×.
        // The former global-window form funneled every supplier through
        // one task — wrong shape at 100× scale.
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
            col("l_shipdate") < tsLit("1996-04-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
        // INVARIANT: the exact-equality filter below is deterministic ONLY
        // because dsum is order-independent — it sums integer micros
        // (Long addition is associative+commutative), so total_revenue for
        // a given supplier is bit-identical across partitionings, retries
        // and both passes. A double-`sum` here would make `=== _m` flaky
        // under Spark's nondeterministic reduce order.
        val top = rev.crossJoin(broadcast(
            rev.agg(max(col("total_revenue")).as("_m"))))
          .filter(col("total_revenue") === col("_m"))
        su.join(top, su("s_suppkey") === top("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH revenue AS (
              |  SELECT l_suppkey, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
              |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin),
      bench = true),

    // Q17: small-quantity revenue with per-part correlated average threshold
    "q17_small_quantity" -> Q(
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_brand") === "Brand#3")
        val l = t(s, d, "lineitem")
        // one lineitem pass: the broadcast part join keeps EVERY line of
        // the qualifying parts, so the correlated per-part average is a
        // window over the joined rows (partition = lines-per-part, tiny)
        // — the groupBy-subquery formulation scanned lineitem twice, the
        // second time unfiltered.
        val joined = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
        val qtyThresh = (sum(roundAwayLong(col("l_quantity") * 1e6)).over(wp)
          .cast("double") / 1e6 / count(col("l_quantity")).over(wp)) * 0.2
        joined.withColumn("qty_thresh", qtyThresh)
          .filter(col("l_quantity") < col("qty_thresh"))
          .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      },
      Some(s"""SELECT ${oSum("l_extendedprice")} / 7.0 AS avg_yearly
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE p_brand = 'Brand#3'
              |AND l_quantity < (
              |  SELECT ${oAvg("l2.l_quantity")} * 0.2 FROM lineitem l2
              |  WHERE l2.l_partkey = p_partkey)""".stripMargin),
      bench = true),

    // Q22-shape: wealthy customers with no orders, per nation (no phone
    // column → grouped by nation key instead of phone prefix)
    "q22_idle_balances" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg(davg(col("c_acctbal")).as("ab"))
        // anti join needs only the DISTINCT custkey set, which is bounded
        // by the customer dimension at any fact scale — the distinct is a
        // map-side-combined aggregate whose exchange carries keys, not
        // orders (measured: collapses q22's growth at 100× fact volume;
        // Catalyst does not derive this rewrite itself)
        val buyers = o.select(col("o_custkey")).distinct()
        c.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
          .join(buyers, c("c_custkey") === buyers("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS numcust, ${oSum("c_acctbal")} AS totacctbal
              |FROM customer
              |WHERE c_acctbal > (SELECT ${oAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
              |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      bench = true),

    // extension: grouping sets / rollup (absent in reference, free in Spark)
    "agg_rollup" -> Q(
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${oSum("l_quantity")} AS qty
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    "agg_cube" -> Q(
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // explicit GROUPING SETS (completes the rollup/cube trio — an
    // arbitrary set list neither shorthand expresses)
    "agg_grouping_sets" -> Q(
      (s, d) => t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              |${oSum("o_totalprice")} AS total
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
              |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin))
  )
}
