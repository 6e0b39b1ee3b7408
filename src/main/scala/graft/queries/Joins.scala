package graft.queries

import org.apache.spark.sql.functions._

/** Join surface — SURVEY.md §2.3: inner/left/right/full outer, cross,
  * left-semi/anti, non-equi (nested-loop in the reference,
  * `/root/reference/src/executor/nested_loop_join.rs`), equi hash join
  * (`hash_join.rs`), semi join with residual condition
  * (`HashSemiJoinExecutor2`), and multi-way join reorder.
  *
  * Spark picks broadcast-hash for every dim-sized side automatically
  * (threshold raised in Tables.sessionConfs); non-equi conditions fall to
  * BroadcastNestedLoopJoin, which is exactly the reference's NLJ but
  * distributed.
  */
object Joins {

  def all: Registry = Map(
    // equi hash join (build/probe in reference; broadcast-hash here)
    "join_inner_hash" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    "join_left_outer" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    "join_right_outer" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    "join_full_outer" -> Q(
      (s, d) => {
        val cn = t(s, d, "customer").groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sn = t(s, d, "supplier").groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full")
          .select(col("c_nationkey"), col("s_nationkey"), col("n_cust"), col("n_supp"))
          .orderBy(col("c_nationkey").asc_nulls_first, col("s_nationkey").asc_nulls_first)
      },
      Some("""SELECT c_nationkey, s_nationkey, n_cust, n_supp FROM
             |(SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
             |FULL JOIN
             |(SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
             |ON c_nationkey = s_nationkey
             |ORDER BY c_nationkey ASC NULLS FIRST, s_nationkey ASC NULLS FIRST""".stripMargin)),

    "join_cross" -> Q(
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name")).orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other, unlike the 3VL `=` join that drops them — the
    // join-side counterpart of the expr_three_valued_logic row
    "join_null_safe" -> Q(
      (s, d) => {
        val a = t(s, d, "documents").filter(col("doc_id") < 50)
          .select(expr("nullif(lang, 'en')").as("k_a"))
        val b = t(s, d, "documents")
          .select(expr("nullif(lang, 'en')").as("k_b"))
        a.join(b, col("k_a") <=> col("k_b"))
          .groupBy(col("k_a")).agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("k_a").asc_nulls_first)
      },
      Some("""SELECT a.k AS k_a, COUNT(*) AS n_pairs
             |FROM (SELECT nullif(lang, 'en') AS k FROM documents WHERE doc_id < 50) a
             |JOIN (SELECT nullif(lang, 'en') AS k FROM documents) b
             |  ON a.k IS NOT DISTINCT FROM b.k
             |GROUP BY a.k ORDER BY a.k NULLS FIRST""".stripMargin)),

    // key-only semi join (reference HashSemiJoinExecutor)
    "join_semi" -> Q(
      (s, d) => {
        val c = t(s, d, "customer")
        val big = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name")).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
             |ORDER BY c_custkey""".stripMargin)),

    "join_anti" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name")).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // semi join with residual non-equi condition (HashSemiJoinExecutor2)
    "join_semi_residual" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey") &&
            o("o_totalprice") > c("c_acctbal") * 20, "left_semi")
          .select(col("c_custkey"), col("c_acctbal")).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > c_acctbal * 20)
             |ORDER BY c_custkey""".stripMargin)),

    // pure theta join → BroadcastNestedLoopJoin (reference nested_loop_join.rs)
    "join_theta_nl" -> Q(
      (s, d) => {
        val a = t(s, d, "supplier").select(col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
        val b = t(s, d, "supplier").select(col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
        a.join(b, col("b1") < col("b2"))
          .select(col("k1"), col("k2")).orderBy("k1", "k2")
      },
      Some("""SELECT a.s_suppkey AS k1, b.s_suppkey AS k2
             |FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
             |ORDER BY k1, k2""".stripMargin)),

    // non-equi LEFT outer nested-loop (reference supports inner & left only)
    "join_theta_nl_left" -> Q(
      (s, d) => {
        val a = t(s, d, "supplier").select(col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
        val b = t(s, d, "supplier").select(col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
        a.join(b, col("b2") > col("b1") * 2, "left")
          .select(col("k1"), col("k2").as("k2"))
          .orderBy(col("k1"), col("k2").asc_nulls_first)
      },
      Some("""SELECT a.s_suppkey AS k1, b.s_suppkey AS k2
             |FROM supplier a LEFT JOIN supplier b ON b.s_acctbal > a.s_acctbal * 2
             |ORDER BY k1, k2 ASC NULLS FIRST""".stripMargin)),

    // sort-merge-join shape: equi join on the natural PK order of both sides
    // (reference merge_join.rs exploits storage order; Spark picks SMJ when
    // the broadcast threshold is exceeded — semantics identical)
    "join_merge_pk" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val li = t(s, d, "lineitem")
        li.hint("merge").join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("qty"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, COUNT(*) AS n_lines, ${oSum("l_quantity")} AS qty
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))
  )
}
