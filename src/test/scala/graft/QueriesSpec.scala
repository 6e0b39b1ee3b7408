package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry entry must execute on sf0.001; spot checks pin known
  * semantics (the DuckDB hash gate does the exhaustive value checking).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // one test per query: executes and yields a well-formed result
  SparkEntry.registry.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"query $name runs") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      // the driver's hash gate sorts rows by every column in pandas, which
      // cannot order array/struct/map cells (the round-11 vector_sq8_codes
      // red row) — oracle-compared queries must emit scalar columns only;
      // pack codes into longs or hex strings instead
      if (q.oracle.isDefined) {
        val nested = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => f.name
        }
        assert(nested.isEmpty,
          s"gate query $name emits non-sortable column(s) ${nested.mkString(", ")}")
      }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Returns the aliases of uncast `SUM(...) AS <alias>` expressions in
    * `sql` whose alias names a column in `intCols`. DuckDB widens an
    * uncast SUM over integers to HUGEINT, which pandas renders as
    * float64 — the driver's hash gate then compares "5.0" against
    * Spark's "5" and fails even though values match (the r15 red rows).
    * Every integer-sum oracle must wrap in CAST(... AS BIGINT).
    */
  private def uncastIntSums(sql: String, intCols: Set[String]): Seq[String] = {
    val up = sql.toUpperCase
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = up.indexOf("SUM(")
    while (i >= 0) {
      val wordStart = i == 0 || !(up(i - 1).isLetterOrDigit || up(i - 1) == '_')
      if (wordStart) {
        // is this SUM( immediately wrapped by CAST( ?
        val before = up.substring(0, i).reverse.dropWhile(_.isWhitespace)
        val castWrapped = before.startsWith("(TSAC") // "CAST(" reversed
        if (!castWrapped) {
          // find the matching close paren of SUM's open paren
          var depth = 0; var j = i + 3
          while (j < up.length && (depth > 0 || j == i + 3)) {
            if (up(j) == '(') depth += 1 else if (up(j) == ')') depth -= 1
            j += 1
          }
          val tail = sql.substring(j).dropWhile(_.isWhitespace)
          if (tail.length > 3 && tail.substring(0, 2).equalsIgnoreCase("AS") &&
              tail(2).isWhitespace) {
            val alias = tail.drop(3).dropWhile(_.isWhitespace)
              .takeWhile(c => c.isLetterOrDigit || c == '_').toLowerCase
            if (intCols.contains(alias)) bad += alias
          }
        }
      }
      i = up.indexOf("SUM(", i + 1)
    }
    bad.toSeq
  }

  test("oracle lint: integer-typed gate columns must CAST their SUMs") {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val violations = SparkEntry.registry.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      q.oracle.toSeq.flatMap { sql =>
        val intCols = q.fn(spark, sf).schema.fields.collect {
          case f if Set[org.apache.spark.sql.types.DataType](
            ByteType, ShortType, IntegerType, LongType).contains(f.dataType) =>
            f.name.toLowerCase
        }.toSet
        uncastIntSums(sql, intCols).map(a => s"$name:$a")
      }
    }
    assert(violations.isEmpty,
      s"uncast integer SUM in oracle SQL (wrap in CAST(... AS BIGINT)): ${violations.mkString(", ")}")
  }

  test("oracle lint fires on a deliberately uncast integer SUM") {
    val sql = "SELECT g, SUM(CASE WHEN x THEN 1 ELSE 0 END) AS n_hits FROM t GROUP BY g"
    assert(uncastIntSums(sql, Set("n_hits")) == Seq("n_hits"))
    // and stays quiet once cast, or when the column is float-typed
    val cast = "SELECT g, CAST(SUM(CASE WHEN x THEN 1 ELSE 0 END) AS BIGINT) AS n_hits FROM t GROUP BY g"
    assert(uncastIntSums(cast, Set("n_hits")).isEmpty)
    assert(uncastIntSums(sql, Set("other_col")).isEmpty)
  }

  test("q1_agg groups are the 4 flag/status combos plus") {
    val rows = SparkEntry.registry("q1_agg").fn(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val flags = rows.map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
  }

  test("topn returns exactly 10 ordered by price desc") {
    val rows = SparkEntry.registry("topn").fn(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("join_anti + join_semi partition the customers with/without orders") {
    val semi = SparkEntry.registry("join_semi"). fn(spark, sf).count()
    val anti = SparkEntry.registry("join_anti").fn(spark, sf).count()
    val withOrders = Tables.df(spark, sf, "orders").select("o_custkey").distinct().count()
    val total = Tables.df(spark, sf, "customer").count()
    assert(anti == total - withOrders)
    assert(semi <= withOrders)
  }

  test("events_retention: every cohort starts at offset 0 with its max user count") {
    val rows = SparkEntry.registry("events_retention").fn(spark, sf).collect()
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cohort, rs) =>
      val offsets = rs.map(_.getInt(1))
      assert(offsets.contains(0), s"cohort $cohort has no offset-0 row")
      val atZero = rs.find(_.getInt(1) == 0).get.getLong(2)
      assert(rs.forall(_.getLong(2) <= atZero),
        s"cohort $cohort retains more users than it started with")
    }
  }

  test("events_transitions conserves mass: total transitions = events - users") {
    // every user's event chain of length n contributes exactly n-1
    // transitions, so Σ n_transitions == |events| - |users|
    val rows = SparkEntry.registry("events_transitions").fn(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val events = Tables.df(spark, sf, "events")
    val expected = events.count() -
      events.select("user_id").distinct().count()
    assert(total == expected)
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
