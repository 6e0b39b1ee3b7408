package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import graft.queries.TpchSchema

/** SQL-surface parity: the reference's own TPC-H query TEXT
  * (`/root/reference/tests/sql/tpch/q1.sql..q22.sql`, the files its
  * `tpch.slt` loads) runs unmodified through [[Engine.run]] over the
  * driver testdata with [[TpchSchema]] synthesizing the spec columns the
  * slim parquet lacks. The gate already proves the 22 queries VALUE-correct
  * via DataFrame twins + DuckDB oracles; this proves a reference user's
  * literal SQL — multi-statement files, `create view v (cols) as`,
  * `substring(x from i for n)`, `date ± interval`, correlated subqueries —
  * parses, binds, and executes on our engine.
  *
  * Queries whose literal predicates are satisfiable on the synthesized
  * domains must return rows — pinned per query below; the rest (filters
  * on domains the synthetic data narrows to miss, e.g. a p_type prefix
  * that doesn't occur) must execute to a clean empty result.
  */
class TpchSqlSpec extends AnyFunSuite {
  import TestSpark._

  private val refDir = java.nio.file.Paths.get("/root/reference/tests/sql/tpch")

  private lazy val engine = {
    TpchSchema.registerFull(spark, sf)
    new Engine(spark, "/root/repo/target/graft-tmp/tpchsql-warehouse")
  }

  /** Queries that must be non-empty on sf0.001 given the synthesized
    * value domains. Determined empirically once, then pinned — an empty
    * result on any of these means a filter silently stopped matching.
    * The other twelve run clean but select zero rows for data-domain
    * reasons, each verified by hand: the spec's 1993–94 date windows
    * predate the driver's 1995–2001 data (q4 q5 q10 q12 q20), nation
    * literals are synthetic `NATION_n` (q7 q11 q21), p_type/p_name
    * literal shapes don't occur (q2 q8 q9 q20), and every synthetic
    * customer has orders so q22's NOT EXISTS is empty.
    */
  private val mustReturnRows = Set(1, 3, 6, 13, 14, 15, 16, 17, 18, 19)

  for (q <- 1 to 22) {
    test(s"reference q$q.sql runs through Engine.run") {
      assume(java.nio.file.Files.isDirectory(refDir), "reference checkout absent")
      val text = new String(
        java.nio.file.Files.readAllBytes(refDir.resolve(s"q$q.sql")), "UTF-8")
      // the files hold 1..3 ';'-terminated statements (q15: view/query/drop);
      // none of the statement texts contain a quoted ';'
      val stmts = text.split(";").map(_.trim).filter(_.nonEmpty)
      // assert on the SELECT's rows — q15 wraps its query in
      // create view / drop view statements whose results are empty
      var last: Array[org.apache.spark.sql.Row] = Array.empty
      stmts.foreach { s =>
        val rows = engine.run(s).collect()
        if (s.toLowerCase.startsWith("select")) last = rows
      }
      info(s"q$q rows: ${last.length}")
      if (mustReturnRows(q))
        assert(last.nonEmpty, s"q$q returned no rows on the synthesized schema")
    }
  }
}
