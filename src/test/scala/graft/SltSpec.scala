package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Minimal sqllogictest-style runner over the Engine — the reference's
  * test mechanism (`/root/reference/tests/sqllogictest.rs`) re-created for
  * our SQL surface with original scenarios (src/test/resources/slt/).
  *
  * Supported directives: `statement ok`, `statement error`,
  * `query <types>` with expected rows until a blank line; `#` comments.
  * Rows compare ordered when the SQL has an ORDER BY, as a multiset
  * otherwise (standard sqllogictest behavior).
  */
class SltSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = {
    val dir = "/root/repo/target/graft-tmp/slt-warehouse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally s.close()
    }
    new Engine(spark, dir)
  }

  private def fmt(v: Any): String = Main.fmt(v) // shared slt rendering

  private def runFile(name: String): Unit = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/slt/$name"))(scala.io.Codec.UTF8)
    val lines = try src.getLines().toVector finally src.close()
    var i = 0
    var stmt = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) { i += 1 }
      else if (line.startsWith("statement")) {
        val expectError = line.contains("error")
        var j = i + 1
        val sql = new StringBuilder
        while (j < lines.length && lines(j).trim.nonEmpty) {
          sql.append(lines(j)).append("\n"); j += 1
        }
        stmt += 1
        if (expectError) {
          intercept[Exception](engine.run(sql.toString).collect())
        } else {
          withClue(s"$name stmt#$stmt: $sql") { engine.run(sql.toString).collect() }
        }
        i = j
      } else if (line.startsWith("query")) {
        var j = i + 1
        val sql = new StringBuilder
        while (j < lines.length && lines(j).trim != "----") {
          sql.append(lines(j)).append("\n"); j += 1
        }
        j += 1 // skip ----
        val expected = scala.collection.mutable.Buffer[String]()
        while (j < lines.length && lines(j).trim.nonEmpty) {
          expected += lines(j).trim.replaceAll("\\s+", " "); j += 1
        }
        stmt += 1
        val got = withClue(s"$name query#$stmt: $sql") {
          engine.run(sql.toString).collect()
            .map(r => (0 until r.length).map(k => fmt(r.get(k))).mkString(" "))
            .toSeq
        }
        val ordered = sql.toString.toLowerCase.contains("order by")
        withClue(s"$name query#$stmt: $sql\ngot: $got\nwant: $expected\n") {
          if (ordered) assert(got == expected.toSeq)
          else assert(got.sorted == expected.toSeq.sorted)
        }
        i = j
      } else i += 1
    }
  }

  Seq("core.slt", "nulls.slt", "joins.slt", "strings_types.slt", "udf_view.slt",
    "join_semi_anti.slt", "nullable_bool.slt", "subquery.slt", "cte.slt",
    "delete.slt", "view.slt", "blob.slt", "timestamp.slt", "distinct.slt",
    "having.slt", "group_agg.slt", "order_by.slt", "limit_offset.slt",
    "strings_fn.slt", "types_numeric.slt", "where_filter.slt",
    "insert_select.slt", "windows.slt", "catalog.slt",
    // round-4 ports of the remaining reference feature areas
    "vector.slt", "vector_index.slt", "window_function.slt", "sort_agg.slt",
    "merge_join.slt", "pragma.slt", "statistics.slt", "create_drop.slt",
    "operator.slt", "count.slt", "bigint.slt", "filter_null.slt",
    "stringconcat.slt", "substring.slt", "repeat.slt", "replace.slt",
    "copy_csv.slt", "sql_udf.slt", "select_misc.slt",
    "type.slt", "insert.slt", "internal.slt",
    // round-5: DML-triangle extension + SQL text-hash kernels
    "update.slt", "text_functions.slt",
    // round-9: on-demand compaction / z-order maintenance
    "optimize.slt", "bucketing.slt", "merge.slt",
    // round-11: CREATE TABLE AS SELECT + ALTER TABLE / TRUNCATE + txn verbs
    "ctas.slt", "alter.slt", "txn.slt",
    // round-11b: QUALIFY + SQL-level PREPARE/EXECUTE + information_schema
    "qualify.slt", "prepare.slt", "info_schema.slt", "matview.slt",
    "cursor.slt", "upsert.slt",
    // round-11c: seams between the round-11 surfaces (matview×qualify,
    // cursor×refresh, prepare×upsert, bucketed-CTAS×upsert, truncate×refresh)
    "crossfeature.slt",
    // round-11c: table versioning — VERSION/TIMESTAMP AS OF, DESCRIBE
    // HISTORY, VACUUM, restore-from-snapshot, rename/drop interplay
    "time_travel.slt",
    // round-11c: modern-SQL dialect surface pinned through the router
    "modern_sql.slt",
    // round-11c: column DEFAULTs (insert/VALUES-keyword/update/add-column)
    "default.slt",
    // round-12: DML RETURNING (pg extension) + incremental matview
    // refresh + SCROLL cursors
    "returning.slt", "incr_matview.slt", "scroll_cursor.slt", "dml_cte.slt",
    // round-15: LATERAL surface (correlated FROM subqueries, left join
    // lateral, lateral table functions)
    "lateral.slt",
    // round-15: pg sequences — CREATE/ALTER/DROP SEQUENCE, nextval/
    // currval/setval/lastval, SERIAL + IDENTITY sugar, OVERRIDING
    // SYSTEM VALUE, TRUNCATE RESTART IDENTITY, non-transactionality
    "sequence.slt",
    // round-15: CHECK + NOT NULL actually enforced at the write
    // choke points (the checks map's documented contract, now real)
    "constraint.slt",
    // round-15: GENERATED ALWAYS AS (expr) STORED columns — post-image
    // recompute in every DML arm, dependency rules, IVM interplay
    "generated.slt",
    // round-15: ADD/DROP CONSTRAINT + SET/DROP NOT NULL on live tables
    "alter_constraint.slt",
    // round-16: session GUC surface — SET/SHOW/RESET/DEFAULT, DateStyle
    // normalization, current_setting()/version(), SHOW ALL, pg_settings
    "guc.slt",
    // round-18: PARTITIONED BY tables — directory layout, pruned scans,
    // partition-drop retention DELETE, ALTER interplay, buckets inside
    "partition.slt")
    .foreach { f => test(s"slt $f") { runFile(f) } }
}
