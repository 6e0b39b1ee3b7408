package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** SQL entry point with the reference's statement surface
  * (risinglight `Database::run`, `/root/reference/src/db.rs:84-127`):
  * CREATE TABLE/VIEW/INDEX/FUNCTION, INSERT, DELETE, COPY FROM/TO,
  * DROP, PRAGMA/SET, EXPLAIN, `\dt`-style sugar, system tables — routed
  * over a parquet-backed managed warehouse; everything else goes straight
  * to `spark.sql` (Catalyst replaces the reference's binder + egg
  * optimizer wholesale).
  *
  * Storage model: one parquet directory per table under `warehouse/`
  * (INSERT appends files — the analogue of the reference's LSM rowset
  * appends; DELETE rewrites — the analogue of its delete-vector compaction,
  * coarse but single-writer-correct, `src/executor/delete.rs`). At cluster
  * scale the same layout partitions by file; no driver state grows with
  * data size.
  */
class Engine(val spark: SparkSession, val warehouse: String) {

  Files.createDirectories(Paths.get(warehouse))

  /** table name → (schema, primary-key columns) */
  private val tables = mutable.LinkedHashMap[String, (StructType, Seq[String])]()
  /** view name → SQL text (re-planned at each scan, like the reference) */
  private val views = mutable.LinkedHashMap[String, String]()
  /** function name → (params, body) for bind-time inlining */
  private val functions = mutable.LinkedHashMap[String, (Seq[String], String)]()
  /** index name → (table, column, method, options) — metadata only */
  private val indexes = mutable.LinkedHashMap[String, (String, String, String, String)]()

  private def tableDir(name: String) = s"$warehouse/$name"

  /** Re-register every view from its SQL text so each scan re-plans over
    * the CURRENT table state (reference semantics: views store SQL, not
    * plans — `src/binder/create_view.rs`). A view created earlier would
    * otherwise pin the parquet file listing captured at creation time and
    * miss subsequent inserts/deletes. Insertion order handles view-of-view
    * chains. Metadata-only cost per statement.
    */
  private def refreshViews(): Unit =
    views.foreach { case (n, body) =>
      // a broken view (e.g. base table dropped) errors only when scanned,
      // not on unrelated statements — its stale registration stays
      try spark.sql(inlineFunctions(body)).createOrReplaceTempView(n)
      catch { case _: Exception => }
    }

  private def refresh(name: String): Unit = {
    val dir = tableDir(name)
    val stream = Files.list(Paths.get(dir))
    val hasData = try stream.anyMatch(p => p.toString.endsWith(".parquet"))
    finally stream.close()
    val df =
      if (hasData) spark.read.schema(tables(name)._1).parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tables(name)._1)
    df.createOrReplaceTempView(name)
  }

  // ---- statement router ---------------------------------------------------

  private val reCreateTable = """(?is)\s*create\s+table\s+(\w+)\s*\((.*)\)\s*""".r
  private val reCreateView = """(?is)\s*create\s+view\s+(\w+)\s+as\s+(.*)""".r
  private val reCreateIndex =
    """(?is)\s*create\s+index\s+(\w+)\s+on\s+(\w+)\s*(?:using\s+(\w+))?\s*\((\w+)\)\s*(?:with\s*\((.*)\))?\s*""".r
  private val reCreateFunction =
    """(?is)\s*create\s+function\s+(\w+)\s*\(([^)]*)\)\s*returns\s+\w+\s+language\s+sql\s+as\s+'(.*)'\s*""".r
  private val reInsertValues = """(?is)\s*insert\s+into\s+(\w+)\s*(?:\(([^)]*)\))?\s*(values\s*.*|select\s+.*)""".r
  private val reDelete = """(?is)\s*delete\s+from\s+(\w+)(?:\s+where\s+(.*))?\s*""".r
  private val reCopyFrom =
    """(?is)\s*copy\s+(\w+)\s+from\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r
  private val reCopyTo =
    """(?is)\s*copy\s+(\w+)\s+to\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r
  private val reDrop = """(?is)\s*drop\s+(table|view)\s+(\w+)\s*""".r
  private val rePragma = """(?is)\s*pragma\s+(\w+)\s*(?:=\s*(.*))?\s*""".r
  private val reSet = """(?is)\s*set\s+(\S+)\s*=\s*(.*\S)\s*""".r
  private val reExplainAnalyze = """(?is)\s*explain\s+analyze\s+(.*)""".r
  private val reExplain = """(?is)\s*explain\s+(.*)""".r

  private val reDescribe = """\\d\s+(\w+)""".r
  private val reStat = """\\stat(?:\s+(\w+))?(?:\s+(\w+))?\s*""".r

  def run(sql: String): DataFrame = sql.trim match {
    case """\dt""" => systemTable("pg_tables")
    // shell sugar parity with the reference REPL (src/db.rs:64-81)
    case """\di""" => systemTable("pg_indexes")
    case reDescribe(name) =>
      systemTable("pg_attribute").where(col("tablename") === name)
    case reStat(tbl, column) => stat(Option(tbl), Option(column))
    case reCreateTable(name, colsSpec) => createTable(name, colsSpec)
    case reCreateView(name, body) =>
      views(name) = body
      spark.sql(inlineFunctions(body)).createOrReplaceTempView(name)
      emptyResult
    case reCreateIndex(name, table, method, column, opts) =>
      indexes(name) = (table, column, Option(method).getOrElse("btree"),
        Option(opts).getOrElse(""))
      emptyResult
    case reCreateFunction(name, params, body) =>
      val ps = params.split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\s+")(0)).toSeq
      functions(name.toLowerCase) = (ps, body)
      emptyResult
    case reInsertValues(table, colList, source) => insert(table, Option(colList), source)
    case reDelete(table, cond) => delete(table, Option(cond))
    case reCopyFrom(table, path, opts) => copyFrom(table, path, Option(opts))
    case reCopyTo(table, path, opts) => copyTo(table, path, Option(opts))
    case reDrop(kind, name) => drop(kind.toLowerCase, name)
    case rePragma(key, value) =>
      spark.conf.set(s"graft.pragma.$key", Option(value).getOrElse("true"))
      emptyResult
    case reSet(key, value) =>
      spark.conf.set(key, value.stripPrefix("'").stripSuffix("'"))
      emptyResult
    case reExplainAnalyze(body) => explainAnalyze(body)
    case reExplain(body) =>
      import spark.implicits._
      val plan = spark.sql(inlineFunctions(body)).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Seq(plan).toDF("plan")
    case q if q.toLowerCase.startsWith("select") || q.toLowerCase.startsWith("with") ||
        q.toLowerCase.startsWith("values") || q.toLowerCase.startsWith("table") =>
      val inlined = inlineFunctions(q)
      analysisErrorParity(inlined)
      refreshViews()
      spark.sql(inlined)
    case other => refreshViews(); spark.sql(inlineFunctions(other))
  }

  // ---- analysis-error parity (reference src/binder/select.rs) -------------

  /** Reject the statements the reference's binder rejects but Spark's
    * analyzer would accept (or reject with an unrelated message):
    * ORDER-BY⊄DISTINCT (`select.rs:296-345`), aggregates in WHERE /
    * GROUP BY (`select.rs:156,188,242`), window functions in WHERE /
    * HAVING (`select.rs:159-171`). Operates on the parsed (unresolved)
    * plan, so it costs one parse and no analysis.
    */
  private def analysisErrorParity(sql: String): Unit = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Filter => LFilter, Project, Sort}
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return } // parse errors surface in spark.sql
    val aggNames = Set("sum", "min", "max", "count", "avg", "first", "last",
      "first_value", "last_value", "stddev", "variance", "var_samp", "stddev_samp")
    def hasAgg(e: Expression): Boolean = e.exists {
      case f: UnresolvedFunction => aggNames.contains(f.nameParts.last.toLowerCase)
      case _ => false
    }
    def hasWindow(e: Expression): Boolean = e.exists {
      case _: WindowExpression => true
      case _ => false
    }
    def err(msg: String) = throw new IllegalArgumentException(s"bind error: $msg")
    plan.foreach {
      case f: LFilter =>
        if (hasAgg(f.condition)) err("aggregate functions are not allowed in WHERE clause")
        if (hasWindow(f.condition)) err("window functions are not allowed in WHERE clause")
      case a: Aggregate =>
        if (a.groupingExpressions.exists(hasAgg))
          err("aggregate functions are not allowed in GROUP BY")
      case h if h.nodeName == "UnresolvedHaving" =>
        h.expressions.foreach { e =>
          if (hasWindow(e)) err("window functions are not allowed in HAVING clause")
        }
      case s: Sort =>
        s.child match {
          case Distinct(Project(projectList, _)) =>
            val visible: Set[String] = projectList.flatMap {
              case a: Alias => Seq(a.name.toLowerCase, a.child.sql.toLowerCase)
              case e => Seq(e.sql.toLowerCase)
            }.toSet ++ projectList.collect {
              case u: UnresolvedAttribute => u.name.toLowerCase
            }
            s.order.foreach { so =>
              so.child match {
                case _: Literal => // constant — trivially fine
                case o if o.nodeName == "UnresolvedOrdinal" => // position — in-list by construction
                case _ if visible.contains(so.child.sql.toLowerCase) =>
                case other =>
                  err(s"ORDER BY expression ${other.sql} must appear in the DISTINCT list")
              }
            }
          case _ =>
        }
      case _ =>
    }
  }

  private def emptyResult: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("ok", BooleanType))))

  // ---- DDL ---------------------------------------------------------------

  /** Reference type names → Spark types (SURVEY.md §1.2). */
  private def parseType(t: String): DataType = t.trim.toLowerCase match {
    case s if s.startsWith("smallint") => ShortType
    // INTERVAL must precede the int prefix match ("interval".startsWith("int")).
    // Day-to-second ANSI interval: parquet-writable (CalendarIntervalType is
    // not); reference intervals with month parts are out of this envelope
    // (`/root/reference/src/types/interval.rs`).
    case s if s.startsWith("interval") => DayTimeIntervalType()
    case s if s.startsWith("int") || s.startsWith("integer") => IntegerType
    case s if s.startsWith("bigint") => LongType
    case s if s.startsWith("double") || s.startsWith("float") || s.startsWith("real") => DoubleType
    case s if s.startsWith("decimal") || s.startsWith("numeric") =>
      val m = """\w+\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r.findFirstMatchIn(s)
      m.map(g => DecimalType(g.group(1).toInt, g.group(2).toInt)).getOrElse(DecimalType(38, 10))
    case s if s.startsWith("varchar") || s.startsWith("char") || s.startsWith("text") ||
        s.startsWith("string") => StringType
    case s if s.startsWith("bool") => BooleanType
    case s if s.startsWith("date") => DateType
    case s if s.startsWith("timestamp") => TimestampNTZType
    case s if s.startsWith("blob") || s.startsWith("bytea") || s.startsWith("binary") => BinaryType
    case s if s.startsWith("vector") =>
      // reference VECTOR(n) — fixed-length double vector (types/vector.rs)
      ArrayType(DoubleType, containsNull = false)
    case other => throw new IllegalArgumentException(s"unknown type: $other")
  }

  private def createTable(name: String, colsSpec: String): DataFrame = {
    // split on top-level commas (parens may nest inside DECIMAL(p,s))
    val parts = mutable.Buffer[String]()
    var depth = 0; val cur = new StringBuilder
    colsSpec.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString

    val pk = mutable.Buffer[String]()
    val fields = parts.flatMap { p =>
      val toks = p.trim.split("\\s+", 2)
      if (toks(0).equalsIgnoreCase("primary")) {
        // table-level: PRIMARY KEY (a, b)
        pk ++= "\\((.*)\\)".r.findFirstMatchIn(p).toSeq
          .flatMap(_.group(1).split(",").map(_.trim))
        None
      } else {
        val colName = toks(0)
        val rest = toks(1)
        val lower = rest.toLowerCase
        if (lower.contains("primary key")) pk += colName
        val notNull = lower.contains("not null") || lower.contains("primary key")
        Some(StructField(colName, parseType(rest), nullable = !notNull))
      }
    }
    val schema = StructType(fields.toSeq)
    tables(name) = (schema, pk.toSeq)
    Files.createDirectories(Paths.get(tableDir(name)))
    refresh(name)
    saveManifest()
    emptyResult
  }

  private def drop(kind: String, name: String): DataFrame = {
    if (kind == "table") {
      tables.remove(name)
      val dir = Paths.get(tableDir(name))
      if (Files.exists(dir)) deleteRecursively(dir, keepRoot = false)
    } else views.remove(name)
    spark.catalog.dropTempView(name)
    saveManifest()
    emptyResult
  }

  // ---- DML ---------------------------------------------------------------

  /** INSERT: align/reorder columns, null-fill missing, cast to the column
    * types (reference `src/executor/insert.rs:13-52`), append parquet.
    */
  private def insert(table: String, colList: Option[String], source: String): DataFrame = {
    val (schema, _) = tables(table)
    val src = spark.sql(inlineFunctions(source))
    val given = colList.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(schema.fields.map(_.name).toSeq)
    require(given.length == src.columns.length,
      s"INSERT column count mismatch: ${given.length} vs ${src.columns.length}")
    val renamed = src.toDF(given: _*)
    val aligned = schema.fields.map { f =>
      if (given.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val n = renamed.count()
    renamed.select(aligned.toIndexedSeq: _*).write.mode("append").parquet(tableDir(table))
    refresh(table)
    rowCountResult(n)
  }

  /** DELETE: anti-filter rewrite — keep rows where cond is not TRUE (3VL).
    *
    * Fully distributed: survivors stream executor-side into a sibling temp
    * dir, then the table dir is swapped under the single-writer model. No
    * driver materialization, so the rewrite cost is a scan+write regardless
    * of table size (the analogue of the reference's delete-vector compaction,
    * `src/executor/delete.rs`).
    */
  private def delete(table: String, cond: Option[String]): DataFrame = {
    val (schema, _) = tables(table)
    val cur = spark.table(table)
    val total = cur.count()
    val remaining = cond match {
      case Some(c) => cur.filter(!coalesce(expr(inlineFunctions(c)), lit(false)))
      case None => cur.limit(0)
    }
    val tmp = s"${tableDir(table)}__rewrite"
    remaining.write.mode("overwrite").parquet(tmp) // materializes BEFORE the swap
    val kept = spark.read.schema(schema).parquet(tmp).count()
    deleteRecursively(Paths.get(tableDir(table)), keepRoot = true)
    val stream = Files.list(Paths.get(tmp))
    try stream.forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.move(p, Paths.get(tableDir(table)).resolve(p.getFileName.toString))
    } finally stream.close()
    deleteRecursively(Paths.get(tmp), keepRoot = false)
    refresh(table)
    rowCountResult(total - kept)
  }

  private def deleteRecursively(dir: java.nio.file.Path, keepRoot: Boolean): Unit = {
    val stream = Files.walk(dir)
    try stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .filter(p => !(keepRoot && p == dir)).forEach(p => Files.deleteIfExists(p))
    finally stream.close()
  }

  private def rowCountResult(n: Long): DataFrame = {
    import spark.implicits._
    Seq(n).toDF("rows_affected")
  }

  // ---- COPY (CSV only, like the reference: src/binder/copy.rs) -----------

  private def csvOptions(opts: Option[String]): Map[String, String] = {
    val m = mutable.Map("delimiter" -> ",", "header" -> "false")
    opts.foreach(_.split(",").map(_.trim).filter(_.nonEmpty).foreach { o =>
      val kv = o.split("\\s+|=", 2)
      val key = kv(0).toLowerCase
      val value = if (kv.length > 1) kv(1).trim.stripPrefix("'").stripSuffix("'") else "true"
      key match {
        case "delimiter" => m("delimiter") = value
        case "header" => m("header") = value
        case "quote" => m("quote") = value
        case "escape" => m("escape") = value
        case _ =>
      }
    })
    m.toMap
  }

  private def copyFrom(table: String, path: String, opts: Option[String]): DataFrame = {
    val (schema, _) = tables(table)
    val df = spark.read.options(csvOptions(opts)).schema(schema).csv(path)
    val n = df.count()
    df.write.mode("append").parquet(tableDir(table))
    refresh(table)
    rowCountResult(n)
  }

  private def copyTo(table: String, path: String, opts: Option[String]): DataFrame = {
    val df = spark.table(table)
    val n = df.count()
    df.write.options(csvOptions(opts)).mode("overwrite").csv(path)
    rowCountResult(n)
  }

  // ---- SQL UDF bind-time inlining (reference src/binder/expr.rs:378-434) --

  /** Expand calls `f(e1, e2)` of registered SQL functions by substituting
    * `$1`/`$2` (or named params) in the stored body; repeats to a fixed
    * point so UDFs may call UDFs.
    */
  def inlineFunctions(sql: String): String = {
    // type-alias parity: the reference collapses bare VARCHAR/TEXT to its
    // string type (`src/types/mod.rs:114`); Spark requires VARCHAR(n)
    var out = sql
      .replaceAll("(?i)\\bas\\s+varchar\\s*([,)])", "AS STRING$1")
      .replaceAll("(?i)\\bas\\s+text\\s*([,)])", "AS STRING$1")
    var changed = true
    var guard = 0
    while (changed && guard < 10) {
      changed = false; guard += 1
      functions.foreach { case (name, (params, body)) =>
        val call = (s"(?i)\\b$name\\s*\\(").r
        call.findFirstMatchIn(out).foreach { m =>
          val (args, end) = parseArgs(out, m.end)
          var expanded = body
          // body is usually 'select <expr>' — take the expression
          expanded = expanded.trim.replaceAll("(?i)^select\\s+", "")
          params.zipWithIndex.foreach { case (p, i) =>
            expanded = expanded
              .replace(s"$$${i + 1}", s"(${args(i)})")
              .replaceAll(s"(?i)\\b$p\\b", s"(${args(i)})")
          }
          out = out.substring(0, m.start) + s"($expanded)" + out.substring(end)
          changed = true
        }
      }
    }
    out
  }

  /** Parse balanced comma-separated args starting after the open paren. */
  private def parseArgs(s: String, from: Int): (Seq[String], Int) = {
    val args = mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 1; var i = from
    while (i < s.length && depth > 0) {
      s(i) match {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; if (depth > 0) cur += ')'
        case ',' if depth == 1 => args += cur.toString.trim; cur.clear()
        case c => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) args += cur.toString.trim
    (args.toSeq, i)
  }

  // ---- EXPLAIN ANALYZE (reference src/executor/analyze.rs:19-77) ---------

  /** Run the query, then report per-operator output rows and timing from
    * the executed plan's SQL metrics — the analogue of the reference's
    * `Analyze` executor which wraps each node with row/time counters.
    */
  private def explainAnalyze(body: String): DataFrame = {
    import spark.implicits._
    val df = spark.sql(inlineFunctions(body))
    // run through THIS queryExecution instance (df.write would plan a
    // separate execution and leave these metrics untouched); rows are
    // consumed executor-side, nothing is collected
    df.queryExecution.toRdd.foreach(_ => ())
    val rows = mutable.Buffer[(Int, String, Long, Long)]()
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val outRows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      val timeMs = p.metrics.collect {
        case (k, m) if k.toLowerCase.contains("time") => m.value
      }.foldLeft(0L)(math.max) // ns/ms mixed; report the dominant counter
      rows += ((depth, p.nodeName, outRows, timeMs))
      val children = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    rows.toSeq.toDF("depth", "operator", "num_output_rows", "max_time_metric")
  }

  // ---- system tables (reference src/executor/system_table_scan.rs) -------

  def systemTable(name: String): DataFrame = {
    import spark.implicits._
    name match {
      case "pg_tables" =>
        (tables.keys.map(t => ("postgres", t, "table")) ++
          views.keys.map(v => ("postgres", v, "view"))).toSeq
          .toDF("schemaname", "tablename", "kind")
      case "pg_indexes" =>
        indexes.map { case (n, (t, c, m, o)) => (n, t, c, m, o) }.toSeq
          .toDF("indexname", "tablename", "columnname", "method", "options")
      case "pg_attribute" =>
        tables.toSeq.flatMap { case (t, (schema, pk)) =>
          schema.fields.zipWithIndex.map { case (f, i) =>
            (t, f.name, f.dataType.simpleString, i + 1, !f.nullable, pk.contains(f.name))
          }.toSeq
        }.toDF("tablename", "attname", "atttype", "attnum", "notnull", "is_pk")
      case "pg_stat" =>
        tables.keys.map { t =>
          (t, spark.table(t).count())
        }.toSeq.toDF("tablename", "n_rows")
      case "contributors" =>
        // the reference hardcodes its project's contributor logins
        // (src/executor/system_table_scan.rs:27-35); this engine does the same
        Seq("spark-graft").toDF("login")
      case other => throw new IllegalArgumentException(s"unknown system table $other")
    }
  }

  /** `\stat [table [column]]` — reference `src/db.rs:64-81`. Table level:
    * row counts; column level: count / distinct / nulls computed
    * distributed (one aggregate scan, no driver materialization).
    */
  private def stat(table: Option[String], column: Option[String]): DataFrame = {
    import spark.implicits._
    (table, column) match {
      case (None, _) => systemTable("pg_stat")
      case (Some(tn), None) => systemTable("pg_stat").where(col("tablename") === tn)
      case (Some(tn), Some(cn)) =>
        spark.table(tn).agg(
          lit(tn).as("tablename"), lit(cn).as("colname"),
          count(col(cn)).as("n_values"),
          count_distinct(col(cn)).as("n_distinct"),
          sum(when(col(cn).isNull, 1L).otherwise(0L)).as("n_nulls"))
    }
  }

  // ---- catalog manifest ---------------------------------------------------

  private def saveManifest(): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = tables.map { case (n, (schema, pk)) =>
      s"${q(n)}: {${q("ddl")}: ${q(schema.toDDL)}, ${q("pk")}: [${pk.map(q).mkString(",")}]}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$warehouse/_catalog.json"), body)
  }
}
