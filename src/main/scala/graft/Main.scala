package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Engine, SqlText}

/** Interactive shell + batch runner — the analogue of the reference's
  * REPL binary (`/root/reference/src/main.rs`): an interactive prompt over
  * `Engine.run`, plus `-f file.sql|file.slt` batch mode. The pgwire
  * server role is covered by Spark's Thrift JDBC server (see COVERAGE.md);
  * the Python API role by PySpark over the same session.
  *
  * Usage:
  *   runMain graft.Main [-w warehouseDir] [-f script.(sql|slt)]
  *
  * Without `-f`, reads statements from stdin (terminated by `;`, or a
  * single `\`-prefixed shell-sugar line) until EOF / `\q` / `exit`.
  */
object Main {

  /** sqllogictest-style value rendering, shared with the slt test runner. */
  def fmt(v: Any): String = v match {
    case null => "NULL"
    case "" => "(empty)"
    case d: java.lang.Double =>
      if (d == d.longValue().toDouble) d.longValue().toString else d.toString
    case b: java.lang.Boolean => if (b) "true" else "false"
    case bd: java.math.BigDecimal =>
      val stripped = bd.stripTrailingZeros()
      if (stripped.scale() <= 0) stripped.toBigInteger.toString
      else stripped.toPlainString
    case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
    // BinaryType collects as Array[Byte], whose toString is the JVM
    // object identity ("[B@1a2b3c") — render pg bytea hex instead
    case b: Array[Byte] => "\\x" + b.map("%02x".format(_)).mkString
    case other => other.toString
  }

  private def renderRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => fmt(r.get(i))).mkString(" "))

  /** Execute one statement, print rows + timing (reference main.rs
    * `run_query_in_background` output shape). Rows PRINT as partitions
    * materialize (`toLocalIterator`) — a `SELECT *` over a huge table
    * streams through the shell in bounded driver memory, same stance as
    * the server's result delivery; slt comparisons use [[renderRows]]
    * (they need the materialized list anyway).
    */
  private def execute(engine: Engine, sql: String, out: String => Unit): Boolean = {
    val t0 = System.nanoTime()
    try {
      import scala.jdk.CollectionConverters._
      var n = 0L
      engine.run(sql).toLocalIterator().asScala.foreach { r =>
        out((0 until r.length).map(i => fmt(r.get(i))).mkString(" "))
        n += 1
      }
      out(f"($n rows in ${(System.nanoTime() - t0) / 1e6}%.1f ms)")
      true
    } catch {
      case e: Exception =>
        out(s"error: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        false
    }
  }

  /** Run a `.sql` (semicolon-separated statements) or `.slt`
    * (sqllogictest directives) script. Returns the number of failures so
    * tests and shells can gate on it.
    */
  def runFile(engine: Engine, path: String, out: String => Unit = println): Int = {
    val lines = {
      val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
      try src.getLines().toVector finally src.close()
    }
    if (path.endsWith(".slt")) runSlt(engine, lines, out)
    else {
      // .sql: strip comments, split on top-level semicolons
      var failures = 0
      lines.filterNot(_.trim.startsWith("--")).mkString("\n")
        .split(";").map(_.trim).filter(_.nonEmpty)
        .foreach { stmt => if (!execute(engine, stmt, out)) failures += 1 }
      failures
    }
  }

  private def runSlt(engine: Engine, lines: Vector[String], out: String => Unit): Int = {
    var i = 0
    var failures = 0
    def fail(msg: String): Unit = { failures += 1; out(s"FAIL: $msg") }
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) i += 1
      else if (line.startsWith("statement")) {
        val expectError = line.contains("error")
        var j = i + 1
        val sql = new StringBuilder
        while (j < lines.length && lines(j).trim.nonEmpty) {
          sql.append(lines(j)).append("\n"); j += 1
        }
        val ok =
          try { engine.run(sql.toString).collect(); true }
          catch { case _: Exception => false }
        if (ok == expectError)
          fail(s"statement ${if (expectError) "did not error" else "errored"}: $sql")
        i = j
      } else if (line.startsWith("query")) {
        var j = i + 1
        val sql = new StringBuilder
        while (j < lines.length && lines(j).trim != "----") {
          sql.append(lines(j)).append("\n"); j += 1
        }
        j += 1
        val expected = scala.collection.mutable.Buffer[String]()
        while (j < lines.length && lines(j).trim.nonEmpty) {
          expected += lines(j).trim.replaceAll("\\s+", " "); j += 1
        }
        try {
          val got = renderRows(engine.run(sql.toString))
          val ordered = sql.toString.toLowerCase.contains("order by")
          val matches =
            if (ordered) got == expected.toSeq
            else got.sorted == expected.toSeq.sorted
          if (!matches) fail(s"query mismatch: $sql got=$got want=$expected")
        } catch { case e: Exception => fail(s"query errored: $sql — ${e.getMessage}") }
        i = j
      } else i += 1
    }
    out(s"slt: ${if (failures == 0) "all green" else s"$failures failure(s)"}")
    failures
  }

  /** Interactive loop: accumulate until `;` (or a `\`-sugar line), run,
    * print. EOF, `\q`, `exit`, `quit` end the session.
    */
  def repl(engine: Engine, in: () => String, out: String => Unit,
      prompt: String => Unit = print): Unit = {
    val buf = new StringBuilder
    var done = false
    while (!done) {
      prompt(if (buf.isEmpty) "graft> " else "    -> ")
      val line = in()
      if (line == null) done = true
      else {
        val t = line.trim
        if (buf.isEmpty && (t == """\q""" || t.equalsIgnoreCase("exit") ||
            t.equalsIgnoreCase("quit"))) done = true
        else if (buf.isEmpty && t.startsWith("\\")) execute(engine, t, out)
        else {
          buf.append(line).append("\n")
          // shared-lexer dispatch (r18, same as the server line protocol):
          // a ';' inside a block comment or $tag$ body keeps buffering
          val (stmts, rest) = SqlText.splitWithRemainder(buf.toString)
          // always re-seed from the remainder: a lone ';' line must
          // clear the buffer or \commands/exit stay disabled (see the
          // server line protocol, same contract)
          buf.clear()
          if (rest.trim.nonEmpty) buf.append(rest)
          stmts.foreach(s => execute(engine, s, out))
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var warehouse = "target/graft-tmp/repl-warehouse"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-f" | "--file" => file = Some(args(i + 1)); i += 2
        case "-w" | "--warehouse" => warehouse = args(i + 1); i += 2
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    val preExisting = SparkSession.getActiveSession.isDefined
    val spark = Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, warehouse)
    val failures = file match {
      case Some(f) => runFile(engine, f)
      case None =>
        println("graft shell — SQL statements end with ';', \\q quits")
        repl(engine, () => scala.io.StdIn.readLine(), println)
        0
    }
    if (!preExisting) spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
