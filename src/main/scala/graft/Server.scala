package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** Network serving entry point — the analogue of the reference's pgwire
  * server (`/root/reference/src/server/mod.rs:17-46`: bind a TCP port,
  * accept clients, run each statement through the shared database, stream
  * rows back). Spark's production network front ends are the Thrift JDBC
  * server and Spark Connect (COVERAGE.md); this is the in-repo runnable
  * parity piece: any socket client (`nc localhost 5433`) gets a full
  * statement surface — DDL, DML, queries, `\`-sugar — against one shared
  * engine, like the reference's shared `Database` behind pgwire.
  *
  * Line protocol (one session per connection):
  *   client → statements terminated by `;` (may span lines), or a single
  *            `\`-prefixed shell-sugar line; `\q` closes the session.
  *   server → one line per result row, fields tab-separated, rendered
  *            with the REPL/slt formatter; then a terminator line
  *            `OK <n>` (row count) or `ERR <message>`.
  *
  * Concurrency: connections are served on daemon threads; statement
  * execution is serialized on the engine (Spark itself is multi-session
  * safe, but the engine's catalog swap operations — DELETE/UPDATE's
  * temp-dir move — assume one writer at a time). Scale path: run many
  * read sessions against one driver exactly as the Thrift server does;
  * the per-statement work is still fully distributed Spark jobs.
  *
  * Usage: `sbt "runMain graft.Server"` — env `GRAFT_PORT` (default 5433),
  * `GRAFT_WAREHOUSE`, `SPARK_GRAFT_CPUS`.
  */
object Server {

  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_PORT", "5433").toInt
    val warehouse = sys.env.getOrElse("GRAFT_WAREHOUSE",
      "target/graft-server/warehouse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, warehouse)
    val socket = new ServerSocket(port)
    println(s"graft server listening on port ${socket.getLocalPort}")
    serve(socket, engine)
  }

  /** Accept loop — blocks until the server socket is closed. Exposed so
    * ServerSpec can run it on an ephemeral port and shut it down.
    */
  def serve(socket: ServerSocket, engine: Engine): Unit = {
    try {
      while (!socket.isClosed) {
        val client = socket.accept()
        val t = new Thread(() => handle(client, engine),
          s"graft-client-${client.getPort}")
        t.setDaemon(true)
        t.start()
      }
    } catch {
      case _: java.net.SocketException => () // closed → clean shutdown
    }
  }

  private def handle(client: Socket, engine: Engine): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(client.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(client.getOutputStream, StandardCharsets.UTF_8), true)
    try {
      val buf = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        val trimmed = line.trim
        if (buf.isEmpty && trimmed == "\\q") return
        if (buf.isEmpty && trimmed.startsWith("\\")) execute(engine, trimmed, out)
        else {
          buf.append(line).append('\n')
          // quote-blind ';' scan is fine here: the terminator must END the
          // line, and a statement whose final line ends inside a string
          // literal is malformed anyway
          if (trimmed.endsWith(";")) {
            val stmt = buf.toString.trim.stripSuffix(";")
            buf.clear()
            if (stmt.nonEmpty) execute(engine, stmt, out)
          }
        }
        line = in.readLine()
      }
    } finally {
      out.flush()
      client.close()
    }
  }

  private def execute(engine: Engine, sql: String, out: PrintWriter): Unit = {
    try {
      // one writer at a time: catalog map updates and the DELETE/UPDATE
      // temp-dir swaps are engine-level critical sections
      val rows = engine.synchronized {
        engine.run(sql).collect()
      }
      rows.foreach { r =>
        out.println((0 until r.length).map(i => Main.fmt(r.get(i))).mkString("\t"))
      }
      out.println(s"OK ${rows.length}")
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        out.println(s"ERR ${msg.linesIterator.next()}")
    }
  }
}
