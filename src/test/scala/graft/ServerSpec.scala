package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Drives graft.Server through a real TCP socket — the pgwire-parity
  * smoke: CREATE / INSERT / SELECT / error / shell sugar over the wire.
  */
class ServerSpec extends AnyFunSuite {
  import TestSpark._

  test("socket client round-trips DDL, DML, query, error, and sugar") {
    val dir = "/root/repo/target/graft-tmp/server-warehouse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    val engine = new Engine(spark, dir)
    val server = new ServerSocket(0) // ephemeral port
    val acceptor = new Thread(() => Server.serve(server, engine), "graft-server-spec")
    acceptor.setDaemon(true)
    acceptor.start()

    val client = new Socket("127.0.0.1", server.getLocalPort)
    try {
      client.setSoTimeout(120000)
      val out = new PrintWriter(new java.io.OutputStreamWriter(
        client.getOutputStream, StandardCharsets.UTF_8), true)
      val in = new BufferedReader(new InputStreamReader(
        client.getInputStream, StandardCharsets.UTF_8))

      // statement → all lines up to and including the OK/ERR terminator
      def send(stmt: String): Seq[String] = {
        out.println(stmt)
        val lines = collection.mutable.Buffer[String]()
        var l = in.readLine()
        while (l != null && !l.startsWith("OK ") && !l.startsWith("ERR ")) {
          lines += l
          l = in.readLine()
        }
        lines += l
        lines.toSeq
      }

      assert(send("create table srv(v int not null, s varchar);").last == "OK 0")
      assert(send("insert into srv values (1, 'a'), (2, 'b'), (3, 'c');").last == "OK 1")
      // multi-line statement: terminator only fires on the ';' line
      out.println("select v, s from srv")
      val rows = send("where v >= 2 order by v;")
      assert(rows == Seq("2\tb", "3\tc", "OK 2"))
      // errors come back as ERR, connection stays usable
      assert(send("select nope from srv;").last.startsWith("ERR "))
      assert(send("select count(*) from srv;") == Seq("3", "OK 1"))
      // shell sugar works unterminated, like the REPL
      val dt = send("\\dt")
      assert(dt.last.startsWith("OK ") && dt.exists(_.contains("srv")))
    } finally {
      client.close()
      server.close()
    }
  }
}
