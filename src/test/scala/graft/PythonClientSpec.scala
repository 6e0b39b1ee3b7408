package graft

import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Drives `tools/graft.py` — the packaged Python surface mirroring the
  * reference's embedded module (reference src/python/mod.rs:14-60:
  * `open()` / `query()` → rows) — against a live server over a real
  * socket: `import graft; graft.open(port=...).query(...)` end to end.
  */
class PythonClientSpec extends AnyFunSuite {
  import TestSpark._

  test("python client: import graft, open, DDL/DML/query round trip") {
    val havePython = try {
      new ProcessBuilder("python3", "--version").start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(havePython, "python3 not on PATH")

    val dir = freshDir("/root/repo/target/graft-tmp/pyclient-warehouse")
    val engine = new Engine(spark, dir)
    val server = new ServerSocket(0)
    val acceptor = new Thread(() => Server.serve(server, engine), "graft-py-spec")
    acceptor.setDaemon(true)
    acceptor.start()
    try {
      val code =
        s"""import graft
           |db = graft.open(port=${server.getLocalPort})
           |with db:
           |    db.query("create table pyc(v int not null, s varchar)")
           |    db.query("insert into pyc values (1,'a'), (2,'b'), (3,'c')")
           |    rows = db.query("select sum(v) as s, count(*) as n from pyc")
           |    assert rows == [["6", "3"]], rows
           |    try:
           |        db.query("select nope from pyc")
           |        raise SystemExit("expected graft.Error")
           |    except graft.Error:
           |        pass  # connection must survive the error
           |    assert db.query("select max(s) as m from pyc") == [["c"]]
           |    # space-stuffed ambiguous rows round-trip losslessly
           |    assert db.query("select 'OK 1' as s") == [["OK 1"]], "unstuff"
           |print("PY OK")
           |""".stripMargin
      val pgCode =
        s"""import graft
           |db = graft.open(port=${server.getLocalPort}, wire="pg")
           |with db:
           |    rows = db.query("select 1 as i, 2.5 as d, 1 = 1 as b, 'x' as s, null as n, '' as e")
           |    assert rows == [[1, 2.5, True, 'x', None, '']], rows
           |    db.query("create table pyt(v int)")
           |    db.query("insert into pyt values (41)")
           |    assert db.query("select v + 1 from pyt") == [[42]]
           |    try:
           |        db.query("select nope")
           |        raise SystemExit("expected graft.Error")
           |    except graft.Error:
           |        pass
           |    assert db.query("select count(*) from pyt") == [[1]]
           |    ts = db.query("select timestamp'2024-01-02 03:04:05' as t, "
           |                  "timestamp_ntz'2024-01-02 03:04:05.25' as tn")
           |    assert ts == [['2024-01-02 03:04:05', '2024-01-02 03:04:05.25']], ts
           |print("PG OK")
           |""".stripMargin
      val pb = new ProcessBuilder("python3", "-c", code + pgCode)
      pb.directory(new java.io.File("/root/repo/tools"))
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(proc.waitFor() == 0, s"python client failed:\n$out")
      assert(out.contains("PY OK"), out)
    } finally server.close()
  }
}
