package graft

import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Drives the `pythonapi/` package — the pip-installable Python surface
  * mirroring the reference's embedded module (reference
  * src/python/mod.rs:14-60: `open()` / `query()` → rows) — against a live
  * server over a real socket. The package is INSTALLED first
  * (`pip install ./pythonapi` into a scratch target) and its own test
  * file runs from the installed copy, so the packaging metadata is under
  * test, not just the module source.
  */
class PythonClientSpec extends AnyFunSuite {
  import TestSpark._

  private def run(cmd: Seq[String], cwd: String,
      env: Map[String, String] = Map.empty): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(cwd))
    pb.redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    (proc.waitFor(), out)
  }

  test("pip-installed python client: packaged tests round-trip both wires") {
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
      // `pip install ./pythonapi` into a scratch --target. This offline
      // environment lacks the `wheel` package setuptools' bdist_wheel
      // needs, but a pure-python wheel archive is zipimportable straight
      // off PYTHONPATH — python's own test data ships one; an online
      // environment needs no such crutch.
      val target = freshDir("/root/repo/target/graft-tmp/pyclient-install")
      val wheelWhl = new java.io.File(
        "/root/.pyenv/versions/3.12.1/lib/python3.12/test/wheel-0.40.0-py3-none-any.whl")
      val baseCmd = Seq("python3", "-m", "pip", "install", "--quiet",
        "--no-build-isolation", "--no-index", "--target", target, "./pythonapi")
      val (code0, out0) = run(baseCmd, "/root/repo")
      val installed =
        if (code0 == 0) true
        else if (wheelWhl.exists) {
          val (code1, out1) = run(baseCmd, "/root/repo",
            Map("PYTHONPATH" -> wheelWhl.getAbsolutePath))
          assert(code1 == 0, s"pip install failed:\n$out0\n$out1")
          true
        } else false
      // point python at the installed copy (or, if pip itself is absent,
      // the source tree — weaker, noted) and run the PACKAGE's tests
      val pythonPath = if (installed) target else "/root/repo/pythonapi"
      val (code, out) = run(
        Seq("python3", "pythonapi/tests/test_client.py"), "/root/repo",
        Map("PYTHONPATH" -> pythonPath,
          "GRAFT_PORT" -> server.getLocalPort.toString))
      assert(code == 0, s"python client tests failed (from $pythonPath):\n$out")
      assert(out.contains("PY OK") && out.contains("PG OK") &&
        out.contains("CURSOR OK") && out.contains("COPY OK"), out)
      // the PEP 249 layer: pyformat binding over wire parameters, named
      // portals (several cursors mid-stream on one connection), the
      // exception lattice, and — when pandas is present in the test
      // environment — pandas.read_sql working unchanged against it
      val (dcode, dout) = run(
        Seq("python3", "pythonapi/tests/test_dbapi.py"), "/root/repo",
        Map("PYTHONPATH" -> pythonPath,
          "GRAFT_PORT" -> server.getLocalPort.toString))
      assert(dcode == 0, s"dbapi tests failed (from $pythonPath):\n$dout")
      assert(dout.contains("DBAPI OK"), dout)
      assert(installed, "pip unavailable: ran from source tree, not an installed copy")
    } finally server.close()
  }
}
