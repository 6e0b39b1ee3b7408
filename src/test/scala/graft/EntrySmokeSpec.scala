package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import java.nio.file.{Files, Paths}

/** Drives the runnable entry point (graft.Main) end-to-end: batch `.sql`
  * and `.slt` scripts through `main`/`runFile`, and the interactive loop
  * through a scripted stdin.
  */
class EntrySmokeSpec extends AnyFunSuite {
  import TestSpark._

  private def write(path: String, content: String): String = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
    path
  }

  test("testdata physical types normalize to the kernel-expected schema") {
    // The driver regenerates /root/testdata between rounds and has changed
    // physical types before (events.ts: timestamp[ns]-as-long → NTZ µs,
    // round 8 — seven operators died at analysis). This canary fails FIRST
    // and names the drifted column, so the next drift costs one test read,
    // not a round.
    import org.apache.spark.sql.types._
    for (sfDir <- Seq(sf, "/root/testdata/sf0.01")) {
      val ev = Tables.df(spark, sfDir, "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"events.ts normalized to ${ev.schema("ts").dataType} in $sfDir — " +
          "add an arm to Tables.events for the new physical type")
      val em = Tables.df(spark, sfDir, "embeddings")
      assert(em.schema("embedding").dataType == ArrayType(FloatType, true) ||
        em.schema("embedding").dataType == ArrayType(FloatType, false),
        s"embeddings.embedding normalized to ${em.schema("embedding").dataType}" +
          s" in $sfDir — extend Tables.embeddings")
      val li = Tables.df(spark, sfDir, "lineitem")
      assert(Seq(TimestampType, TimestampNTZType)
        .contains(li.schema("l_shipdate").dataType),
        s"lineitem.l_shipdate is ${li.schema("l_shipdate").dataType} in $sfDir")
      // key/measure physical types the fixed-point oracles assume
      assert(ev.schema("value").dataType == DoubleType,
        s"events.value is ${ev.schema("value").dataType} in $sfDir")
      val docs = Tables.df(spark, sfDir, "documents")
      assert(docs.schema("doc_id").dataType == LongType,
        s"documents.doc_id is ${docs.schema("doc_id").dataType} in $sfDir")
      assert(em.schema("vec_id").dataType == LongType,
        s"embeddings.vec_id is ${em.schema("vec_id").dataType} in $sfDir")
    }
  }

  test("entry returns rows under ANSI-default session settings") {
    // the driver calls SparkEntry.entry with ITS OWN session (Spark 4
    // defaults: ANSI on, no legacy parquet confs) — emulate that here
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(SparkEntry.entry(spark).count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("main -f runs a .sql script end-to-end") {
    val script = write("target/graft-tmp/entry/smoke.sql",
      """create table esm(a int, b varchar(10));
        |insert into esm values (1, 'x'), (2, 'y');
        |select a, b from esm order by a;
        |drop table esm;
        |""".stripMargin)
    // main() reuses the active test session (and must not stop it)
    Main.main(Array("-f", script, "-w", "target/graft-tmp/entry/wh1"))
    assert(spark.sparkContext.isStopped === false)
  }

  test("runFile executes a .slt script and reports failures") {
    val good = write("target/graft-tmp/entry/smoke.slt",
      """statement ok
        |create table esl(a int)
        |
        |statement ok
        |insert into esl values (3), (1)
        |
        |query I
        |select a from esl order by a
        |----
        |1
        |3
        |
        |statement error
        |select nope from esl
        |
        |statement ok
        |drop table esl
        |""".stripMargin)
    val out = scala.collection.mutable.Buffer[String]()
    val engine = new Engine(spark, "target/graft-tmp/entry/wh2")
    assert(Main.runFile(engine, good, out.append(_)) === 0)
    assert(out.exists(_.contains("all green")))

    val bad = write("target/graft-tmp/entry/bad.slt",
      """query I
        |select 41
        |----
        |42
        |""".stripMargin)
    assert(Main.runFile(engine, bad, _ => ()) === 1)
  }

  test("interactive repl loop executes statements from scripted stdin") {
    val engine = new Engine(spark, "target/graft-tmp/entry/wh3")
    val in = Iterator(
      "create table ert(a int);",
      "insert into ert values (7);",
      "select a + 1 from ert;",
      "drop table ert;",
      """\q""")
    val out = scala.collection.mutable.Buffer[String]()
    Main.repl(engine, () => if (in.hasNext) in.next() else null, out.append(_))
    assert(out.exists(_.trim == "8"))
  }
}
