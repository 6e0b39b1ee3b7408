package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Per-session GUC semantics at the ENGINE level (r16): one session's
  * pragma toggles and SET overlay must not re-plan or re-render another
  * session's statements (pg GUC scoping). The wire-level twin lives in
  * ServerSpec ("per-session TimeZone", "SHOW gucs").
  */
class SessionGucSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = {
    val dir = "/root/repo/target/graft-tmp/sessguc-warehouse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    new Engine(spark, dir)
  }

  test("pragma disable_vector_index is session-scoped") {
    engine.run("create table vgx (a vector(2) not null, b varchar(10) not null)")
    engine.run("insert into vgx values ('[0, 0]', 'p0'), ('[10, 10]', 'p1'), " +
      "('[20, 20]', 'p2'), ('[30, 30]', 'p3')")
    engine.run("CREATE INDEX vgx_hnsw ON vgx USING hnsw (a) " +
      "WITH (nlists = 4, nprobe = 1)")
    val q = "select b from vgx order by a <-> '[1, 1]'::VECTOR(2) limit 3"
    val a = engine.newSession()
    val b = engine.newSession()
    // both start on the approximate index tier: nprobe=1 ranks one cell
    assert(engine.run(q, a).collect().length == 1)
    assert(engine.run(q, b).collect().length == 1)
    // A disables; A gets the exact scan, B keeps the index tier
    engine.run("pragma disable_vector_index", a)
    assert(engine.run(q, a).collect().length == 3, "A should scan exactly")
    assert(engine.run(q, b).collect().length == 1,
      "A's pragma re-planned B's query — GUC leaked across sessions")
    // DISCARD ALL restores A's default
    engine.run("discard all", a)
    assert(engine.run(q, a).collect().length == 1)
  }

  test("current_setting() substitutes the session value; SHOW ALL lists GUCs") {
    val a = engine.newSession()
    engine.run("SET TimeZone = 'Asia/Tokyo'", a)
    val r = engine.run(
      "select current_setting('TimeZone') as tz, " +
        "current_setting('server_version_num') as vn", a).collect()(0)
    assert(r.getString(0) == "Asia/Tokyo" && r.getString(1) == "150000")
    // missing_ok=true → NULL; without it → pg's error
    assert(engine.run("select current_setting('no_such_guc', true) as v", a)
      .collect()(0).isNullAt(0))
    val ex = intercept[Exception] {
      engine.run("select current_setting('no_such_guc') as v", a).collect()
    }
    assert(ex.getMessage.contains("unrecognized configuration parameter"))
    // payload text inside a literal is NOT substituted
    assert(engine.run("select 'current_setting(''x'')' as s", a)
      .collect()(0).getString(0) == "current_setting('x')")
    // version() answers the pg-shaped banner (psql \conninfo probes it),
    // including SQLAlchemy's pg_catalog-qualified form
    assert(engine.run("select version() as v", a)
      .collect()(0).getString(0).startsWith("PostgreSQL 15.0"))
    assert(engine.run("select pg_catalog.version() as v", a)
      .collect()(0).getString(0).startsWith("PostgreSQL 15.0"))
    assert(engine.run("select 'version()' as s", a)
      .collect()(0).getString(0) == "version()")
    // ... and both substitute inside DML sources, not just top-level
    // SELECTs (the r16 review catch: alignedSource skipped the rewrite)
    engine.run("create table gucaud(who varchar, ver varchar)", a)
    engine.run("SET application_name = 'etl-job'", a)
    engine.run("insert into gucaud select current_setting('application_name'), " +
      "version()", a)
    val aud = engine.run("select who, ver from gucaud", a).collect()(0)
    assert(aud.getString(0) == "etl-job" && aud.getString(1).startsWith("PostgreSQL"))
    // DateStyle normalizes to pg's canonical form (pgJDBC kills the
    // connection on a reported style not starting with uppercase ISO)
    engine.run("SET datestyle = 'iso, dmy'", a)
    assert(engine.run("show datestyle", a).collect()(0).getString(0) == "ISO, DMY")
    val dsEx = intercept[Exception] {
      engine.run("SET datestyle = 'German'", a)
    }
    assert(dsEx.getMessage.contains("ISO"), dsEx.getMessage)
    // SET 'ISO' alone preserves the session's order component (pg)
    assert(engine.run("show datestyle", a).collect()(0).getString(0) == "ISO, DMY")
    engine.run("SET datestyle = 'ISO'", a)
    assert(engine.run("show datestyle", a).collect()(0).getString(0) == "ISO, DMY")
    // SET ... TO DEFAULT is pg's RESET spelling
    engine.run("SET datestyle TO DEFAULT", a)
    assert(engine.run("show datestyle", a).collect()(0).getString(0) == "ISO, MDY")
    engine.run("RESET datestyle", a)
    // a user-defined version() shadows the builtin banner
    engine.run(
      "create function version() returns varchar language sql return 'graft-custom'", a)
    assert(engine.run("select version() as v", a)
      .collect()(0).getString(0) == "graft-custom")
    engine.run("drop function version", a)
    // SHOW ALL carries (name, setting) incl. this session's overlay
    val all = engine.run("show all", a).collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    assert(all("timezone") == "Asia/Tokyo")
    assert(all.contains("transaction_isolation"))
    // pg_settings is the same data as a queryable system table
    val ps = engine.run(
      "select setting, source from pg_settings where name = 'timezone'", a)
      .collect()(0)
    assert(ps.getString(0) == "Asia/Tokyo" && ps.getString(1) == "session")
    // the per-statement rename is quote-aware: the literal survives, and
    // a predicate comparing against it still matches
    val lit = engine.run(
      "select 'pg_settings' as src, count(*) as n from pg_settings", a)
      .collect()(0)
    assert(lit.getString(0) == "pg_settings" && lit.getLong(1) > 0)
    // pg_catalog-qualified form resolves too (psql internals qualify)
    assert(engine.run(
      "select count(*) as n from pg_catalog.pg_settings", a)
      .collect()(0).getLong(0) > 0)
    // concurrent statements on ONE session must not drop each other's
    // snapshot mid-analysis (per-statement view names)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      try (1 to 5).foreach { _ =>
        assert(engine.run("select count(*) from pg_settings", a)
          .collect()(0).getLong(0) > 0)
      } catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent pg_settings reads failed: ${errs.peek()}")
  }

  test("SET overlay and SHOW are per session; RESET ALL clears only the caller") {
    val a = engine.newSession()
    val b = engine.newSession()
    engine.run("SET TimeZone = 'Asia/Tokyo'", a)
    assert(engine.run("show timezone", a).collect()(0).getString(0) == "Asia/Tokyo")
    assert(engine.run("show timezone", b).collect()(0).getString(0) == "UTC")
    engine.run("SET datestyle TO 'ISO, YMD'", b)
    assert(engine.run("show datestyle", b).collect()(0).getString(0) == "ISO, YMD")
    assert(engine.run("show datestyle", a).collect()(0).getString(0) == "ISO, MDY")
    engine.run("RESET ALL", a)
    assert(engine.run("show timezone", a).collect()(0).getString(0) == "UTC")
    assert(engine.run("show datestyle", b).collect()(0).getString(0) == "ISO, YMD")
  }

  test("custom GUCs are session-local; RESET ALL clears only the caller's") {
    val a = engine.newSession()
    val b = engine.newSession()
    engine.run("set myapp.tag = 'A'", a)
    engine.run("set myapp.tag = 'B'", b)
    // pg custom-GUC semantics: each session reads its own value...
    assert(engine.run("show myapp.tag", a).collect()(0).getString(0) == "A")
    assert(engine.run("show myapp.tag", b).collect()(0).getString(0) == "B")
    // ...and none leaks into the engine-global Spark conf
    assert(spark.conf.getOption("myapp.tag").isEmpty,
      "a session custom GUC leaked into the shared Spark conf")
    engine.run("reset all", a)
    intercept[Exception] {
      engine.run("show myapp.tag", a).collect()
    }
    assert(engine.run("show myapp.tag", b).collect()(0).getString(0) == "B",
      "RESET ALL in session A cleared session B's custom GUC")
    // DISCARD ALL (pool recycle) embeds the same session-scoped reset
    engine.run("discard all", b)
    intercept[Exception] {
      engine.run("show myapp.tag", b).collect()
    }
  }

  test("Spark execution confs refuse per-session SET; embedded stays the DBA surface") {
    val a = engine.newSession()
    val ex = intercept[IllegalArgumentException] {
      engine.run("set spark.sql.shuffle.partitions = 7", a)
    }
    assert(ex.getMessage.contains("engine-global"), ex.getMessage)
    // a remote RESET of a spark key it never set must not undo the
    // engine-global value
    engine.run("set spark.graft.test_global = 'keep'") // embedded default
    engine.run("reset spark.graft.test_global", a)     // remote no-op
    assert(spark.conf.getOption("spark.graft.test_global").contains("keep"),
      "a remote RESET unset an engine-global conf it never owned")
    // the embedded session's own RESET ALL does clean it up
    engine.run("reset all")
    assert(spark.conf.getOption("spark.graft.test_global").isEmpty)
  }

  test("SHOW / current_setting refuse engine-global Spark confs this session never set") {
    val a = engine.newSession()
    // spark.master is always present in the engine-global conf — it must
    // NOT leak through SHOW or current_setting to a pgwire client
    intercept[Exception] {
      engine.run("show spark.master", a).collect()
    }
    intercept[Exception] {
      engine.run("select current_setting('spark.master') as v", a).collect()
    }
    // the missing_ok form answers NULL instead of erroring
    assert(engine.run("select current_setting('spark.master', true) as v", a)
      .collect()(0).isNullAt(0))
    // a key THIS session set still answers (from its own overlay)
    engine.run("set graft.test.show_own = 'x'", a)
    assert(engine.run("show graft.test.show_own", a)
      .collect()(0).getString(0) == "x")
    engine.run("reset all", a)
  }

  test("SET value unquoting collapses the '' escape; backslashes stay raw") {
    val a = engine.newSession()
    engine.run("set application_name = 'it''s me'", a)
    assert(engine.run("show application_name", a)
      .collect()(0).getString(0) == "it's me")
    engine.run("set myapp.path = 'C:\\temp'", a)
    assert(engine.run("show myapp.path", a)
      .collect()(0).getString(0) == "C:\\temp")
    // and the value substitutes back through current_setting() in Spark
    // literal syntax (conformLiterals ran before the substitution)
    assert(engine.run("select current_setting('myapp.path') as v", a)
      .collect()(0).getString(0) == "C:\\temp")
    engine.run("reset all", a)
  }

  test("double-quoted literals survive the pg_settings rewrite") {
    val a = engine.newSession()
    // Spark's default dialect reads "pg_settings" as a STRING LITERAL;
    // the per-statement view rename must leave it alone or the
    // comparison silently turns false
    val n = engine.run(
      "select count(*) as n from pg_settings where 'pg_settings' = \"pg_settings\"", a)
      .collect()(0).getLong(0)
    assert(n > 0, "the double-quoted literal was rewritten to the temp view name")
  }
}
