package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine

/** Transaction isolation semantics (r15): REPEATABLE READ / SERIALIZABLE
  * snapshot reads over the version log, serialization failures on
  * write-after-foreign-commit, READ ONLY enforcement, SET TRANSACTION
  * modes, and the VACUUM read-pin floor — all driven through two engine
  * Sessions the way two pgwire connections would (pg behavior notes per
  * test; the reference's per-txn snapshot intent is
  * /root/reference/src/storage/secondary/transaction.rs:26-50).
  */
class TxnIsolationSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = {
    val dir = "/root/repo/target/graft-tmp/txniso-warehouse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    new Engine(spark, dir)
  }

  private def count(s: graft.engine.Session, t: String): Long =
    engine.run(s"select count(*) c from $t", s).collect()(0).getLong(0)

  test("repeatable read pins the first-read version; commit releases it") {
    engine.run("create table iso1(v int)")
    engine.run("insert into iso1 values (1), (2)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso1") == 2) // pins iso1 at its current version
      engine.run("insert into iso1 values (3)", b) // autocommit foreign write
      assert(count(b, "iso1") == 3, "writer sees its own committed row")
      assert(count(a, "iso1") == 2, "snapshot read must not see the foreign commit")
      // joins and subqueries read the same snapshot
      val sub = engine.run(
        "select (select max(v) from iso1) m", a).collect()(0).getInt(0)
      assert(sub == 2)
      engine.run("commit", a)
      assert(count(a, "iso1") == 3, "after COMMIT the pin is gone")
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("read committed (default) sees foreign commits statement-by-statement") {
    engine.run("create table iso2(v int)")
    engine.run("insert into iso2 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin", a)
      assert(count(a, "iso2") == 1)
      engine.run("insert into iso2 values (2)", b)
      assert(count(a, "iso2") == 2, "READ COMMITTED reads last-committed")
      engine.run("commit", a)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("a repeatable-read transaction sees its own writes") {
    engine.run("create table iso3(v int)")
    engine.run("insert into iso3 values (1)")
    val a = engine.newSession()
    try {
      engine.run("begin isolation level serializable", a)
      assert(count(a, "iso3") == 1) // pin
      engine.run("insert into iso3 values (2)", a)
      assert(count(a, "iso3") == 2, "own write visible inside the snapshot txn")
      engine.run("rollback", a)
      assert(count(a, "iso3") == 1)
    } finally engine.closeSession(a)
  }

  test("write after a foreign commit past the pin is a serialization failure") {
    engine.run("create table iso4(v int)")
    engine.run("insert into iso4 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso4") == 1) // pin
      engine.run("insert into iso4 values (2)", b) // foreign commit moves iso4
      val e = intercept[IllegalArgumentException] {
        engine.run("update iso4 set v = 9 where v = 1", a)
      }
      assert(e.getMessage.contains("could not serialize access"), e.getMessage)
      // pg: the failed statement aborts the block
      val e2 = intercept[IllegalArgumentException](count(a, "iso4"))
      assert(e2.getMessage.contains("current transaction is aborted"))
      engine.run("rollback", a)
      assert(count(a, "iso4") == 2, "B's row survives; A never wrote")
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("INSERT ... SELECT source reads the snapshot") {
    engine.run("create table iso5(v int)")
    engine.run("create table iso5_out(v int)")
    engine.run("insert into iso5 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso5") == 1) // pin iso5
      engine.run("insert into iso5 values (2)", b)
      engine.run("insert into iso5_out select v from iso5", a)
      engine.run("commit", a)
      assert(count(a, "iso5_out") == 1,
        "the DML source must read the pinned snapshot, not last-committed")
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("read only refuses writes and DDL, allows reads; commit clears it") {
    engine.run("create table iso6(v int)")
    engine.run("insert into iso6 values (1)")
    val a = engine.newSession()
    try {
      engine.run("begin read only", a)
      assert(count(a, "iso6") == 1)
      val e = intercept[IllegalArgumentException](
        engine.run("insert into iso6 values (2)", a))
      assert(e.getMessage.contains("read-only transaction"), e.getMessage)
      engine.run("rollback", a)
      val e2 = intercept[IllegalArgumentException] {
        engine.run("begin read only", a)
        engine.run("create table iso6_t(v int)", a)
      }
      assert(e2.getMessage.contains("read-only transaction"), e2.getMessage)
      engine.run("rollback", a)
      engine.run("insert into iso6 values (2)", a) // autocommit is writable
      assert(count(a, "iso6") == 2)
    } finally engine.closeSession(a)
  }

  test("SET TRANSACTION applies modes before the first query, then refuses") {
    engine.run("create table iso7(v int)")
    engine.run("insert into iso7 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin", a)
      engine.run("set transaction isolation level repeatable read", a)
      assert(count(a, "iso7") == 1) // pins under the upgraded level
      engine.run("insert into iso7 values (2)", b)
      assert(count(a, "iso7") == 1, "upgraded block reads its snapshot")
      // a later isolation change must be refused (the block pinned reads)
      val e = intercept[IllegalArgumentException](
        engine.run("set transaction isolation level read committed", a))
      assert(e.getMessage.contains("before any query"), e.getMessage)
      engine.run("commit", a)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("SET SESSION CHARACTERISTICS makes bare BEGIN snapshot-isolated") {
    engine.run("create table iso8(v int)")
    engine.run("insert into iso8 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run(
        "set session characteristics as transaction isolation level repeatable read", a)
      engine.run("begin", a)
      assert(count(a, "iso8") == 1)
      engine.run("insert into iso8 values (2)", b)
      assert(count(a, "iso8") == 1, "session default upgraded the bare BEGIN")
      engine.run("commit", a)
      // an explicit mode on BEGIN still wins over the session default
      engine.run("begin isolation level read committed", a)
      assert(count(a, "iso8") == 2)
      engine.run("insert into iso8 values (3)", b)
      assert(count(a, "iso8") == 3)
      engine.run("commit", a)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("VACUUM cannot reclaim a version a foreign read pin still needs") {
    engine.run("create table iso9(v int)")
    engine.run("insert into iso9 values (1)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso9") == 1) // pin at the current version
      engine.run("insert into iso9 values (2)", b)
      engine.run("insert into iso9 values (3)", b)
      engine.run("vacuum iso9 retain 0 versions", b)
      // the pinned snapshot must still resolve — not "has been vacuumed"
      assert(count(a, "iso9") == 1)
      engine.run("commit", a)
      assert(count(a, "iso9") == 3)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("MERGE source reads the snapshot; target drift is a serialization failure") {
    engine.run("create table iso11_t(k int, v int)")
    engine.run("create table iso11_s(k int, v int)")
    engine.run("insert into iso11_t values (1, 10)")
    engine.run("insert into iso11_s values (1, 11), (2, 22)")
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso11_s") == 2) // pin the source
      engine.run("insert into iso11_s values (3, 33)", b) // foreign commit
      engine.run(
        """merge into iso11_t using iso11_s on iso11_t.k = iso11_s.k
          |when matched then update set v = iso11_s.v
          |when not matched then insert values (iso11_s.k, iso11_s.v)""".stripMargin, a)
      engine.run("commit", a)
      // row (3, 33) must NOT have merged: the source read the snapshot
      val rows = engine.run("select k, v from iso11_t order by k", a).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows == Seq((1, 11), (2, 22)), rows)
      // and a TARGET moved past the txn's pin refuses the merge
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso11_t") == 2) // pin the target
      engine.run("insert into iso11_t values (9, 90)", b)
      val e = intercept[IllegalArgumentException](engine.run(
        """merge into iso11_t using iso11_s on iso11_t.k = iso11_s.k
          |when matched then update set v = 0""".stripMargin, a))
      assert(e.getMessage.contains("could not serialize access"), e.getMessage)
      engine.run("rollback", a)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }

  test("time travel inside a snapshot txn still reads the asked-for version") {
    engine.run("create table iso10(v int)")
    engine.run("insert into iso10 values (1)") // v1
    engine.run("insert into iso10 values (2)") // v2
    val a = engine.newSession(); val b = engine.newSession()
    try {
      engine.run("begin isolation level repeatable read", a)
      assert(count(a, "iso10") == 2) // pin at v2
      engine.run("insert into iso10 values (3)", b) // v3
      // explicit VERSION AS OF beats the pin (pg has no such clause;
      // delta semantics: the user asked for a specific version)
      val v1 = engine.run(
        "select count(*) c from iso10 version as of 1", a).collect()(0).getLong(0)
      assert(v1 == 1)
      assert(count(a, "iso10") == 2)
      engine.run("commit", a)
    } finally { engine.closeSession(a); engine.closeSession(b) }
  }
}
