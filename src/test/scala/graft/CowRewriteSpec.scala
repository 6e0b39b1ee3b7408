package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.BasicFileAttributes

/** File-granular copy-on-write DML: a selective DELETE/UPDATE rewrites
  * only the files that can contain matching rows and HARD-LINKS the rest
  * into the new version — O(matched files) I/O, not O(table). These
  * tests pin the physical contract (inode identity of untouched files)
  * on top of the value-level results the slt suite already covers.
  */
class CowRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private val whDir = "/root/repo/target/graft-tmp/cow-warehouse"

  private lazy val engine = {
    val p = Paths.get(whDir)
    if (Files.exists(p)) {
      Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    new Engine(spark, whDir)
  }

  private def dataFiles(table: String): Map[String, Object] = {
    val dir = Paths.get(s"$whDir/$table")
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          Files.readAttributes(p, classOf[BasicFileAttributes]).fileKey())
        .toMap
    } finally s.close()
  }

  test("selective DELETE rewrites only matching files; others keep their inode") {
    engine.run("create table cowt(v int)")
    // three separate inserts: three disjoint file families with disjoint
    // min/max footers, so the predicate prunes to one family
    engine.run("insert into cowt select cast(id as int) from range(0, 1000)")
    engine.run("insert into cowt select cast(id as int) from range(1000, 2000)")
    engine.run("insert into cowt select cast(id as int) from range(2000, 3000)")
    val before = dataFiles("cowt")
    assert(before.size >= 3, s"expected multi-file table, got ${before.size}")
    val affected = engine.run("delete from cowt where v = 1500")
      .collect()(0).getLong(0)
    assert(affected == 1L)
    val after = dataFiles("cowt")
    // every surviving original file is the SAME inode (hard link), and at
    // least the files of the untouched ranges survive untouched
    val kept = after.keySet.intersect(before.keySet)
    assert(kept.nonEmpty, "no original file survived — full rewrite happened")
    kept.foreach { n => assert(after(n) == before(n), s"$n inode changed") }
    val rewrittenCount = before.size - kept.size
    assert(rewrittenCount >= 1 && rewrittenCount < before.size,
      s"expected a strict subset rewritten, got $rewrittenCount of ${before.size}")
    // values are exact
    val n = engine.run("select count(*) as n, sum(v) as s from cowt").collect()(0)
    assert(n.getLong(0) == 2999L)
    assert(n.getLong(1) == (0L until 3000L).sum - 1500L)
    // and the archived pre-image still reads completely (time travel)
    val past = engine.run(
      "select count(*) as n from cowt version as of 3").collect()(0).getLong(0)
    assert(past == 3000L, s"pre-delete version read $past rows")
  }

  private def dataFilesRec(table: String): Map[String, Object] = {
    val dir = Paths.get(s"$whDir/$table")
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => dir.relativize(p).toString ->
          Files.readAttributes(p, classOf[BasicFileAttributes]).fileKey())
        .toMap
    } finally s.close()
  }

  test("partition-key DELETE drops whole directories; survivors keep inodes") {
    engine.run("create table cowp(v int, ds varchar) partitioned by (ds)")
    engine.run("insert into cowp select cast(id as int), 'd1' from range(0, 500)")
    engine.run("insert into cowp select cast(id as int), 'd2' from range(0, 600)")
    engine.run("insert into cowp select cast(id as int), 'd3' from range(0, 700)")
    val before = dataFilesRec("cowp")
    assert(before.keySet.exists(_.startsWith("ds=d1/")) &&
      before.keySet.exists(_.startsWith("ds=d3/")))
    val affected = engine.run("delete from cowp where ds <= 'd2'")
      .collect()(0).getLong(0)
    assert(affected == 1100L)
    val after = dataFilesRec("cowp")
    // EVERY survivor is an original inode under its original k=v path —
    // a retention delete never rewrites a byte of the kept partitions
    assert(after.nonEmpty && after.keySet.forall(_.startsWith("ds=d3/")))
    after.foreach { case (n, key) =>
      assert(before.get(n).contains(key), s"$n was rewritten, not linked") }
    assert(engine.run("select count(*) as n from cowp")
      .collect()(0).getLong(0) == 700L)
    // the dropped partitions still read from the archived version
    assert(engine.run("select count(*) as n from cowp version as of 3")
      .collect()(0).getLong(0) == 1800L)
    // scans prune: the partition filter reaches the scan node
    val plan = engine.run("explain select v from cowp where ds = 'd3'")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("PartitionFilters:") && plan.contains("ds"),
      s"no PartitionFilters in:\n$plan")
  }

  test("non-partition COW delete on a partitioned table links other partitions") {
    engine.run("create table cowp2(v int, ds varchar) partitioned by (ds)")
    engine.run("insert into cowp2 select cast(id as int), 'a' from range(0, 400)")
    engine.run("insert into cowp2 select cast(id as int), 'b' from range(400, 800)")
    val before = dataFilesRec("cowp2")
    val affected = engine.run("delete from cowp2 where v = 600")
      .collect()(0).getLong(0)
    assert(affected == 1L)
    val after = dataFilesRec("cowp2")
    // partition a is untouched: same relative paths, same inodes
    val keptA = after.filter(_._1.startsWith("ds=a/"))
    assert(keptA.nonEmpty)
    keptA.foreach { case (n, key) =>
      assert(before.get(n).contains(key), s"$n inode changed") }
    // the rewritten survivor landed back under its k=v directory with
    // its partition value intact (basePath read preserved ds)
    assert(engine.run("select count(*) as n from cowp2 where ds = 'b'")
      .collect()(0).getLong(0) == 399L)
    assert(engine.run("select sum(v) as s from cowp2")
      .collect()(0).getLong(0) == (0L until 800L).sum - 600L)
  }

  test("ADD COLUMN DEFAULT on a PARTITIONED BY table: zero rewrite, pruning intact") {
    engine.run("create table pma(v int, ds varchar) partitioned by (ds)")
    engine.run("insert into pma select cast(id as int), 'd1' from range(0, 200)")
    engine.run("insert into pma select cast(id as int), 'd2' from range(0, 300)")
    val before = dataFilesRec("pma")
    engine.run("alter table pma add column tag varchar default 'old'")
    // the ALTER is a metadata commit: same relative paths, same inodes
    assert(dataFilesRec("pma") == before,
      "ADD COLUMN DEFAULT rewrote a partitioned table")
    // every pre-ALTER row reads the fill; partition values still resolve
    assert(engine.run("select count(*) as n from pma where tag = 'old'")
      .collect()(0).getLong(0) == 500L)
    assert(engine.run("select count(*) as n from pma where ds = 'd2' and tag = 'old'")
      .collect()(0).getLong(0) == 300L)
    // new rows land under their partition with a real value; the
    // partition column stays LAST in the user-visible schema order
    engine.run("insert into pma (v, tag, ds) values (999, 'fresh', 'd1')")
    assert(engine.run("select count(*) as n from pma where tag = 'fresh'")
      .collect()(0).getLong(0) == 1L)
    // the retention DELETE stays a metadata directory drop after the
    // ALTER: d2's survivors keep their inodes
    val preDel = dataFilesRec("pma")
    assert(engine.run("delete from pma where ds = 'd1'")
      .collect()(0).getLong(0) == 201L)
    val after = dataFilesRec("pma")
    assert(after.nonEmpty && after.keySet.forall(_.startsWith("ds=d2/")))
    after.foreach { case (n, key) =>
      assert(preDel.get(n).contains(key), s"$n was rewritten, not linked") }
    // and the fill still applies to the surviving pre-ALTER partition
    assert(engine.run("select count(*) as n from pma where tag = 'old'")
      .collect()(0).getLong(0) == 300L)
  }

  test("fill history survives DROP COLUMN: time travel reads the default; re-ADD layers") {
    engine.run("create table fh(v int)")
    engine.run("insert into fh select cast(id as int) from range(0, 100)")
    engine.run("alter table fh add column c int default 5")
    // the version where c existed with the fill
    val vFilled = engine.run("select count(*) from fh where c = 5")
    assert(vFilled.collect()(0).getLong(0) == 100L)
    val verAtFill = 2 // create=0, insert=1, metadata ALTER commit=2
    engine.run("alter table fh drop column c")
    // live reads no longer carry c; the ARCHIVED version still owes the
    // fill to time travel (the history used to be deleted with the column)
    val past = engine.run(
      s"select count(*) as n from fh version as of $verAtFill where c = 5")
      .collect()(0).getLong(0)
    assert(past == 100L, s"time travel after DROP COLUMN lost the fill: $past")
    // re-ADD the same name with a DIFFERENT default: a new generation
    // layers over the new (post-drop-rewrite) files; the old archive
    // still reads 5, the live table reads 9
    engine.run("alter table fh add column c int default 9")
    assert(engine.run("select count(*) as n from fh where c = 9")
      .collect()(0).getLong(0) == 100L)
    assert(engine.run(
      s"select count(*) as n from fh version as of $verAtFill where c = 5")
      .collect()(0).getLong(0) == 100L)
    // restart keeps the layered history
    val engine2 = new Engine(spark, whDir)
    assert(engine2.run("select count(*) as n from fh where c = 9")
      .collect()(0).getLong(0) == 100L)
    assert(engine2.run(
      s"select count(*) as n from fh version as of $verAtFill where c = 5")
      .collect()(0).getLong(0) == 100L)
    // VACUUM destroys the archived versions the gen-1 fill served —
    // the inert generation prunes with them; the LIVE generation (9)
    // keeps reading (its files are the live files)
    engine.run("vacuum fh retain 0 versions")
    assert(engine.run("select count(*) as n from fh where c = 9")
      .collect()(0).getLong(0) == 100L)
    engine.run("drop table fh") // restore the shared engine's registry view
  }

  test("ADD COLUMN DEFAULT is zero-rewrite: every inode survives, reads see the fill") {
    engine.run("create table mfv(v int)")
    engine.run("insert into mfv select cast(id as int) from range(0, 300)")
    engine.run("insert into mfv select cast(id as int) from range(300, 600)")
    val before = dataFiles("mfv")
    // non-volatile DEFAULT: pg-11-style missing-value metadata — the
    // ALTER is a metadata commit, no data file is touched
    engine.run("alter table mfv add column tag varchar default 'legacy'")
    engine.run("alter table mfv add column flag int not null default 7")
    val after = dataFiles("mfv")
    assert(after == before, "ADD COLUMN DEFAULT rewrote data files")
    // every pre-ALTER row reads the fills
    val agg = engine.run("select count(*) as n from mfv " +
      "where tag = 'legacy' and flag = 7").collect()(0).getLong(0)
    assert(agg == 600L)
    // post-ALTER rows carry real values — an explicit NULL stays NULL
    engine.run("insert into mfv values (900, null, 1)")
    engine.run("insert into mfv values (901, 'fresh', 2)")
    assert(engine.run("select count(*) as n from mfv where tag is null")
      .collect()(0).getLong(0) == 1L)
    // omitted columns take the default on INSERT, like any DEFAULT
    engine.run("insert into mfv (v) values (902)")
    assert(engine.run("select tag, flag from mfv where v = 902").collect()(0)
      .toSeq == Seq("legacy", 7))
    // aggregation over the fill column sees one consistent world
    val byTag = engine.run("select tag, count(*) as n from mfv group by tag " +
      "order by tag nulls first").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1))).toSeq
    assert(byTag == Seq(("<null>", 1L), ("fresh", 1L), ("legacy", 601L)), byTag)
    // DML through the fill: a COW delete's survivors materialize fills
    assert(engine.run("delete from mfv where v = 100")
      .collect()(0).getLong(0) == 1L)
    assert(engine.run("select count(*) as n from mfv where tag = 'legacy'")
      .collect()(0).getLong(0) == 600L)
    // time travel: the pre-ALTER version has no tag column at all
    val v1cols = engine.run("select * from mfv version as of 2").columns.toSeq
    assert(v1cols == Seq("v"))
    // ... and post-ALTER versions read the fill from the SAME old files
    // (hard links by the same names): v4 = right after both ALTERs,
    // v7 = after the three inserts (602 rows, 601 legacy), both pre-delete
    assert(engine.run("select count(*) as n from mfv version as of 4 " +
      "where tag = 'legacy'").collect()(0).getLong(0) == 600L)
    assert(engine.run("select count(*) as n from mfv version as of 7 " +
      "where tag = 'legacy'").collect()(0).getLong(0) == 601L)
    // NOT NULL is enforced on writes against the declared schema
    intercept[Exception] {
      engine.run("insert into mfv values (903, 'x', null)").collect()
    }
  }

  test("volatile ADD COLUMN DEFAULT still fills through the rewrite") {
    engine.run("create table mfvol(v int)")
    engine.run("insert into mfvol select cast(id as int) from range(0, 50)")
    val before = dataFiles("mfvol")
    engine.run("alter table mfvol add column r double default rand()")
    val after = dataFiles("mfvol")
    assert(after.keySet.intersect(before.keySet).isEmpty,
      "volatile default must rewrite (per-row draws)")
    val r = engine.run("select count(*) as n, min(r) as lo, max(r) as hi " +
      "from mfvol").collect()(0)
    assert(r.getLong(0) == 50L && r.getDouble(1) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("missing-fill metadata survives an engine restart") {
    val dir = s"$whDir-restart"
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    val e1 = new Engine(spark, dir)
    e1.run("create table mfr(v int)")
    e1.run("insert into mfr select cast(id as int) from range(0, 100)")
    e1.run("alter table mfr add column tag varchar default 'old'")
    e1.run("insert into mfr values (500, 'new')")
    val e2 = new Engine(spark, dir) // reopen: manifest reload
    val got = e2.run("select tag, count(*) as n from mfr group by tag order by tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("new", 1L), ("old", 100L)), got.toString)
  }

  test("no-match DELETE links everything and reports 0 rows") {
    engine.run("create table cown(v int)")
    engine.run("insert into cown select cast(id as int) from range(0, 100)")
    engine.run("insert into cown select cast(id as int) from range(100, 200)")
    val before = dataFiles("cown")
    val affected = engine.run("delete from cown where v = 99999")
      .collect()(0).getLong(0)
    assert(affected == 0L)
    val after = dataFiles("cown")
    assert(after.keySet == before.keySet)
    before.foreach { case (name, key) => assert(after(name) == key, s"$name inode changed") }
    assert(engine.run("select count(*) as n from cown").collect()(0).getLong(0) == 200L)
  }

  test("selective UPDATE rewrites only matching files; values and count exact") {
    engine.run("create table cowu(k int, v int)")
    engine.run("insert into cowu select cast(id as int), 0 from range(0, 1000)")
    engine.run("insert into cowu select cast(id as int), 0 from range(1000, 2000)")
    engine.run("insert into cowu select cast(id as int), 0 from range(2000, 3000)")
    val before = dataFiles("cowu")
    val affected = engine.run("update cowu set v = 7 where k = 2500")
      .collect()(0).getLong(0)
    assert(affected == 1L)
    val after = dataFiles("cowu")
    val kept = after.keySet.intersect(before.keySet)
    assert(kept.nonEmpty, "no original file survived — full rewrite happened")
    kept.foreach { n => assert(after(n) == before(n), s"$n inode changed") }
    val r = engine.run(
      "select count(*) as n, sum(v) as s from cowu").collect()(0)
    assert(r.getLong(0) == 3000L && r.getLong(1) == 7L, r.toString)
    val updated = engine.run("select v from cowu where k = 2500")
      .collect()(0).getInt(0)
    assert(updated == 7)
  }

  test("unselective DELETE falls back to the full rewrite and stays exact") {
    engine.run("create table cowf(v int)")
    engine.run("insert into cowf select cast(id as int) from range(0, 500)")
    engine.run("insert into cowf select cast(id as int) from range(500, 1000)")
    val affected = engine.run("delete from cowf where v >= 0")
      .collect()(0).getLong(0)
    assert(affected == 1000L)
    assert(engine.run("select count(*) as n from cowf").collect()(0).getLong(0) == 0L)
  }

  test("selective MERGE rewrites only matched files; anti-join sees the whole target") {
    engine.run("create table cowm(k int, v int)")
    engine.run("insert into cowm select cast(id as int), 0 from range(0, 1000)")
    engine.run("insert into cowm select cast(id as int), 0 from range(1000, 2000)")
    engine.run("insert into cowm select cast(id as int), 0 from range(2000, 3000)")
    engine.run("create table cowsrc(k int, v int)")
    // k=2500 and k=100 match rows in two file families (both rewritten,
    // suppressing their inserts); the middle family is untouched; k=9999
    // matches nothing and must insert
    engine.run("insert into cowsrc values (2500, 77), (100, 88), (9999, 99)")
    val before = dataFiles("cowm")
    val affected = engine.run(
      "merge into cowm using cowsrc on cowm.k = cowsrc.k " +
        "when matched then update set v = cowsrc.v " +
        "when not matched then insert (k, v) values (cowsrc.k, cowsrc.v)")
      .collect()(0).getLong(0)
    assert(affected == 3L, s"2 matched + 1 inserted, got $affected")
    val after = dataFiles("cowm")
    val kept = after.keySet.intersect(before.keySet)
    assert(kept.nonEmpty, "no original file survived — full rewrite happened")
    kept.foreach { n => assert(after(n) == before(n), s"$n inode changed") }
    val r = engine.run("select count(*) as n, sum(v) as s from cowm").collect()(0)
    assert(r.getLong(0) == 3001L, r.toString) // 3000 + the one true insert
    assert(r.getLong(1) == 77L + 88L + 99L, r.toString)
    // the matched-in-untouched-file row updated in place
    assert(engine.run("select v from cowm where k = 100").collect()(0).getInt(0) == 88)
    assert(engine.run("select count(*) as n from cowm where k = 9999")
      .collect()(0).getLong(0) == 1L)
  }

  test("MERGE ... WHEN MATCHED THEN DELETE goes file-granular too") {
    engine.run("create table cowmd(k int)")
    engine.run("insert into cowmd select cast(id as int) from range(0, 500)")
    engine.run("insert into cowmd select cast(id as int) from range(500, 1000)")
    engine.run("create table cowmds(k int)")
    engine.run("insert into cowmds values (750)")
    val before = dataFiles("cowmd")
    val affected = engine.run(
      "merge into cowmd using cowmds on cowmd.k = cowmds.k " +
        "when matched then delete").collect()(0).getLong(0)
    assert(affected == 1L)
    val after = dataFiles("cowmd")
    val kept = after.keySet.intersect(before.keySet)
    assert(kept.nonEmpty, "no original file survived — full rewrite happened")
    kept.foreach { n => assert(after(n) == before(n), s"$n inode changed") }
    assert(engine.run("select count(*) as n from cowmd").collect()(0).getLong(0) == 999L)
  }

  test("ON CONFLICT DO UPDATE rewrites only conflicting files; inserts append") {
    engine.run("create table cowup(k int, v int)")
    engine.run("insert into cowup select cast(id as int), 0 from range(0, 1000)")
    engine.run("insert into cowup select cast(id as int), 0 from range(1000, 2000)")
    engine.run("insert into cowup select cast(id as int), 0 from range(2000, 3000)")
    val before = dataFiles("cowup")
    val affected = engine.run(
      "insert into cowup values (1500, 42), (5000, 7) " +
        "on conflict (k) do update set v = excluded.v")
      .collect()(0).getLong(0)
    assert(affected == 2L) // pg: every proposed row inserted or updated
    val after = dataFiles("cowup")
    val kept = after.keySet.intersect(before.keySet)
    assert(kept.nonEmpty, "no original file survived — full rewrite happened")
    kept.foreach { n => assert(after(n) == before(n), s"$n inode changed") }
    val r = engine.run(
      "select count(*) as n, sum(v) as s from cowup").collect()(0)
    assert(r.getLong(0) == 3001L && r.getLong(1) == 49L, r.toString)
  }

  test("VACUUM after a COW delete: shared inodes survive, live table intact") {
    engine.run("create table cowv(v int)")
    engine.run("insert into cowv select cast(id as int) from range(0, 500)")
    engine.run("insert into cowv select cast(id as int) from range(500, 1000)")
    engine.run("delete from cowv where v = 750") // links untouched files
    engine.run("vacuum cowv retain 0 versions")  // drops archived versions
    // the live directory's hard links own the inodes — reads stay whole
    val r = engine.run("select count(*) as n, sum(v) as s from cowv").collect()(0)
    assert(r.getLong(0) == 999L)
    assert(r.getLong(1) == (0L until 1000L).sum - 750L)
    // and another COW delete on the post-vacuum state still works
    assert(engine.run("delete from cowv where v = 250")
      .collect()(0).getLong(0) == 1L)
    assert(engine.run("select count(*) as n from cowv").collect()(0).getLong(0) == 998L)
  }

  test("RETURNING flows through the COW paths: pre-image delete, post-image update") {
    engine.run("create table cowr(k int, v int)")
    engine.run("insert into cowr select cast(id as int), 0 from range(0, 500)")
    engine.run("insert into cowr select cast(id as int), 0 from range(500, 1000)")
    val upd = engine.run("update cowr set v = 9 where k = 750 returning k, v")
      .collect()
    assert(upd.length == 1 && upd(0).getInt(0) == 750 && upd(0).getInt(1) == 9,
      upd.mkString(","))
    val del = engine.run("delete from cowr where k = 750 returning k, v")
      .collect()
    assert(del.length == 1 && del(0).getInt(0) == 750 && del(0).getInt(1) == 9,
      del.mkString(","))
    assert(engine.run("select count(*) as n from cowr")
      .collect()(0).getLong(0) == 999L)
  }

  test("table-qualified predicates resolve through the COW rewrite scan") {
    engine.run("create table cowq(k int, v int)")
    engine.run("insert into cowq select cast(id as int), 0 from range(0, 500)")
    engine.run("insert into cowq select cast(id as int), 0 from range(500, 1000)")
    // the probe resolves cowq.k against the catalog relation; the
    // rewrite reads raw files and must carry the same alias (the r16
    // review catch: unaliased touchedScan threw 'cannot resolve cowq.k')
    assert(engine.run("update cowq set v = cowq.v + 7 where cowq.k = 750")
      .collect()(0).getLong(0) == 1L)
    assert(engine.run("select v from cowq where k = 750")
      .collect()(0).getInt(0) == 7)
    assert(engine.run("delete from cowq where cowq.k = 750")
      .collect()(0).getLong(0) == 1L)
    assert(engine.run("select count(*) as n from cowq")
      .collect()(0).getLong(0) == 999L)
  }

  test("unconditional DELETE is scan-free: ledger count, empty swap, linked delta") {
    engine.run("create table cowt0(g varchar, x int)")
    engine.run("insert into cowt0 values ('a', 1), ('a', 2), ('b', 10)")
    engine.run(
      "create materialized view cowt0mv as select g, count(*) as n from cowt0 group by g")
    val affected = engine.run("delete from cowt0").collect()(0).getLong(0)
    assert(affected == 3L)
    assert(engine.run("select count(*) as n from cowt0").collect()(0).getLong(0) == 0L)
    // the linked pre-image delta keeps the matview refresh incremental
    val mode = engine.run("refresh materialized view cowt0mv")
      .collect()(0).getString(0)
    assert(mode == "incremental", mode)
    assert(engine.run("select count(*) as n from cowt0mv").collect()(0).getLong(0) == 0L)
    // time travel still reads the archived pre-state
    val past = engine.run("select count(*) as n from cowt0 version as of 1")
      .collect()(0).getLong(0)
    assert(past == 3L)
    // and the table keeps working: insert + delete again
    engine.run("insert into cowt0 values ('c', 5)")
    assert(engine.run("select g from cowt0").collect()(0).getString(0) == "c")
    assert(engine.run("delete from cowt0").collect()(0).getLong(0) == 1L)
  }

  private def bucketIdOf(name: String): Int =
    org.apache.spark.sql.graftbridge.Bridge.bucketIdFromFileName(name)
      .getOrElse(fail(s"unparsable bucket file name: $name"))

  test("bucket-key DELETE on a CLUSTERED BY table rewrites only matching files") {
    engine.run("create table cowbkt(k int, v int) clustered by (k) into 8 buckets")
    engine.run("insert into cowbkt select cast(id as int), 0 from range(0, 400)")
    engine.run("insert into cowbkt select cast(id as int), 0 from range(400, 800)")
    val before = dataFiles("cowbkt")
    assert(before.keySet.map(bucketIdOf).size == 8,
      s"expected files across all 8 buckets")
    val affected = engine.run("delete from cowbkt where k = 5")
      .collect()(0).getLong(0)
    assert(affected == 1L)
    val after = dataFiles("cowbkt")
    // file-granular even under the bucket layout: ONLY the file(s)
    // holding k=5 rewrite — same-bucket files without the key hard-link
    val gone = before.keySet -- after.keySet
    val goneBuckets = gone.map(bucketIdOf)
    assert(goneBuckets.size == 1, s"k=5 lives in one bucket, rewrote $goneBuckets")
    assert(gone.size < before.keySet.count(n => goneBuckets.contains(bucketIdOf(n))),
      "the whole bucket was rewritten — COW should stay file-granular")
    val kept = after.keySet.intersect(before.keySet)
    assert(kept == before.keySet -- gone)
    kept.foreach(n => assert(after(n) == before(n), s"$n inode changed"))
    // survivors re-hash into the SAME bucket: new files carry its id
    (after.keySet -- before.keySet).foreach(n =>
      assert(goneBuckets.contains(bucketIdOf(n)), s"new file $n outside the touched bucket"))
    // values exact; the bucketed read (bucket-pruned) agrees
    val r = engine.run("select count(*) as n, sum(k) as s from cowbkt").collect()(0)
    assert(r.getLong(0) == 799L && r.getLong(1) == (0L until 800L).sum - 5L, r.toString)
    assert(engine.run("select count(*) as n from cowbkt where k = 5")
      .collect()(0).getLong(0) == 0L)
    assert(engine.run("select count(*) as n from cowbkt where k = 6")
      .collect()(0).getLong(0) == 1L)
    // time travel still reads the complete pre-state through shared inodes
    assert(engine.run("select count(*) as n from cowbkt version as of 2")
      .collect()(0).getLong(0) == 800L)
  }

  test("UPDATE moving a row ACROSS buckets re-homes it under the layout") {
    engine.run("create table cowbmv(k int, v int) clustered by (k) into 8 buckets")
    engine.run("insert into cowbmv select cast(id as int), 0 from range(0, 400)")
    engine.run("insert into cowbmv select cast(id as int), 0 from range(400, 800)")
    // SET k = k + 1 on one row: the post-image hashes to a DIFFERENT
    // bucket; the bucketed scratch writer must land it in that bucket's
    // file name, or a bucket-pruned point read would miss the row
    assert(engine.run("update cowbmv set k = 1000 where k = 5")
      .collect()(0).getLong(0) == 1L)
    assert(engine.run("select count(*) as n from cowbmv where k = 5")
      .collect()(0).getLong(0) == 0L)
    assert(engine.run("select count(*) as n from cowbmv where k = 1000")
      .collect()(0).getLong(0) == 1L, "bucket-pruned read missed the moved row")
    assert(engine.run("select count(*) as n from cowbmv")
      .collect()(0).getLong(0) == 800L)
  }

  test("bucket-key UPDATE and MERGE stay file-granular; inserts re-bucket") {
    engine.run("create table cowbku(k int, v int) clustered by (k) into 8 buckets")
    engine.run("insert into cowbku select cast(id as int), 0 from range(0, 400)")
    engine.run("insert into cowbku select cast(id as int), 0 from range(400, 800)")
    val before = dataFiles("cowbku")
    assert(engine.run("update cowbku set v = 9 where k = 100")
      .collect()(0).getLong(0) == 1L)
    val afterU = dataFiles("cowbku")
    val goneU = (before.keySet -- afterU.keySet).map(bucketIdOf)
    assert(goneU.size == 1, s"UPDATE rewrote buckets $goneU")
    afterU.keySet.intersect(before.keySet)
      .foreach(n => assert(afterU(n) == before(n), s"$n inode changed"))
    assert(engine.run("select v from cowbku where k = 100").collect()(0).getInt(0) == 9)
    // MERGE: one matched update + one insert; the insert lands in its
    // own hash bucket even when that bucket's files are hard-linked
    engine.run("create table cowbks(k int, v int)")
    engine.run("insert into cowbks values (200, 77), (9999, 88)")
    val beforeM = dataFiles("cowbku")
    val m = engine.run("merge into cowbku using cowbks on cowbku.k = cowbks.k " +
      "when matched then update set v = cowbks.v " +
      "when not matched then insert (k, v) values (cowbks.k, cowbks.v)")
      .collect()(0).getLong(0)
    assert(m == 2L)
    val afterM = dataFiles("cowbku")
    assert(afterM.keySet.intersect(beforeM.keySet).nonEmpty, "full rewrite happened")
    assert(engine.run("select v from cowbku where k = 200").collect()(0).getInt(0) == 77)
    assert(engine.run("select v from cowbku where k = 9999").collect()(0).getInt(0) == 88)
    val r = engine.run("select count(*) as n from cowbku").collect()(0)
    assert(r.getLong(0) == 801L)
    // the catalog layout survived every partial rewrite: a co-bucketed
    // self-join on the bucket key plans with NO shuffle exchange
    val plan = engine.run(
      "explain select count(*) from cowbku a join cowbku b on a.k = b.k")
      .collect().map(_.getString(0)).mkString("\n")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed self-join re-shuffled:\n$plan")
  }

  test("nondeterministic DELETE predicate skips the COW path (full rewrite)") {
    engine.run("create table cownd(v int)")
    engine.run("insert into cownd select cast(id as int) from range(0, 1000)")
    engine.run("insert into cownd select cast(id as int) from range(1000, 2000)")
    engine.run("insert into cownd select cast(id as int) from range(2000, 3000)")
    val before = dataFiles("cownd")
    // rand() < 2.0 always holds, but the PLAN is nondeterministic: the
    // probe and the rewrite would be independent draws, so the planner
    // must refuse the file-granular path even though v >= 2000 prunes
    val affected = engine.run(
      "delete from cownd where v >= 2000 and rand() < 2.0")
      .collect()(0).getLong(0)
    assert(affected == 1000L)
    val after = dataFiles("cownd")
    assert(after.keySet.intersect(before.keySet).isEmpty,
      "COW hard-linked files under a nondeterministic predicate")
    assert(engine.run("select count(*) as n from cownd")
      .collect()(0).getLong(0) == 2000L)
  }

  test("DELETE WHERE rand(): RETURNING, the count and the table read ONE draw") {
    engine.run("create table cowrd(k int)")
    engine.run("insert into cowrd select cast(id as int) from range(0, 500)")
    engine.run("insert into cowrd select cast(id as int) from range(500, 1000)")
    val ret = engine.run("delete from cowrd where rand() < 0.5 returning k")
      .collect().map(_.getInt(0)).toSet
    val remaining = engine.run("select k from cowrd")
      .collect().map(_.getInt(0)).toSet
    assert(ret.intersect(remaining).isEmpty,
      s"${ret.intersect(remaining).size} rows were both 'deleted' and kept")
    assert(ret.size + remaining.size == 1000,
      s"${1000 - ret.size - remaining.size} rows vanished without being returned")
  }

  test("UPDATE SET rand(): RETURNING post-image equals the stored post-image") {
    engine.run("create table cowru(k int, v double)")
    engine.run("insert into cowru select cast(id as int), 0.0 from range(0, 100)")
    engine.run("insert into cowru select cast(id as int), 0.0 from range(100, 200)")
    val ret = engine.run("update cowru set v = rand() where k < 100 returning k, v")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ret.size == 100)
    val stored = engine.run("select k, v from cowru where k < 100")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ret == stored, "RETURNING drew different SET values than the table stored")
    assert(ret.values.forall(v => v > 0.0 && v < 1.0))
    // unmatched rows untouched
    assert(engine.run("select sum(v) as s from cowru where k >= 100")
      .collect()(0).getDouble(0) == 0.0)
  }

  test("bucketed base + IVM: COW delete, scan-free truncate, refresh stays exact") {
    engine.run("create table cowbiv(g varchar, k int, x int) " +
      "clustered by (k) into 4 buckets")
    engine.run("insert into cowbiv select case when id % 2 = 0 then 'a' else 'b' end, " +
      "cast(id as int), cast(id as int) from range(0, 400)")
    engine.run("create materialized view cowbivmv as " +
      "select g, count(*) as n, sum(x) as s from cowbiv group by g")
    // selective COW delete on the bucketed layout feeds the delta exactly
    engine.run("delete from cowbiv where k = 7")
    val m1 = engine.run("refresh materialized view cowbivmv")
      .collect()(0).getString(0)
    assert(m1 == "incremental", m1)
    val got1 = engine.run("select g, n, s from cowbivmv order by g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got1 == Seq(("a", 200L, (0 until 400 by 2).sum.toLong),
      ("b", 199L, (1 until 400 by 2).sum.toLong - 7L)), got1.toString)
    // unconditional DELETE is scan-free on bucketed tables too (r17):
    // the linked pre-image delta keeps the refresh incremental
    assert(engine.run("delete from cowbiv").collect()(0).getLong(0) == 399L)
    val m2 = engine.run("refresh materialized view cowbivmv")
      .collect()(0).getString(0)
    assert(m2 == "incremental", m2)
    assert(engine.run("select count(*) as n from cowbivmv")
      .collect()(0).getLong(0) == 0L)
    // the table keeps its layout contract: re-insert, bucket-pruned read
    engine.run("insert into cowbiv values ('c', 5, 50)")
    assert(engine.run("select x from cowbiv where k = 5")
      .collect()(0).getInt(0) == 50)
    // and time travel reads the complete bucketed pre-state
    assert(engine.run("select count(*) as n from cowbiv version as of 2")
      .collect()(0).getLong(0) == 399L)
  }

  test("partitioned base + IVM: append replay reads k=v values, drop delta exact") {
    engine.run("create table cowpiv(g varchar, x int, ds varchar) " +
      "partitioned by (ds)")
    engine.run("insert into cowpiv select case when id % 2 = 0 then 'a' else 'b' end, " +
      "cast(id as int), case when id < 100 then 'd1' else 'd2' end from range(0, 200)")
    // the matview groups by the PARTITION column: if the append replay
    // lost the k=v path values (bare leaf-file read), every group would
    // collapse to NULL — this is the deltaDf basePath contract
    engine.run("create materialized view cowpivmv as " +
      "select ds, count(*) as n, sum(x) as s from cowpiv group by ds")
    engine.run("insert into cowpiv select 'c', cast(id as int), 'd3' " +
      "from range(200, 250)")
    val m1 = engine.run("refresh materialized view cowpivmv")
      .collect()(0).getString(0)
    assert(m1 == "incremental", m1)
    val got1 = engine.run("select ds, n, s from cowpivmv order by ds").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got1 == Seq(("d1", 100L, (0 until 100).sum.toLong),
      ("d2", 100L, (100 until 200).sum.toLong),
      ("d3", 50L, (200 until 250).sum.toLong)), got1.toString)
    // partition-drop retention DELETE records its pre-image delta; the
    // refresh subtracts the whole dropped directory's rows
    assert(engine.run("delete from cowpiv where ds = 'd1'")
      .collect()(0).getLong(0) == 100L)
    val m2 = engine.run("refresh materialized view cowpivmv")
      .collect()(0).getString(0)
    assert(m2 == "incremental", m2)
    val got2 = engine.run("select ds, n, s from cowpivmv order by ds").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == Seq(("d2", 100L, (100 until 200).sum.toLong),
      ("d3", 50L, (200 until 250).sum.toLong)), got2.toString)
  }

  test("IVM over LEFT OUTER join: probe and null-side deltas both incremental") {
    engine.run("create table ojfact(k int, g varchar, x int)")
    engine.run("create table ojdim(k int, d varchar)")
    engine.run("insert into ojfact values (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)")
    engine.run("insert into ojdim values (1, 'd1'), (2, 'd2')")
    engine.run("create materialized view ojmv as " +
      "select g, count(*) as n, sum(x) as s, count(d) as cd " +
      "from ojfact left join ojdim on ojfact.k = ojdim.k group by g")
    def state(): Seq[(String, Long, Long, Long)] =
      engine.run("select g, n, s, cd from ojmv order by g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def refresh(): String =
      engine.run("refresh materialized view ojmv").collect()(0).getString(0)
    assert(state() == Seq(("a", 2L, 30L, 2L), ("b", 1L, 30L, 0L)))
    // null-side APPEND: a previously null-extended probe row now matches
    engine.run("insert into ojdim values (3, 'd3')")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 2L, 30L, 2L), ("b", 1L, 30L, 1L)))
    // null-side append creating MULTIPLICITY: k=1 matches two dim rows
    engine.run("insert into ojdim values (1, 'd1b')")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 3L, 40L, 3L), ("b", 1L, 30L, 1L)))
    // null-side DELETE: multiplicity retracts
    engine.run("delete from ojdim where d = 'd1b'")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 2L, 30L, 2L), ("b", 1L, 30L, 1L)))
    // null-side DELETE that re-null-extends a probe row
    engine.run("delete from ojdim where k = 3")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 2L, 30L, 2L), ("b", 1L, 30L, 0L)))
    // probe-side APPEND distributes: the standard replay arm
    engine.run("insert into ojfact values (4, 'b', 40)")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 2L, 30L, 2L), ("b", 2L, 70L, 0L)))
    // probe-side DELETE (recorded pre-image delta)
    engine.run("delete from ojfact where k = 2")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 1L, 10L, 1L), ("b", 2L, 70L, 0L)))
    // every state above equals a from-scratch recompute of the body
    val fresh = engine.run("select g, count(*) as n, sum(x) as s, count(d) as cd " +
      "from ojfact left join ojdim on ojfact.k = ojdim.k group by g order by g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(state() == fresh)
    // BOTH sides moved since anchor → honest full recompute, still exact
    engine.run("insert into ojfact values (5, 'c', 50)")
    engine.run("insert into ojdim values (5, 'd5')")
    assert(refresh() == "full")
    assert(state().exists(_ == ("c", 1L, 50L, 1L)))
  }

  test("IVM over SELECT DISTINCT: dup lifetimes exact, join body incremental") {
    engine.run("create table djf(k int, g varchar, tag int)")
    engine.run("create table djd(k int, d varchar)")
    engine.run("insert into djf values (1, 'a', 1), (1, 'a', 2), (2, 'b', 3)")
    engine.run("insert into djd values (1, 'x'), (2, 'y')")
    // DISTINCT over an inner join: the (g, d) pair space
    engine.run("create materialized view djv as " +
      "select distinct g, d from djf join djd on djf.k = djd.k")
    def state(): Seq[(String, String)] =
      engine.run("select g, d from djv order by g, d").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    def refresh(): String =
      engine.run("refresh materialized view djv").collect()(0).getString(0)
    assert(state() == Seq(("a", "x"), ("b", "y")))
    // fact append that only adds multiplicity: view unchanged, incremental
    engine.run("insert into djf values (1, 'a', 4)")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", "x"), ("b", "y")))
    // dim append creating a brand-new pair for an existing fact key
    engine.run("insert into djd values (1, 'z')")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", "x"), ("a", "z"), ("b", "y")))
    // deleting one of three (k=1) fact copies keeps both its pairs
    engine.run("delete from djf where tag = 1")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", "x"), ("a", "z"), ("b", "y")))
    // deleting the last copies of k=1 drops both pairs
    engine.run("delete from djf where k = 1")
    assert(refresh() == "incremental")
    assert(state() == Seq(("b", "y")))
    // matches a from-scratch evaluation of the body
    val fresh = engine.run("select distinct g, d from djf join djd " +
      "on djf.k = djd.k order by g, d").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(state() == fresh)
  }

  test("IVM expression-over-aggregates: join body, both windows moved, avg inside") {
    engine.run("create table exf(k int, g varchar, a int, b int)")
    engine.run("create table exd(k int, w int)")
    engine.run("insert into exf values (1, 'p', 2, 1), (1, 'p', 4, 3), (2, 'q', 6, 2)")
    engine.run("insert into exd values (1, 10), (2, 20)")
    // sum ratio + avg arithmetic + count scaling, over an inner join
    engine.run("create materialized view exv as " +
      "select g, sum(a * w) * 1.0 / nullif(sum(b * w), 0) as r, " +
      "avg(a) * 2 as a2, count(*) + 0 as n0 " +
      "from exf join exd on exf.k = exd.k group by g")
    def state(): Seq[String] =
      engine.run("select g, r, a2, n0 from exv order by g").collect()
        .map(_.toString).toSeq
    def refresh(): String =
      engine.run("refresh materialized view exv").collect()(0).getString(0)
    def oracle(): Seq[String] =
      engine.run("select g, sum(a * w) * 1.0 / nullif(sum(b * w), 0) as r, " +
        "avg(a) * 2 as a2, count(*) + 0 as n0 " +
        "from exf join exd on exf.k = exd.k group by g order by g").collect()
        .map(_.toString).toSeq
    assert(state() == oracle())
    // fact-side append only
    engine.run("insert into exf values (2, 'q', 8, 4)")
    assert(refresh() == "incremental")
    assert(state() == oracle())
    // dim-side append only (new key picks up waiting fact rows? no —
    // k=3 has no fact rows yet; then fact rows arrive for it)
    engine.run("insert into exd values (3, 30)")
    assert(refresh() == "incremental")
    engine.run("insert into exf values (3, 'p', 5, 5)")
    assert(refresh() == "incremental")
    assert(state() == oracle())
    // BOTH windows moved since the anchor: telescoping cross-delta with
    // the expression columns riding first()-through-the-fold sidecars
    engine.run("insert into exf values (1, 'q', 7, 7)")
    engine.run("insert into exd values (4, 40)")
    assert(refresh() == "incremental")
    assert(state() == oracle())
    // deletes subtract through the sidecars on both sides
    engine.run("delete from exf where a = 4")
    assert(refresh() == "incremental")
    assert(state() == oracle())
    engine.run("delete from exd where k = 3")
    assert(refresh() == "incremental")
    assert(state() == oracle())
  }

  test("IVM HAVING over a join: thresholds cross both ways, sidecar keeps every group") {
    engine.run("create table hjf(k int, g varchar, v int)")
    engine.run("create table hjd(k int, w int)")
    engine.run("insert into hjf values (1, 'a', 2), (1, 'a', 3), (2, 'b', 4)")
    engine.run("insert into hjd values (1, 10), (2, 20)")
    engine.run("create materialized view hjv as " +
      "select g, sum(v * w) as s, count(*) as n " +
      "from hjf join hjd on hjf.k = hjd.k group by g having sum(v * w) >= 60")
    def state(): Seq[(String, Long, Long)] =
      engine.run("select g, s, n from hjv order by g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def refresh(): String =
      engine.run("refresh materialized view hjv").collect()(0).getString(0)
    def oracle(): Seq[(String, Long, Long)] =
      engine.run("select g, sum(v * w) as s, count(*) as n " +
        "from hjf join hjd on hjf.k = hjd.k group by g " +
        "having sum(v * w) >= 60 order by g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: 2*10+3*10=50 (out), b: 4*20=80 (in)
    assert(state() == Seq(("b", 80L, 1L)) && state() == oracle())
    // fact append pushes a over the threshold: enters with FULL history
    engine.run("insert into hjf values (1, 'a', 1)")
    assert(refresh() == "incremental")
    assert(state() == Seq(("a", 60L, 3L), ("b", 80L, 1L)) && state() == oracle())
    // fact delete drops a back out
    engine.run("delete from hjf where v = 3")
    assert(refresh() == "incremental")
    assert(state() == Seq(("b", 80L, 1L)) && state() == oracle())
    // dim-side append (probe-distributing input moved)
    engine.run("insert into hjd values (3, 100)")
    engine.run("insert into hjf values (3, 'c', 1)")
    assert(refresh() == "incremental")
    assert(state() == oracle())
    assert(state().exists(_._1 == "c"))
  }

  test("IVM RIGHT OUTER mirrors; FULL OUTER recomputes") {
    engine.run("create table rjfact(k int, x int)")
    engine.run("create table rjdim(k int, g varchar)")
    engine.run("insert into rjfact values (1, 10)")
    engine.run("insert into rjdim values (1, 'a'), (2, 'b')")
    // RIGHT outer: rjdim is the probe side, rjfact null-supplying
    engine.run("create materialized view rjmv as " +
      "select g, count(x) as cx from rjfact right join rjdim " +
      "on rjfact.k = rjdim.k group by g")
    engine.run("insert into rjfact values (2, 20)") // null-side delta
    assert(engine.run("refresh materialized view rjmv")
      .collect()(0).getString(0) == "incremental")
    val got = engine.run("select g, cx from rjmv order by g").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1L), ("b", 1L)), got.toString)
    // FULL OUTER is a refusal shape: correct, via recompute
    engine.run("create materialized view fjmv as " +
      "select count(*) as n from rjfact full outer join rjdim " +
      "on rjfact.k = rjdim.k")
    engine.run("insert into rjdim values (3, 'c')")
    assert(engine.run("refresh materialized view fjmv")
      .collect()(0).getString(0) == "full")
    assert(engine.run("select n from fjmv").collect()(0).getLong(0) == 3L)
  }

  test("ON CONFLICT DO UPDATE SET rand(): RETURNING equals the stored rows") {
    engine.run("create table cowuprd(k int, v double)")
    engine.run("insert into cowuprd select cast(id as int), 0.0 from range(0, 100)")
    engine.run("insert into cowuprd select cast(id as int), 0.0 from range(100, 200)")
    val ret = engine.run(
      "insert into cowuprd values (50, -1.0), (150, -1.0), (900, -1.0) " +
        "on conflict (k) do update set v = rand() returning k, v")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ret.size == 3, ret.toString)
    val stored = engine.run("select k, v from cowuprd where k in (50, 150, 900)")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ret == stored,
      s"RETURNING drew different SET values than the table stored: $ret vs $stored")
    assert(ret(50) > 0.0 && ret(150) > 0.0) // conflicting rows drew rand()
    assert(ret(900) == -1.0)                // the true insert keeps its value
    assert(engine.run("select count(*) as n from cowuprd")
      .collect()(0).getLong(0) == 201L)
  }

  test("MERGE: nondeterministic SET/INSERT draw once; nondeterministic ON refused") {
    engine.run("create table cowmrd(k int, v double)")
    engine.run("insert into cowmrd select cast(id as int), 0.0 from range(0, 200)")
    engine.run("create table cowmsrc(k int)")
    engine.run("insert into cowmsrc values (5), (100), (900)")
    engine.run("create materialized view cowmrdmv as " +
      "select count(*) as n, sum(v) as s from cowmrd")
    engine.run("merge into cowmrd using cowmsrc on cowmrd.k = cowmsrc.k " +
      "when matched then update set v = rand() " +
      "when not matched then insert (k, v) values (cowmsrc.k, rand())")
    val mode = engine.run("refresh materialized view cowmrdmv")
      .collect()(0).getString(0)
    assert(mode == "incremental", mode)
    val mv = engine.run("select n, s from cowmrdmv").collect()(0)
    val base = engine.run("select count(*) as n, sum(v) as s from cowmrd")
      .collect()(0)
    assert(mv.getLong(0) == base.getLong(0), s"$mv vs $base")
    assert(math.abs(mv.getDouble(1) - base.getDouble(1)) < 1e-9,
      s"matview sum ${mv.getDouble(1)} != base ${base.getDouble(1)} — " +
        "the merge drew its SET/INSERT values more than once")
    // a nondeterministic ON condition cannot be made single-draw (the
    // join re-evaluates per frame) — refused with a pointer
    val ex = intercept[Exception] {
      engine.run("merge into cowmrd using cowmsrc " +
        "on cowmrd.k = cowmsrc.k and rand() < 0.5 when matched then delete")
    }
    assert(ex.getMessage.contains("nondeterministic ON"), ex.getMessage)
  }

  test("nondeterministic DELETE feeds the IVM delta the SAME draw") {
    engine.run("create table cowndv(g varchar, x int)")
    engine.run("insert into cowndv select 'a', cast(id as int) from range(0, 200)")
    engine.run("insert into cowndv select 'b', cast(id as int) from range(0, 200)")
    engine.run("create materialized view cowndmv as " +
      "select g, count(*) as n from cowndv group by g")
    engine.run("delete from cowndv where rand() < 0.5")
    val mode = engine.run("refresh materialized view cowndmv")
      .collect()(0).getString(0)
    assert(mode == "incremental", mode)
    val mv = engine.run("select g, n from cowndmv order by g").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = engine.run("select g, count(*) as n from cowndv group by g").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mv == base, s"matview $mv diverged from base $base after a rand() delete")
  }

  test("COW delete feeds IVM deltas exactly (incremental matview refresh)") {
    engine.run("create table cowb(g varchar, x int)")
    engine.run("insert into cowb values ('a', 1), ('a', 2)")
    engine.run("insert into cowb values ('b', 10), ('b', 20)")
    engine.run("insert into cowb values ('c', 100)")
    engine.run(
      "create materialized view cowmv as select g, count(*) as n, sum(x) as s from cowb group by g")
    engine.run("delete from cowb where x = 10")
    engine.run("refresh materialized view cowmv")
    val got = engine.run("select g, n, s from cowmv order by g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 3L), ("b", 1L, 20L), ("c", 1L, 100L)), got.toString)
  }
}
