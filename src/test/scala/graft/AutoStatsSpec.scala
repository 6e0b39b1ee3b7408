package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import org.apache.spark.sql.catalyst.TableIdentifier

/** r16 auto-stats widening: NDV/min/max ride every write for ALL numeric
  * columns under the cap (not just declared PK / CLUSTERED BY), so a
  * fact's dimension FK — the join key every reorder hangs on — plans
  * from real stats without anyone running ANALYZE; and a full rewrite
  * opportunistically adopts an equi-height histogram (the post-state is
  * scanned anyway).
  */
class AutoStatsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = {
    val dir = "/root/repo/target/graft-tmp/autostats-warehouse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    new Engine(spark, dir)
  }

  private def colStats(table: String) =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
      .stats.map(_.colStats).getOrElse(Map.empty)

  test("non-PK numeric FK gets NDV/min/max from the insert itself") {
    engine.run("create table asf(pk bigint primary key, fk int, name varchar)")
    engine.run(
      "insert into asf select id, cast(id % 37 as int), 'x' from range(0, 5000)")
    val cs = colStats("asf")
    assert(cs.contains("fk"), s"fk missing from auto stats: ${cs.keySet}")
    val fk = cs("fk")
    assert(fk.min.contains("0") && fk.max.contains("36"), fk.toString)
    val ndv = fk.distinctCount.map(_.toLong).getOrElse(0L)
    assert(ndv >= 33 && ndv <= 41, s"fk NDV $ndv not ~37")
    // r17: the string column rides too — NDV only, never min/max
    // (CatalogColumnStat cannot externalize string bounds)
    assert(cs.contains("name") && cs("name").distinctCount.isDefined)
    assert(cs("name").min.isEmpty && cs("name").max.isEmpty)
  }

  test("string FK and date columns feed CBO from the insert itself (r17)") {
    engine.run("create table asd(k varchar, d date, v int)")
    engine.run("insert into asd select concat('u', cast(id % 37 as string)), " +
      "date_add(date '2024-01-01', cast(id % 50 as int)), cast(id as int) " +
      "from range(0, 5000)")
    val cs = colStats("asd")
    val k = cs("k")
    val kNdv = k.distinctCount.map(_.toLong).getOrElse(0L)
    assert(kNdv >= 33 && kNdv <= 41, s"string FK NDV $kNdv not ~37")
    assert(k.min.isEmpty && k.max.isEmpty, "string min/max must not externalize")
    val d = cs("d")
    assert(d.min.contains("2024-01-01") && d.max.contains("2024-02-19"),
      d.toString)
    val dNdv = d.distinctCount.map(_.toLong).getOrElse(0L)
    assert(dNdv >= 45 && dNdv <= 55, s"date NDV $dNdv not ~50")
    // the CBO consumes it: a join on the string FK against a 37-row dim
    // carries a finite, NDV-derived row estimate (≈ 5000 matched rows)
    // instead of an unknown/default guess
    engine.run("create table asdim(k varchar, lbl varchar)")
    engine.run("insert into asdim select concat('u', cast(id as string)), " +
      "'L' from range(0, 37)")
    val cost = engine.run(
      "explain select * from asd join asdim on asd.k = asdim.k")
      .collect().map(_.getString(0)).mkString("\n")
    val joinRow = cost.linesIterator
      .find(l => l.contains("Join") && l.contains("rowCount="))
    assert(joinRow.isDefined, s"no row-counted Join in:\n$cost")
    val est = "rowCount=([0-9.E+\\-]+)".r.findFirstMatchIn(joinRow.get)
      .map(_.group(1).toDouble).getOrElse(-1.0)
    assert(est >= 2500 && est <= 10000,
      s"join estimate $est not NDV-derived (~5000): $joinRow")
  }

  test("a full rewrite adopts an equi-height histogram opportunistically") {
    engine.run("create table ash(v int)")
    // skewed: 90% of rows at v=1, a tail up to 1000
    engine.run("insert into ash select cast(case when id % 10 < 9 then 1 " +
      "else id % 1000 end as int) from range(0, 20000)")
    assert(colStats("ash").get("v").forall(_.histogram.isEmpty),
      "append must not pay the percentile pass")
    engine.run("optimize ash") // full rewrite → sketch rides the write
    val h = colStats("ash").get("v").flatMap(_.histogram)
    assert(h.isDefined, "rewrite did not adopt a histogram")
    assert(h.get.bins.length >= 16, s"suspicious bin count ${h.get.bins.length}")
    // equi-height over 90%-at-1 data: most bins collapse onto value 1
    assert(h.get.bins.count(b => b.lo == 1.0 && b.hi == 1.0) >=
      h.get.bins.length / 2, "histogram does not reflect the skew")
  }

  test("stats survive re-registration (restart path) with the histogram") {
    engine.run("create table asr(v int)")
    engine.run("insert into asr select cast(id as int) from range(0, 1000)")
    engine.run("optimize asr")
    val second = new Engine(spark, "/root/repo/target/graft-tmp/autostats-warehouse")
    val cs = colStats("asr")
    assert(cs.get("v").exists(_.distinctCount.isDefined), cs.toString)
    assert(cs.get("v").exists(_.histogram.isDefined),
      "histogram lost across restart")
  }
}
