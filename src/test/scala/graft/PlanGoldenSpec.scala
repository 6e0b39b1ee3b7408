package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Planner-regression goldens: the normalized physical-plan SHAPE of every
  * registry query is pinned to a golden file — the Spark analogue of the
  * reference's yml EXPLAIN pins under `/root/reference/tests/planner_test`
  * (regenerated there with UPDATE_PLANNER=1). Regenerate here with
  * `GRAFT_UPDATE_PLANS=1 sbt "testOnly graft.PlanGoldenSpec"` after an
  * intentional plan change.
  *
  * Normalization keeps the operator tree (indentation + operator name) and
  * drops everything volatile: expression ids, codegen stage ids, file
  * paths, statistics, AQE plan ids. A silent regression — a broadcast that
  * becomes a shuffle, a pushed filter that stops pushing, a new exchange —
  * changes the shape and fails the diff.
  */
class PlanGoldenSpec extends AnyFunSuite {
  import TestSpark._

  private val goldenDir = Paths.get("src/test/resources/plans")
  private val update = sys.env.get("GRAFT_UPDATE_PLANS").contains("1")

  /** Planning-relevant confs are PINNED to the entry-point defaults while
    * shapes are computed — other suites sharing this session mutate them
    * (the Engine turns CBO on, pragma tests toggle AQE) and goldens must
    * not depend on suite ordering.
    */
  private def pinned[A](body: => A): A = {
    // spark.sql.extensions is a static conf — cannot (and need not) be
    // re-set on a live session
    val confs = (Tables.sessionConfs - "spark.sql.extensions") +
      ("spark.sql.cbo.enabled" -> "false")
    val saved = confs.keys.toSeq.map(k => k -> spark.conf.getOption(k))
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** One line per operator: leading tree art preserved, `*(n)` codegen
    * tags and argument lists stripped, so only structure remains.
    */
  private def shape(name: String): String = pinned {
    val df = SparkEntry.registry(name).fn(spark, sf)
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.replaceAll("""\*\(\d+\)\s*""", "")) // codegen stage tags
      .map { line =>
        val m = """^([-+:\s]*)([A-Za-z][A-Za-z0-9_]*)""".r.findFirstMatchIn(line)
        m.map(g => g.group(1) + g.group(2)).getOrElse("")
      }
      .filter(_.nonEmpty)
      // sub-operator detail lines (Output, Arguments, ReadSchema...) are
      // not operators; the formatted header repeats structure we keep
      .filterNot(_.trim.matches(
        "(Output|Arguments|Results|Input|Keys|Functions|Aggregate|Condition|Join|ReadSchema|Batched|Location|PushedFilters|PartitionFilters|DataFilters|Format)"))
      .mkString("\n") + "\n"
  }

  test("every registry query's plan shape matches its golden") {
    // cached frames from other suites would substitute InMemoryTableScan
    // into plan shapes — goldens pin the cold-plan structure
    spark.catalog.clearCache()
    if (update) Files.createDirectories(goldenDir)
    val failures = scala.collection.mutable.Buffer[String]()
    SparkEntry.registry.keys.toSeq.sorted.foreach { name =>
      val got = shape(name)
      val file = goldenDir.resolve(s"$name.plan")
      if (update || !Files.exists(file)) {
        Files.createDirectories(goldenDir)
        Files.writeString(file, got)
      } else {
        val want = Files.readString(file)
        if (got != want)
          failures += s"$name:\n--- golden ---\n$want--- current ---\n$got"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} plan shape(s) changed (GRAFT_UPDATE_PLANS=1 to regen):\n" +
        failures.mkString("\n"))
  }
}
