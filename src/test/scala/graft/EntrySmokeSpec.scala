package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver calls SparkEntry.entry with ITS OWN session (Spark 4
  * defaults: ANSI on, no legacy parquet confs). entry must work there —
  * emulate by flipping the session to ANSI for the call.
  */
class EntrySmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows under ANSI-default session settings") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(SparkEntry.entry(spark).count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
