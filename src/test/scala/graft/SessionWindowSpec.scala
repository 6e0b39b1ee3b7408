package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Our gap-based sessionization (events_sessionize: lag + running sum of
  * gap markers) must agree with Spark's native session_window on session
  * count and sizes — two independent formulations of the same semantics.
  */
class SessionWindowSpec extends AnyFunSuite {
  import TestSpark._

  test("manual sessionize agrees with native session_window") {
    val e = Tables.df(spark, sf, "events")
    val native = e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
    val manual = SparkEntry.registry("events_sessionize").fn(spark, sf)
      .select(col("user_id"), col("n_events"))
    // same multiset of (user, session size)
    assert(native.exceptAll(manual).isEmpty && manual.exceptAll(native).isEmpty)
  }
}
