package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hashing

/** Pin the r18 optimization contract of [[graft.expr.RoundAwayLong]]: the
  * codegen kernel must be bit-identical to the path it replaced —
  * `round(x).cast("long")`, i.e. BigDecimal.valueOf(x).setScale(0,
  * HALF_UP) — on every double, including the adversarial boundary values
  * where naive `floor(x + 0.5)` double-rounding diverges. dsum/davg and
  * every fixed-point micros quantization in the gate queries ride this
  * kernel, so any disagreement here is a correctness bug, not a perf nit.
  */
class RoundAwaySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the replaced path exactly: BigDecimal HALF_UP round back to double,
  // then Spark's non-ANSI double->long cast (Scala .toLong saturates the
  // same way)
  private def oldRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  private def newRound(x: Double): Long =
    if (x >= 0) Math.round(x)
    else if (x <= Long.MinValue.toDouble) Long.MinValue
    else -Math.round(-x)

  private val adversarial: Seq[Double] = Seq(
    0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
    0.49999999999999994, // pred(0.5): floor(x+0.5) gives 1, HALF_UP gives 0
    -0.49999999999999994,
    // largest double below n+0.5 at a few magnitudes
    Math.nextDown(12345.5), -Math.nextDown(12345.5),
    Math.nextDown(1e15 + 0.5),
    Math.nextUp(0.5), -Math.nextUp(0.5),
    4503599627370495.5, // 2^52 - 0.5, the last representable .5 tie
    -4503599627370495.5,
    9007199254740992.0, // 2^53: doubles are integral from here
    1.0e18, -1.0e18,
    // saturation boundary: 2^63 as double and its neighbors — the old
    // path's non-ANSI cast clamps to Long.Min/MaxValue, so must we
    9.223372036854776e18, -9.223372036854776e18,
    Math.nextDown(9.223372036854776e18), -Math.nextDown(9.223372036854776e18),
    1.0e19, -1.0e19)

  test("scalar kernel == BigDecimal HALF_UP on adversarial boundaries") {
    adversarial.foreach { x =>
      assert(newRound(x) === oldRound(x), s"x=$x (${x.toString})")
    }
  }

  test("scalar kernel == BigDecimal HALF_UP on random doubles (property)") {
    // deterministic seeded sweep over mixed magnitudes: micros-scale
    // values, exact .5 ties, pred(n+.5) near-ties, huge exponents
    val rnd = new scala.util.Random(0x5eed)
    (1 to 200000).foreach { _ =>
      val x = rnd.nextInt(4) match {
        case 0 => (rnd.nextDouble() - 0.5) * 2e12
        case 1 => rnd.nextInt(2000001) - 1000000 + 0.5
        case 2 => Math.nextDown(rnd.nextInt(1000001) + 0.5) *
          (if (rnd.nextBoolean()) 1 else -1)
        case _ => (rnd.nextDouble() - 0.5) * 2e300
      }
      assert(newRound(x) === oldRound(x), s"x=$x")
    }
  }

  test("Column kernel matches the old round().cast('long') in a query") {
    val df = adversarial.toDF("x")
    val rows = df.select(
        Hashing.roundAwayLong(col("x")).as("nw"),
        round(col("x")).cast("long").as("od"))
      .collect()
    rows.zip(adversarial).foreach { case (r, x) =>
      assert(r.get(0) === r.get(1), s"x=$x")
    }
    // and through an aggregate, the dsum shape
    val agg = df.agg(
      sum(Hashing.roundAwayLong(col("x") * 1e6)).as("nw"),
      sum(round(col("x") * 1e6).cast("long")).as("od")).collect()(0)
    assert(agg.get(0) === agg.get(1))
  }

  test("nulls propagate like round()") {
    val df = Seq[Option[Double]](Some(1.2), None).toDF("x")
    val rows = df.select(Hashing.roundAwayLong(col("x"))).collect()
    assert(rows.map(_.isNullAt(0)).toSeq === Seq(false, true))
  }
}
