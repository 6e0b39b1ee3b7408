package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on a skewed key distribution") {
    val li = Tables.df(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables.df(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
