package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-TPC-H-schema synthesis over the driver testdata.
  *
  * The reference executes the verbatim TPC-H query text
  * (`/root/reference/tests/sql/tpch/q1.sql..q22.sql`, loaded by
  * `tpch.slt`) against tables created with the spec's full DDL
  * (`create.sql`). The driver parquet carries a slimmed schema (no
  * partsupp, no comment/address/phone/shipmode/... columns), so
  * SQL-surface parity — "the reference's own query text runs unmodified"
  * — needs the missing columns synthesized.
  *
  * Everything here is a deterministic, narrow per-row map keyed on the
  * table's integer primary key (same policy as [[TpchExt.partsupp]] /
  * [[TpchExt.lineitemExt]]): no shuffle is added to any plan, and every
  * value domain matches the spec's so the queries' literal predicates
  * (`l_shipmode in ('MAIL','SHIP')`, `p_container = 'SM CASE'`,
  * `substring(c_phone from 1 for 2) in ('13',...)`,
  * `o_comment not like '%special%requests%'`, ...) select non-trivial
  * subsets rather than everything or nothing.
  */
object TpchSchema {

  private def pick(key: org.apache.spark.sql.Column, vals: String*) =
    element_at(array(vals.map(lit): _*), (key % vals.size).cast("int") + 1)

  /** TPC-H phone 'CC-XXX-XXX-XXXX' with country code 10..34 (spec 4.2.2.9). */
  private def phone(key: org.apache.spark.sql.Column) = concat(
    lpad(((key % 25) + 10).cast("string"), 2, "0"), lit("-"),
    lpad(((key * 7) % 1000).cast("string"), 3, "0"), lit("-"),
    lpad(((key * 13) % 1000).cast("string"), 3, "0"), lit("-"),
    lpad(((key * 29) % 10000).cast("string"), 4, "0"))

  def customerFull(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("c_address", concat(lit("addr c"), col("c_custkey")))
      .withColumn("c_phone", phone(col("c_custkey")))
      .withColumn("c_comment", concat(lit("customer comment "), col("c_custkey")))

  def supplierFull(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier")
      .withColumn("s_address", concat(lit("addr s"), col("s_suppkey")))
      .withColumn("s_phone", phone(col("s_suppkey")))
      // q16 excludes suppliers with '%Customer%Complaints%' — 1 in 13 match
      .withColumn("s_comment", when(col("s_suppkey") % 13 === 0,
          concat(lit("Customer noted Complaints "), col("s_suppkey")))
        .otherwise(concat(lit("supplier comment "), col("s_suppkey"))))

  def ordersFull(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("o_shippriority", lit(0))
      .withColumn("o_clerk",
        concat(lit("Clerk#"), lpad((col("o_orderkey") % 1000).cast("string"), 9, "0")))
      // q13 drops orders matching '%special%requests%' — 1 in 10 match
      .withColumn("o_comment", when(col("o_orderkey") % 10 === 0,
          lit("was special handling requests noted"))
        .otherwise(concat(lit("order comment "), col("o_orderkey"))))

  def partFull(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .withColumn("p_mfgr",
        concat(lit("Manufacturer#"), ((col("p_partkey") % 5) + 1).cast("string")))
      .withColumn("p_container", pick(col("p_partkey"),
        "SM CASE", "SM BOX", "SM PACK", "SM PKG",
        "MED BAG", "MED BOX", "MED PKG", "MED PACK",
        "LG CASE", "LG BOX", "LG PACK", "LG PKG"))
      .withColumn("p_comment", concat(lit("part comment "), col("p_partkey")))

  def lineitemFull(s: SparkSession, d: String): DataFrame = {
    val k = col("l_orderkey") * 31 + col("l_linenumber")
    TpchExt.lineitemExt(s, d)
      .withColumn("l_shipmode", pick(k,
        "REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"))
      .withColumn("l_shipinstruct", pick(k * 7,
        "DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"))
      .withColumn("l_comment", concat(lit("line comment "), k))
  }

  /** Register the eight spec-schema tables as temp views. */
  def registerFull(s: SparkSession, d: String): Unit = {
    t(s, d, "region").createOrReplaceTempView("region")
    t(s, d, "nation").createOrReplaceTempView("nation")
    customerFull(s, d).createOrReplaceTempView("customer")
    supplierFull(s, d).createOrReplaceTempView("supplier")
    partFull(s, d).createOrReplaceTempView("part")
    ordersFull(s, d).createOrReplaceTempView("orders")
    lineitemFull(s, d).createOrReplaceTempView("lineitem")
    TpchExt.partsupp(s, d).createOrReplaceTempView("partsupp")
  }
}
