package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the pipeline extensions) is one
  * entry in [[queries]]; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against on the same parquet tables.
  */
object SparkEntry {

  /** Full query registry (name → Spark program + oracle + bench flag). */
  def registry: Map[String, Q] =
    Relational.all ++ Joins.all ++ Subqueries.all ++ Windows.all ++
      Functions.all ++ Tpch.all ++ TpchExt.all ++ Pipeline.all ++ Events.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Headline subset used by Bench. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.collect { case (k, q) if q.bench => k -> q.fn }
}
