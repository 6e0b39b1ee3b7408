package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: wrap a Catalyst logical plan back into
  * a DataFrame. Needed by the incremental-matview machinery, which
  * extends the ANALYZED body plan with hidden sidecar aggregates (the
  * sum/count decomposition) — an operation with no public-API spelling.
  * The accepted extension pattern for Spark libraries that manipulate
  * plans directly.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
