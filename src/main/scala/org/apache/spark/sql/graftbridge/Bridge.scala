package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` seam a whole-operator extension needs:
  * constructing a DataFrame from a custom LogicalPlan. Living under
  * `org.apache.spark.sql` for package-private access is the standard
  * technique for Spark extension libraries (Iceberg, Sedona, et al.);
  * nothing else in this repo reaches into Spark internals.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
