package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column plan-agnostic (ColumnNode); the conversion
  * helpers live in `org.apache.spark.sql.classic` with `private[sql]`
  * visibility, so this one-file shim sits under org.apache.spark.sql
  * to re-export them for graft's native expressions (graft.plans.*).
  */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a LogicalPlan into a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Broadcast the driver's Hadoop configuration for executor-side
    * filesystem/footer access (SerializableConfiguration is
    * private[spark]).
    */
  def broadcastHadoopConf(sc: org.apache.spark.SparkContext)
      : org.apache.spark.broadcast.Broadcast[_ <: java.io.Serializable] =
    org.apache.spark.util.SerializableConfiguration.broadcast(sc)

  def confOf(b: org.apache.spark.broadcast.Broadcast[_]): org.apache.hadoop.conf.Configuration =
    b.value.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value

  /** Register a builder under `name` in the session's function
    * registry so TEXT SQL can call graft's native expressions.
    * Idempotent (createOrReplace).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
