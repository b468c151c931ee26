package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge: `classic.ExpressionUtils` (Column <-> Expression
  * in Spark 4's ColumnNode world) is private[sql], and graft's custom
  * Catalyst expressions need it to surface as Columns. Standard extension
  * pattern for libraries that ship native expressions without a
  * FunctionRegistry round-trip.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function builder on an ALREADY-BUILT session (the
    * `SparkSessionExtensions` path only runs at session construction).
    * `sessionState` is private[sql], hence the bridge.
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** The block-backed RDD behind a localCheckpoint'ed Dataset (its analyzed
    * plan is a LogicalRDD). Dataset.unpersist only reaches CacheManager
    * entries, so freeing a superseded checkpoint generation (e.g. iterative
    * connected-components labels) needs the RDD itself.
    */
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
