package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column ↔ Expression conversions
  * (Spark 4 removed the public `Column.expr` / `new Column(expr)`). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-bind a DataFrame's logical plan to another session (e.g. a
    * cloneSession() carrying per-write confs) — `Dataset.ofRows` is
    * private[sql], hence this bridge. */
  def onSession(s: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)

  /** Copy of the session sharing the SparkContext with an independent
    * conf — `cloneSession` is private[sql] in Spark 4. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
