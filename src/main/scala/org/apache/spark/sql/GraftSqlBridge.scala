package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is
  * `private[sql]`). This is the supported pattern for libraries adding
  * native Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the async listener bus (private[spark]) so task-metric
    * listeners see every completed task before a measurement is read.
    */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
