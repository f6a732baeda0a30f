package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge: ExpressionUtils is private[sql] in Spark 4,
  * so libraries adding native Catalyst expressions expose it via a small
  * same-package object — the established pattern in public Spark
  * extensions (Delta, Sedona, Qbeast et al. all ship one). */
object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
