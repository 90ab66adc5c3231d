package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (classic.ExpressionUtils). Needed to
  * expose graft's native Catalyst expressions through the public
  * Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Register a native expression under a SQL name in an EXISTING
    * session (the SparkSessionExtensions path only applies at session
    * construction). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Parse SQL text to an unresolved logical plan with the session's
    * own parser (private[sql] behind sessionState). */
  def parseSql(spark: SparkSession,
      sql: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(sql)

  /** The session's resolved broadcast threshold in BYTES (the SQLConf
    * accessor is private[sql]; the raw conf string may be a byte-size
    * form like "10MB"). −1 = broadcast disabled. */
  def autoBroadcastBytes(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf
      .autoBroadcastJoinThreshold
}
