package org.apache.spark.sql.graftbridge
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard mechanism Spark extension libraries use to lift a custom
  * Catalyst Expression into the public Column API without a function
  * registry. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function on an EXISTING session's registry (the
    * `SparkSessionExtensions` route only applies at session build time,
    * and the Verify/Bench harness does not own session construction). */
  def registerFunction(spark: SparkSession, name: String,
      info: expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
