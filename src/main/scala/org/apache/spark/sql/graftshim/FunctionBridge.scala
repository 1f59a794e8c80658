package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers a function builder on an ALREADY-RUNNING session — the same
  * (name, info, builder) triple [[graft.GraftExtensions]] injects at
  * session build time via `spark.sql.extensions`. Session-state access is
  * `private[sql]`, hence this one-call bridge (see [[ColumnBridge]]). */
object FunctionBridge {
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
    ()
  }
}
