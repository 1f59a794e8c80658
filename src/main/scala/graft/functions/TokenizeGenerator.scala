package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** U1/J5 — the tokenizer as a native Catalyst [[Generator]]: the direct
  * Spark analogue of the reference's `SplitFunction` TableFunction
  * (app/func/SplitFunction.java:12-21 + the `LATERAL
  * TABLE(SplitFunction(item))` join,
  * app/dws/DwsTrafficSourceKeywordPageViewWindow.java:134-140).
  *
  * Versus the `udf + explode` form ([[Tokenizer.tokenizeUdf]]): one
  * operator (`GenerateExec`) streams (row → words) directly with no
  * intermediate `ArrayData` materialization and no UDF-result
  * serialization round-trip — the same reason the reference uses a UDTF
  * instead of collecting a list per row. Generators sit outside
  * whole-stage codegen by design (CodegenFallback on the *generator* is
  * the normal pattern — GenerateExec itself supports codegen'd consumers),
  * so the parent/child pipelines still fuse.
  */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("word", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize() requires a string argument, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else Tokenizer.tokenize(t.toString)
      .map(w => InternalRow(UTF8String.fromString(w)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
