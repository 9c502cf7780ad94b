package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 60-bit simhash of a string — the
  * codegen'd replacement for the former ScalaUDF around
  * [[VectorMath.simhash60]] (same whitespace tokenization, same
  * md5-prefix token hashes, bit-identical output), keeping
  * `llm_dedup_simhash`'s fingerprint stage inside whole-stage codegen
  * while the md5-prefix hash keeps the fingerprint DuckDB-portable.
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    VectorMath.simhash60(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.simhash60($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}
