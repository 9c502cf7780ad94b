package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression counting equal positions of two
  * `array<bigint>` columns — the minhash signature-agreement kernel.
  *
  * This sits on the hottest row count in the engine: the banded LSH
  * equi-join evaluates it once per CANDIDATE pair (193 M rows at the
  * k=30 rehearsal), where the higher-order
  * `size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v))` form
  * allocates two intermediate arrays and evaluates two lambdas per row.
  * This expression reads both `ArrayData` in place inside whole-stage
  * codegen — same value, no allocation. Agreement count semantics over
  * the shared prefix length (signatures are fixed-width k=16 in every
  * caller, so the min() is defensive, not semantic).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sig_match"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sigMatchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.sigMatchCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}
