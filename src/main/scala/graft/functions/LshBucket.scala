package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the sign-LSH bucket of an `array<float>`
  * vector under `nBits` deterministic Rademacher hyperplanes — same
  * custom-`Expression`-with-`doGenCode` tier as [[CosineSimilarity]], so
  * the LSH bucket assignment of `llm_ann_lsh_topk` stays inside
  * whole-stage codegen instead of dropping to a per-row ScalaUDF.
  *
  * Semantics are exactly [[VectorMath.lshBucket]] (the planes come from
  * the same md5-prefix derivation — DuckDB-portable, see
  * [[VectorMath.planeComponent]]), reading the columnar `ArrayData` in
  * place.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }) && right.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, int) arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, nBits: Any): Any =
    VectorMath.lshBucketArrayData(v.asInstanceOf[ArrayData], nBits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, nBits) =>
      s"graft.functions.VectorMath.lshBucketArrayData($v, $nBits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucket =
    copy(left = newLeft, right = newRight)
}
