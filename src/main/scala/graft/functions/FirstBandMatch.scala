package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression returning the FIRST band index at which two
  * fixed-width minhash signatures fully agree (bands of `rowsPerBand`
  * consecutive positions; -1 when no band matches).
  *
  * This is the standard LSH duplicate-suppression trick made codegen'd:
  * a banded self-join emits one candidate row per MATCHING band, so the
  * same pair surfaces up to `bands` times and a distinct/groupBy over
  * all candidates — 2.3 GB of pair shuffle at the k=30 rehearsal — is
  * needed to dedup. Filtering each candidate row on
  * `first_band_match(sig1, sig2, rows) = band` keeps exactly ONE
  * representative per pair (the lowest matching band) with no exchange
  * at all: the pair set is identical by construction, and it also
  * subsumes the per-band slice-equality verification (the returned band
  * matched by definition, so a band-hash collision can never satisfy
  * the equality).
  */
case class FirstBandMatch(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_first_band_match"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val sigsOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (sigsOk && third.dataType == IntegerType && third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, int literal), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any, r: Any): Any =
    VectorMath.firstBandMatch(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, r) =>
      s"graft.functions.VectorMath.firstBandMatch($a, $b, $r)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): FirstBandMatch =
    copy(first = newFirst, second = newSecond, third = newThird)
}
