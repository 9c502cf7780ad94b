package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.4 `op_udaf_weighted_avg`): weighted average
  * with decimal-exact accumulation, as an `Aggregator[IN,BUF,OUT]`.
  *
  * Accumulates SUM(w*x) and SUM(w) as decimals (order-independent, so the
  * partial/final merge tree Spark builds at scale cannot change the result),
  * dividing only once at `finish`. Inputs are rounded to DECIMAL(18,2)
  * exactly like the oracle's CAST, so the aggregate equals
  * `SUM(w_dec * x_dec) / SUM(w_dec)` computed in any order.
  */
case class WAvgBuf(sumWX: JBigDecimal, sumW: JBigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  private def dec2(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

  override def zero: WAvgBuf = WAvgBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
    val (w, x) = in
    WAvgBuf(b.sumWX.add(dec2(w).multiply(dec2(x))), b.sumW.add(dec2(w)))
  }

  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.sumWX.add(b.sumWX), a.sumW.add(b.sumW))

  override def finish(b: WAvgBuf): Double =
    if (b.sumW.signum() == 0) Double.NaN
    else b.sumWX.doubleValue() / b.sumW.doubleValue()

  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
