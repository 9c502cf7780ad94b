package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedAvgSpec extends SparkSpec {

  test("weighted average with decimal-exact accumulation") {
    import spark.implicits._
    val wavg = udaf(WeightedAvg)
    val df = Seq((1.0, 10.0), (3.0, 20.0)).toDF("w", "x")
    val out = df.agg(wavg(col("w"), col("x"))).head().getDouble(0)
    assert(out == (1.0 * 10 + 3.0 * 20) / 4.0) // 17.5
  }

  test("zero total weight yields NaN, not a crash") {
    import spark.implicits._
    val wavg = udaf(WeightedAvg)
    val df = Seq((0.0, 10.0)).toDF("w", "x")
    assert(df.agg(wavg(col("w"), col("x"))).head().getDouble(0).isNaN)
  }

  test("merge order cannot change the result (decimal buffer)") {
    val rows = (1 to 100).map(i => (i.toDouble % 7 + 0.01, i * 1.37))
    val seq = rows.foldLeft(WeightedAvg.zero)((b, r) => WeightedAvg.reduce(b, r))
    val (l, r) = rows.splitAt(37)
    val split = WeightedAvg.merge(
      l.foldLeft(WeightedAvg.zero)((b, x) => WeightedAvg.reduce(b, x)),
      r.foldLeft(WeightedAvg.zero)((b, x) => WeightedAvg.reduce(b, x)))
    assert(WeightedAvg.finish(seq) == WeightedAvg.finish(split))
  }
}
