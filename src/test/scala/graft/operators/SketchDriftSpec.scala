package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable-HLL and KS-drift ops: accuracy, mergeability, and the
  * distributed prefix scan against exact driver references.
  */
class SketchDriftSpec extends SparkSpec {

  test("HLL partial-union estimate is near exact and equals the whole-table sketch") {
    val e = graft.Tables.read(spark, sf, "events")
    val exact = e.select(count_distinct(col("user_id"))).head().getLong(0)
    val row = Aggregations.aggHllSketchUnion.fn(spark, sf).head()
    val est = row.getLong(2)
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"union estimate $est vs exact $exact")
    assert(row.getLong(1) == e.count(), "n_rows must cover every event")
    // register-wise max ⇒ union of per-day partials == one whole-table sketch
    val whole = e.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    assert(est == whole, s"partial-union $est != whole-table sketch $whole")
  }

  test("HLL union estimate is invariant under repartitioning") {
    val e = graft.Tables.read(spark, sf, "events").select(col("user_id"))
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
        .head().getLong(0)
    val base = est(e)
    Seq(1, 7, 32).foreach(n => assert(est(e.repartition(n)) == base))
  }

  test("prefixScan2 equals the sequential prefix sums, at any partitioning") {
    import spark.implicits._
    val data = (1 to 500).map(i => (i.toDouble / 3, (i * 7 % 5).toLong,
      (i * 11 % 3).toLong))
    val expected = data.sortBy(_._1)
      .scanLeft((0.0, 0L, 0L, 0L, 0L)) { case ((_, _, _, a, b), (v, x, y)) =>
        (v, x, y, a + x, b + y)
      }.tail.map { case (v, x, y, a, b) => (v, x, y, a, b) }
    Seq(1, 4, 13).foreach { n =>
      val got = Aggregations.prefixScan2(
        data.toDF("value", "c1", "c2").repartition(n), "value", "c1", "c2")
        .collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(got.toSeq == expected, s"input partitions=$n")
    }
  }

  test("KS statistic matches the exact driver reference") {
    val e = graft.Tables.read(spark, sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "click"))
    val s1 = e.filter(_._2).map(_._1).sorted
    val s2 = e.filterNot(_._2).map(_._1).sorted
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val values = (s1 ++ s2).distinct.sorted
    val dScaled = values.map { v =>
      val r1 = s1.count(_ <= v).toLong
      val r2 = s2.count(_ <= v).toLong
      math.abs(r1 * n2 - r2 * n1)
    }.max
    val row = Aggregations.aggKsTwoSample.fn(spark, sf).head()
    assert((row.getLong(0), row.getLong(1)) == ((n1, n2)))
    assert(row.getLong(2) == dScaled,
      s"scaled D ${row.getLong(2)} vs reference $dScaled")
    assert(row.getDouble(3) == dScaled.toDouble / (n1 * n2))
  }

  test("KS of a distribution against itself is zero") {
    import spark.implicits._
    val vals = (1 to 200).map(_.toDouble / 7)
    val byVal = (vals.map((_, 1L, 0L)) ++ vals.map((_, 0L, 1L)))
      .toDF("value", "is1", "is2")
      .groupBy("value")
      .agg(sum("is1").as("c1"), sum("is2").as("c2"))
    val scanned = Aggregations.prefixScan2(byVal, "value", "c1", "c2")
    val d = scanned
      .agg(max(abs(col("r1") * lit(200L) - col("r2") * lit(200L))))
      .head().getLong(0)
    assert(d == 0L)
  }
}
