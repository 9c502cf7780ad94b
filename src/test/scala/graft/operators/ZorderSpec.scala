package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave correctness + the actual pruning
  * claim — a 2-D box predicate over the z-ordered layout must skip more
  * row groups (scan `numOutputRows`) than the same predicate over a
  * 1-D-sorted control layout of the same data.
  */
class ZorderSpec extends SparkSpec {

  private def z(x: Long, y: Long, bits: Int): Long =
    spark.range(1).select(
      SourceOps.zInterleave(lit(x), lit(y), bits).as("z"))
      .head().getLong(0)

  test("zInterleave puts x bits at even, y bits at odd positions") {
    assert(z(3, 0, 2) == 5L)   // 11  -> 0101
    assert(z(0, 3, 2) == 10L)  // 11  -> 1010
    assert(z(5, 6, 3) == 57L)  // 101/110 -> 111001
    assert(z(0, 0, 12) == 0L)
    // full 12-bit range stays within 24 bits
    assert(z(4095, 4095, 12) == (1L << 24) - 1)
  }

  /** Rows the executed scan emitted (post row-group skipping, pre
    * post-scan filter).
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    finalPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes a 2-D box at least as well as a 1-D sort, and strictly vs full scan") {
    val li = graft.Tables.read(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    val total = li.count()
    // box selective in BOTH dims (~20% each) so two-dimensional
    // clustering has something to win
    def box(df: DataFrame): DataFrame =
      df.filter(col("l_partkey").between(10, 50) &&
        col("l_suppkey").between(2, 3))
    val matching = box(li).count()

    val zDir = graft.util.TempDirs.create("zspec_z").toString
    SourceOps.zorderWrite(li, "l_partkey", "l_suppkey", zDir)
    val zRows = scanRows(box(spark.read.parquet(zDir)))

    val cDir = graft.util.TempDirs.create("zspec_c").toString
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(cDir)
    val cRows = scanRows(box(spark.read.parquet(cDir)))

    // row-group stats must actually skip: the z scan reads a strict
    // subset of the data, no more than the 1-D control, and both layouts
    // preserve the exact matching rows
    assert(zRows >= matching && cRows >= matching)
    assert(zRows < total, s"z layout skipped nothing ($zRows of $total)")
    assert(zRows <= cRows, s"z layout ($zRows rows) worse than 1-D sort ($cRows)")
    assert(box(spark.read.parquet(zDir)).count() == matching)
  }

  test("registry op matches the direct aggregate over the original table") {
    val got = SourceOps.opZorderLayout.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = graft.Tables.read(spark, sf, "lineitem")
      .filter(col("l_partkey").between(10, 50) && col("l_suppkey").between(2, 8))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }
}
