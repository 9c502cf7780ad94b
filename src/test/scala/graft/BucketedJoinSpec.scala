package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing proof (SURVEY §4.3 "bucketed writes for repeated key joins"):
  * two tables bucketed on the join key join WITHOUT a shuffle exchange on
  * either side — the co-location survives in the physical plan. This is
  * the 100 TB pattern for repeated fact⋈fact joins: pay the partitioned
  * write once, skip the shuffle on every subsequent join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val loc = Files.createTempDirectory("graft_bucketed")
    try {
      val o = Tables.read(spark, sf, "orders")
      val c = Tables.read(spark, sf, "customer")
      o.write.mode("overwrite")
        .option("path", s"$loc/orders_b")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      c.write.mode("overwrite")
        .option("path", s"$loc/customer_b")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      // disable broadcast so the join strategy decision is about shuffles
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val plan = spark.table("orders_b")
          .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
          .queryExecution.executedPlan.toString()
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not reshuffle either side:\n$plan")
      }
      // and the result is still correct
      val n = joined.count()
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      graft.util.TempDirs.deleteRecursively(loc)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
