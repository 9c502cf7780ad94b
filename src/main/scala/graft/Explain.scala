package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostic: run one registered query against a corpus dir (or a
  * k×-scaled rehearsal replica) and print the FINAL AQE physical plan —
  * the plan after adaptive re-optimization, which `.explain()` before
  * execution does not show. This is how a deep-k regime change (e.g. an
  * AQE broadcast-join conversion that exists at k=10 and vanishes at
  * k=30) is made visible instead of inferred from shuffle byte counts.
  *
  * Usage: runMain graft.Explain <query> <baseDir> [k] [mode]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <query> <baseDir> [k] [mode]")
    val name = args(0)
    val base = args(1)
    val k = if (args.length > 2) args(2).toInt else 1
    val mode = if (args.length > 3) args(3) else "dense"
    // same guard as Scale.main: a typo'd mode would silently fall through
    // buildScaled's default-to-dense branch while the header prints the typo
    require(mode == "dense" || mode == "sharded",
      s"mode must be 'dense' or 'sharded', got '$mode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (k == 1) base else Scale.buildScaled(spark, base, k, mode)
    val df = SparkEntry.queries(name)(spark, dir)
    val rows = df.count()
    println(s"=== $name @ k=$k ($mode): $rows rows; final adaptive plan ===")
    // executedPlan after an action reflects the finished AQE decisions
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
