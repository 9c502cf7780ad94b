package graft

import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization rounds: print `.explain("formatted")`
  * for one or more registered queries against a corpus dir, so plan
  * shapes (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans) can be committed as evidence files under
  * plans/<round>/.
  *
  * Usage: runMain graft.PlanDump <baseDir> <query> [query...]
  *
  * Output per query is delimited by `=== plan: <name> ===` so a shell
  * loop can split one run into per-query files. The session mirrors
  * Bench's (master local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus,
  * UTC) so the printed plan is the one the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <baseDir> <query> [query...]")
    val base = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, base)
      println(s"=== plan: $name ===")
      // formatted mode: numbered operator list + per-operator details
      // (PushedFilters, ReadSchema, join type/build side, partitioning)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"=== end: $name ===")
    }
    spark.stop()
  }
}
