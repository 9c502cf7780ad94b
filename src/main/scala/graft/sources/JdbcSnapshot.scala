package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC snapshot source — the production path of the reference's initial
  * snapshot (`snapshot.mode=initial`, reference `setup.sh:92` reads the
  * whole Postgres table before streaming).
  *
  * Scale: a single-connection JDBC read is one task; `partitioned` splits
  * the table into `numPartitions` range predicates on a numeric key so the
  * snapshot parallelizes across executors — the knob that matters when the
  * snapshot is TBs. Predicate/column pruning still push into the remote
  * database through the JDBC source.
  */
object JdbcSnapshot {

  /** Whole-table snapshot over one connection (small tables / dims). */
  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  /** Range-partitioned snapshot: `numPartitions` parallel readers over
    * `[lower, upper]` of `partitionColumn`.
    */
  def partitioned(spark: SparkSession, url: String, table: String,
                  partitionColumn: String, lower: Long, upper: Long,
                  numPartitions: Int,
                  props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
    props.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }
}
