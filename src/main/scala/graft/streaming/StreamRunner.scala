package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Utilities to run a Structured Streaming pipeline to completion over the
  * finite test corpus and hand back its result as a batch DataFrame.
  *
  * The pattern is the real one used at scale — `readStream` → transforms →
  * `writeStream` with checkpointing — executed with `Trigger.AvailableNow`
  * so the driver's batch-oriented Verify/Bench harness can consume it. The
  * memory sink is test-scale only; the production sink is
  * `foreachBatch` / files (see StreamingOps.foreachBatchUpsert).
  */
object StreamRunner {
  private val counter = new AtomicInteger(0)

  /** Stream a corpus parquet table. File streaming needs an explicit schema,
    * so the batch reader supplies it (also triggering the `events`
    * nanosAsLong conf in Tables.read). The corpus table is a single parquet
    * FILE and Spark's file-stream source only accepts directories ("Option
    * 'basePath' must be a directory"), so the file is exposed through a
    * per-run temp directory via symlink — the production shape is a
    * partitioned directory anyway.
    */
  def streamTable(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val schema = graft.Tables.read(spark, sfDir, name).schema
    val dir = graft.util.TempDirs.create(s"graft_stream_src_$name")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve(s"$name.parquet"),
      java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
    spark.readStream.schema(schema).parquet(dir.toString)
  }

  /** Run a streaming DataFrame to completion into an in-memory table and
    * return the (batch) result. `outputMode` is "append" for row streams,
    * "complete" for streaming aggregations.
    */
  def runToTable(streamed: DataFrame, outputMode: String): DataFrame = {
    val spark = streamed.sparkSession
    val qn = s"graft_stream_${counter.incrementAndGet()}"
    val query = streamed.writeStream
      .format("memory")
      .queryName(qn)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(qn)
  }
}
