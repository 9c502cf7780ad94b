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
    * nanosAsLong conf in Tables.read).
    */
  def streamTable(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val schema = graft.Tables.read(spark, sfDir, name).schema
    spark.readStream.schema(schema).parquet(s"$sfDir/$name.parquet")
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
