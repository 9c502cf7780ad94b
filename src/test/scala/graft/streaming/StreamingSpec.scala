package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Upsert

/** Streaming properties (SURVEY §5.2): incremental execution must equal
  * batch execution on the same input (Structured Streaming, SIGMOD 2018),
  * and the foreachBatch upsert must be idempotent under replay.
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch aggregation (sf0.001)") {
    val streamed = graft.streaming.StreamingOps.streamTumblingCount.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.read(spark, sf, "events")
      .groupBy(expr("ts div 3600000000000").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming dedup equals batch DISTINCT (sf0.001)") {
    val streamed = graft.streaming.StreamingOps.streamDedupKeys.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.read(spark, sf, "events")
      .select("event_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("mapGroupsWithState running max/count equals batch groupBy (sf0.001)") {
    val streamed = graft.streaming.StreamingOps.streamStatefulRunningMax.fn(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val batch = Tables.read(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(max(col("value")).as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState per-type counts equal batch groupBy (sf0.001)") {
    val streamed = graft.streaming.StreamingOps.streamFlatmapTypeCounts.fn(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val batch = Tables.read(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("foreachBatch upsert state equals the batch latest-by-key (sf0.001)") {
    val streamed = graft.streaming.StreamingOps.streamForeachBatchUpsert.fn(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.read(spark, sf, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
    val batch = Upsert.latestByKey(ev, Seq(col("user_id")),
        Seq(col("ts_us"), col("event_id")))
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
