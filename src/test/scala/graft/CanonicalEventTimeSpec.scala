package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.types._

/** Pins the `events.ts` canonicalization contract (Tables Scaladoc): no
  * matter which physical type the driver corpus ships — INT64
  * TIMESTAMP(NANOS) read as long under nanosAsLong, or the regenerated
  * TIMESTAMP(MICROS)/TimestampNTZ layout that silently broke 50 registry
  * queries in round 16 — `Tables.read(_, _, "events")` presents ONE
  * logical schema: `ts` as epoch-nanoseconds LongType, bit-identical to
  * the DuckDB oracles' `epoch_us(ts) * 1000` under the pinned UTC session.
  */
class CanonicalEventTimeSpec extends SparkSpec {

  test("TimestampNTZ events layout is canonicalized to epoch-nanos long") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("canon_ntz")
    // 2024-01-01T00:00:07.179575 UTC = 1704067207179575 µs since epoch
    val wall = LocalDateTime.of(2024, 1, 1, 0, 0, 7, 179575000)
    Seq((1L, wall, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.parquet(d.resolve("events.parquet").toString)
    val got = Tables.read(spark, d.toString, "events")
    assert(got.schema("ts").dataType == LongType)
    assert(got.select("ts").as[Long].head() == 1704067207179575000L)
  }

  test("long-ts events layout passes through untouched") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("canon_long")
    Seq((1L, 1704067207179575000L, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(d.resolve("events.parquet").toString)
    val got = Tables.read(spark, d.toString, "events")
    assert(got.schema("ts").dataType == LongType)
    assert(got.select("ts").as[Long].head() == 1704067207179575000L)
  }

  test("driver corpus reads canonical under both Verify and Bench configs") {
    val got = Tables.read(spark, sf, "events")
    assert(got.schema("ts").dataType == LongType,
      s"driver corpus ts must canonicalize to LongType, got ${got.schema("ts").dataType}")
    // sanity: values land in the corpus's 2024-01 window, in NANOS
    val mn = got.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
    assert(mn > 1700000000L * 1000000000L && mn < 1710000000L * 1000000000L,
      s"min ts $mn is not 2024-01 epoch-nanos")
  }

  test("canonicalization is session-time-zone independent") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("canon_tz")
    val wall = LocalDateTime.of(2024, 1, 1, 0, 0, 7, 179575000)
    Seq((1L, wall, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.parquet(d.resolve("events.parquet").toString)
    // a sibling session deliberately NOT pinned to UTC: the wall-clock
    // field construction must yield the identical canonical nanos — the
    // silent 8-hour shift a session-zone cast would introduce is the
    // failure mode this pins
    val offZone = spark.newSession()
    offZone.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val got = Tables.read(offZone, d.toString, "events")
    assert(got.schema("ts").dataType == LongType)
    assert(got.select("ts").collect().head.getLong(0) == 1704067207179575000L,
      "canonical ts must not depend on the session time zone")
  }

  test("eventsRange bounds are session-time-zone independent on both timestamp layouts") {
    import spark.implicits._
    // 2024-01-01T00:00:07.179575Z, as both an NTZ wall-clock and an instant
    val us = 1704067207179575L
    val wall = LocalDateTime.of(2024, 1, 1, 0, 0, 7, 179575000)
    val inst = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
    val dNtz = graft.util.TempDirs.create("range_tz_ntz")
    Seq((1L, wall, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.parquet(dNtz.resolve("events.parquet").toString)
    val dLtz = graft.util.TempDirs.create("range_tz_ltz")
    Seq((1L, inst, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dLtz.resolve("events.parquet").toString)
    assert(spark.read.parquet(dLtz.resolve("events.parquet").toString)
      .schema("ts").dataType == TimestampType)
    // a session NOT pinned to UTC: a zone-dependent bound would shift the
    // pushed window by -8h and flip which of these two queries sees the row
    val offZone = spark.newSession()
    offZone.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    for (d <- Seq(dNtz, dLtz)) {
      val hit = Tables.eventsRange(offZone, d.toString, us - 1000000L, us + 1000000L)
      assert(hit.count() == 1L, s"±1s window around the row must match in $d")
      assert(hit.select("ts").collect().head.getLong(0) == us * 1000L)
      val miss = Tables.eventsRange(offZone, d.toString, us + 1000000L, us + 2000000L)
      assert(miss.count() == 0L, s"disjoint window must not match in $d")
    }
  }

  test("streamed events source carries the canonical schema too") {
    val ss = graft.streaming.StreamRunner
      .streamTable(spark, sf, "events")
    assert(ss.schema("ts").dataType == LongType,
      s"file-stream events ts must be canonical long, got ${ss.schema("ts").dataType}")
  }
}
