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

  test("stream-stream join: watermark slack recovers an out-of-order file replay") {
    import java.nio.file.Files
    import spark.implicits._
    val H = 3600000000000L // 1 h in nanos (events.ts unit)
    // The hazard is PARTNER-STATE EVICTION, not a late-row drop (the join
    // stores and matches even late inputs): click B and its signup S2 sit
    // 90 h before the first replayed file's events, and arrive in two
    // DIFFERENT later micro-batches — by then the watermark (advanced to
    // ~98 h by the first file) has evicted B's join state, so S2 finds no
    // partner. Same-batch partners always match, which is why disorder
    // must straddle batches within a side's own stream.
    val f0 = Seq((101L, 1L, "click", 100L * H), (201L, 1L, "signup", 100L * H + H / 2))
    val f1 = Seq((103L, 2L, "click", 10L * H))
    val f2 = Seq((203L, 2L, "signup", 10L * H + H / 2))
    val dir = graft.util.TempDirs.create("graft_ooo_replay")
    val table = dir.resolve("events.parquet")
    Files.createDirectories(table)
    Seq(f0, f1, f2).zipWithIndex.foreach { case (rows, i) =>
      StreamingOps.writeSingleFile(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        dir.resolve(s"tmp$i"), table.resolve(s"f$i.parquet"),
        mtime = (i + 1) * 1000000L)
    }
    def joinRows(watermark: String) = StreamingOps
      .streamStreamJoinFrames(spark, dir.toString, watermark,
        maxFilesPerTrigger = Some(1))
      .select("click_id", "signup_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // live-sized watermark: batch 1's max event time (100 h) advances the
    // watermark past batch 2's older rows — the B–S2 pair is silently lost
    val dflt = joinRows("2 hours")
    assert(dflt == Set(101L -> 201L), s"expected only the on-time pair, got $dflt")
    // slack ≥ the replay's event-time disorder recovers the batch join
    val slack = joinRows("745 hours")
    assert(slack == Set(101L -> 201L, 103L -> 203L), s"got $slack")
  }

  test("left outer: unmatched click emits via eviction; matched beyond cutoff kept") {
    import java.nio.file.Files
    import spark.implicits._
    val H = 3600000000000L
    // one batch: u1 matched pair @10h, u2 click @20h with NO signup, u3
    // matched pair @200h (pushes the final watermark to ~198h so u2's
    // unmatched claim resolves; its own null row needs the no-data batch)
    val rows = Seq(
      (101L, 1L, "click", 10L * H), (201L, 1L, "signup", 10L * H + H / 2),
      (102L, 2L, "click", 20L * H),
      (103L, 3L, "click", 200L * H), (203L, 3L, "signup", 200L * H + H / 2),
      (204L, 4L, "signup", 30L * H)) // signup with no click at all
    val dir = graft.util.TempDirs.create("graft_louter")
    val table = dir.resolve("events.parquet")
    Files.createDirectories(table)
    StreamingOps.writeSingleFile(
      rows.toDF("event_id", "user_id", "event_type", "ts"),
      dir.resolve("tmp0"), table.resolve("f0.parquet"), mtime = 1000000L)
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(4))).toSet
    // u3's matched pair sits beyond the resolution cutoff but matched rows
    // are definitive; u2 resolves to a genuine unmatched null row; u4's
    // orphan signup is invisible to the LEFT outer…
    val left = shape(StreamingOps.streamStreamLeftOuterFrames(spark, dir.toString))
    assert(left == Set((101L, 201L, false), (102L, -1L, true),
      (103L, 203L, false)), s"got $left")
    // …and emits as a null-click row from the FULL outer's signup side
    val full = shape(StreamingOps.streamStreamOuterFrames(
      spark, dir.toString, "full_outer", 2, None))
    assert(full == Set((101L, 201L, false), (102L, -1L, true),
      (103L, 203L, false), (-1L, 204L, true)), s"got $full")
  }

  test("one-sided corpus: outer joins emit nothing (no side ever resolves)") {
    import java.nio.file.Files
    import spark.implicits._
    val H = 3600000000000L
    // A corpus missing one side entirely never advances that side's
    // watermark, so the stream evicts nothing and emits nothing. The
    // cutoff must therefore be MinValue when EITHER side is absent —
    // computing it with least(max_c, max_g) would be wrong because least
    // SKIPS nulls: with clicks spanning 100 h the old cutoff resolved
    // clicks older than ~97 h into unmatched rows the stream never emits
    // (the batch oracle mirrors this via its CASE-wrapped max_t).
    def oneSided(kind: String): (Set[Any], Set[Any]) = {
      val rows = Seq((101L, 1L, kind, 10L * H), (102L, 2L, kind, 100L * H))
      val dir = graft.util.TempDirs.create(s"graft_onesided_$kind")
      val table = dir.resolve("events.parquet")
      Files.createDirectories(table)
      StreamingOps.writeSingleFile(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        dir.resolve("tmp0"), table.resolve("f0.parquet"), mtime = 1000000L)
      (StreamingOps.streamStreamLeftOuterFrames(spark, dir.toString)
        .collect().toSet,
        StreamingOps.streamStreamOuterFrames(spark, dir.toString,
          "full_outer", 2, None).collect().toSet)
    }
    val (lc, fc) = oneSided("click")
    assert(lc.isEmpty && fc.isEmpty, s"clicks-only: got left=$lc full=$fc")
    val (ls, fs) = oneSided("signup")
    assert(ls.isEmpty && fs.isEmpty, s"signups-only: got left=$ls full=$fs")
  }

  test("left outer replay disorder: evicted partner emits a FALSE unmatched row; slack recovers") {
    import java.nio.file.Files
    import spark.implicits._
    val H = 3600000000000L
    // f0 (20h pair) replays FIRST and advances the live watermark past f1's
    // older click; f3's 300h pair pushes the final cutoff beyond everything
    val files = Seq(
      Seq((111L, 1L, "click", 20L * H), (211L, 1L, "signup", 20L * H + H / 2)),
      Seq((112L, 2L, "click", 10L * H)),
      Seq((212L, 2L, "signup", 10L * H + H / 2)),
      Seq((113L, 3L, "click", 300L * H), (213L, 3L, "signup", 300L * H + H / 2)))
    val dir = graft.util.TempDirs.create("graft_louter_ooo")
    val table = dir.resolve("events.parquet")
    Files.createDirectories(table)
    files.zipWithIndex.foreach { case (rows, i) =>
      StreamingOps.writeSingleFile(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        dir.resolve(s"tmp$i"), table.resolve(s"f$i.parquet"),
        mtime = (i + 1) * 1000000L)
    }
    def outer(wmHours: Int) = StreamingOps
      .streamStreamLeftOuterFrames(spark, dir.toString, wmHours,
        maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getBoolean(4))).toSet
    // live slack: batch 1's 20h watermark evicts u2's click before its
    // signup replays — the outer join doesn't just lose the pair, it
    // asserts a false negative
    val live = outer(2)
    assert(live == Set((111L, 211L, false), (112L, -1L, true),
      (113L, 213L, false)), s"got $live")
    // slack ≥ the replay disorder: the pair matches; no null row survives
    // (with this much slack no unmatched claim is resolvable — matched
    // rows, being definitive, all emit)
    val slack = outer(745)
    assert(slack == Set((111L, 211L, false), (112L, 212L, false),
      (113L, 213L, false)), s"got $slack")
  }

  test("streaming KMV state merges across micro-batches ≡ one-pass batch sketch") {
    import java.nio.file.Files
    import spark.implicits._
    // 3 micro-batches with overlapping user sets, 150 distinct users
    // total (> k=64, so the merged state crosses the exact→saturated
    // boundary ACROSS batches — the case a per-batch sketch gets wrong)
    val dir = graft.util.TempDirs.create("graft_kmvstream")
    val table = dir.resolve("events.parquet")
    Files.createDirectories(table)
    def batch(lo: Long, hi: Long, idBase: Long) =
      (lo to hi).map(u => (idBase + u, u, "click", 1000000000L * u))
    Seq(batch(1, 60, 0), batch(31, 90, 100000), batch(61, 150, 200000))
      .zipWithIndex.foreach { case (rows, i) =>
        StreamingOps.writeSingleFile(
          rows.toDF("event_id", "user_id", "event_type", "ts"),
          dir.resolve(s"tmp$i"), table.resolve(s"f$i.parquet"),
          mtime = 1000000L + i * 1000)
      }
    // maxFilesPerTrigger = 1 forces THREE micro-batches, so the
    // (Array[Long], n_upd) state tuple genuinely round-trips the state
    // store and the max_by serial selection is exercised (n_upd reaches 3)
    val got = StreamingOps.streamDistinctUsersKmvFrames(spark, dir.toString, Some(1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = udaf(graft.functions.KmvDistinct)
    val expect = spark.read.parquet(table.toString)
      .select(col("event_type"),
        graft.functions.PortableHash.hash32(col("user_id")).as("hv"))
      .groupBy(col("event_type")).agg(kmv(col("hv")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"stream $got vs batch $expect")
    // and the estimate is sane for 150 true distincts at sigma ~13%
    val est = got("click")
    assert(est > 100 && est < 220, s"estimate $est wildly off 150")
  }

  test("stream_mv_maintenance: 4-batch replay merges to the one-shot MV") {
    // 4-file layout → 4 micro-batches at maxFilesPerTrigger=1: the merge
    // must be batch-split-invariant ((sum, count) partials are
    // associative-commutative; decimal-cast before summation keeps the
    // arithmetic exact under ANY grouping)
    val dir = graft.util.TempDirs.create("mv_maint_fixture")
    Tables.read(spark, sf, "events")
      .repartition(4)
      .write.parquet(dir.resolve("events.parquet").toString)
    val multi = graft.streaming.StreamingOps
      .mvMaintainedState(spark, dir.toString, Some(1))
    val oneShot = Tables.read(spark, dir.toString, "events")
      .groupBy(expr("(ts div 1000) div 86400000000").as("day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("event_type"), col("day"), col("n_rows"), col("total_value"))
    assert(multi.exceptAll(oneShot).isEmpty && oneShot.exceptAll(multi).isEmpty,
      "multi-batch MV state differs from the single-pass aggregate")
  }

  test("stream_scd2_apply: 4-batch replay with interleaved times equals full rebuild") {
    // repartition(4) scatters rows RANDOMLY across the 4 micro-batch
    // files, so later batches carry event times EARLIER than already-
    // closed intervals — the late-data case the full-history rebuild of
    // touched keys must absorb
    val dir = graft.util.TempDirs.create("scd2_stream_fixture")
    Tables.read(spark, sf, "events")
      .repartition(4)
      .write.parquet(dir.resolve("events.parquet").toString)
    val multi = graft.streaming.StreamingOps
      .scd2MaintainedState(spark, dir.toString, Some(1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val oneShot = Tables.read(spark, dir.toString, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        expr("ts div 1000").as("ts_us"))
      .withColumn("valid_from_us", col("ts_us"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
    assert(multi.exceptAll(oneShot).isEmpty && oneShot.exceptAll(multi).isEmpty,
      "multi-batch SCD2 state differs from the full-history rebuild")
  }
}
