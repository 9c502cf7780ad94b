package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Upsert
import graft.streaming.StreamRunner

/** The broker-less continuous CDC leg (reference `setup.sh:92`
  * snapshot-then-WAL-stream): watermark-cursor polling micro-batches
  * from embedded Derby through the DSv2 [[JdbcCursorStreamProvider]].
  * Batch equivalence is the oracle, exactly like the file-source
  * streaming specs: the drained stream must reproduce the batch
  * snapshot read, bounded polls must tile the same rows disjointly, the
  * snapshot+overlap seam must upsert to the batch latest-per-key, and a
  * checkpointed restart must resume from the committed cursor.
  */
class JdbcCursorStreamSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftcursor;create=true"
  private val nSeed = 60

  /** 60 seed rows: id 1..60, cursor updated_us = 1000 + (id/3)*10 —
    * deliberate cursor TIES across id triples so the id tiebreak is
    * exercised — plus a TIMESTAMP payload column for the NTZ decode.
    */
  private def ensureSeed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(
        "CREATE TABLE user_events (id BIGINT NOT NULL PRIMARY KEY, " +
          "user_id BIGINT, event_type VARCHAR(20), value DOUBLE, " +
          "updated_us BIGINT, seen_at TIMESTAMP)")
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => return
      }
      val ps = conn.prepareStatement(
        "INSERT INTO user_events VALUES (?, ?, ?, ?, ?, ?)")
      (1 to nSeed).foreach { id =>
        ps.setLong(1, id.toLong)
        ps.setLong(2, (id % 7).toLong)
        ps.setString(3, if (id % 2 == 0) "click" else "view")
        ps.setDouble(4, id * 1.5)
        ps.setLong(5, 1000L + (id / 3) * 10)
        ps.setTimestamp(6, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2026, 1, 1, 0, 0, id % 60)))
        ps.executeUpdate()
      }
    } finally conn.close()
  }

  private def batchRows(): Set[(Long, Long, String, Double, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT id, user_id, event_type, value, updated_us FROM user_events")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3),
          r.getDouble(4), r.getLong(5))).toSet
    } finally conn.close()
  }

  test("cursor stream drains to the batch read (schema + rows + NTZ decode)") {
    ensureSeed()
    val streamed = StreamRunner.streamJdbcCursor(spark, url, "user_events")
    assert(streamed.isStreaming, "must be a streaming DataFrame")
    val got = StreamRunner.runToTable(streamed, "append")
    val rows = got.select("id", "user_id", "event_type", "value", "updated_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(rows == batchRows(), "drained stream must equal the batch read")
    // TIMESTAMP decodes as wall-clock NTZ micros (reference DateTime64
    // semantics, setup.sh:46) — spot-check one row's LocalDateTime
    val ts7 = got.filter(col("id") === 7)
      .select(col("seen_at").cast("string")).head().getString(0)
    assert(ts7 == "2026-01-01 00:00:07", s"NTZ decode drifted: $ts7")
  }

  test("bounded polls tile the table disjointly in (cursor, id) order") {
    ensureSeed()
    // drive the admission-control walk directly: 7-row polls must
    // advance the cursor strictly, tile all 60 rows with no overlap,
    // and drain to exactly the global max cursor
    val streamed = StreamRunner.streamJdbcCursor(spark, url, "user_events",
      maxRowsPerPoll = Some(7L))
    val cp = graft.util.TempDirs.create("graft_cursor_cp").toString
    val out = graft.util.TempDirs.create("graft_cursor_out").toString
    val q = streamed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val total = batchRows().size // sibling tests may have appended rows
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= total / 7,
      s"7-row polls over $total rows must take >=${total / 7} micro-batches, " +
        s"got ${progress.length}")
    assert(progress.forall(_.numInputRows <= 7),
      "admission control must bound every poll")
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0))
    assert(ids.length == total && ids.toSet.size == total,
      "bounded polls must tile the table exactly once (disjoint slices)")
  }

  test("snapshot-then-poll with overlap rewind upserts to batch latest-per-key") {
    ensureSeed()
    // the setup.sh:92 shape: snapshot everything at a cursor cut, then
    // poll from BELOW the cut (overlap rewind) — the keyed upsert must
    // absorb the replayed seam rows, landing on the batch ground truth
    val cutTs = 1100L
    val all = JdbcSnapshot.read(spark, url, "user_events")
      .select(col("ID").as("id"), col("USER_ID").as("user_id"),
        col("UPDATED_US").as("updated_us"))
    val snapshot = all.filter(col("updated_us") <= cutTs)
    val polled = StreamRunner.streamJdbcCursor(spark, url, "user_events",
        start = (cutTs - 50L, Long.MaxValue))
      .select(col("id"), col("user_id"), col("updated_us"))
    // re-root the drained rows on the parent session (the memory table
    // lives on StreamRunner's tuned child; unions must not mix sessions)
    val drained = StreamRunner.runToTable(polled, "append")
    val polledRows = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(drained.collect(): _*)),
      drained.schema)
    val merged = Upsert.latestByKey(snapshot.unionByName(polledRows),
      Seq(col("user_id")), Seq(col("updated_us"), col("id")))
    val expected = Upsert.latestByKey(all,
      Seq(col("user_id")), Seq(col("updated_us"), col("id")))
    assert(merged.collect().toSet == expected.collect().toSet,
      "seam-overlapped snapshot+poll must equal batch latest-per-key")
    // the overlap really replayed rows already in the snapshot (the
    // seam is live, not vacuously empty)
    val replayed = polledRows.filter(col("updated_us") <= cutTs).count()
    assert(replayed > 0, "overlap rewind must replay at least one seam row")
  }

  test("checkpointed restart resumes from the committed cursor") {
    ensureSeed()
    val cp = graft.util.TempDirs.create("graft_cursor_resume_cp").toString
    val out = graft.util.TempDirs.create("graft_cursor_resume_out").toString
    def drain(): Unit = {
      val q = StreamRunner.streamJdbcCursor(spark, url, "user_events")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val n1 = spark.read.parquet(out).count()
    assert(n1 >= nSeed, s"first drain must capture the seed rows, got $n1")
    // append 5 rows with a HIGHER cursor, restart on the same checkpoint
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        "INSERT INTO user_events VALUES (?, ?, 'late', 0.0, ?, NULL)")
      (1 to 5).foreach { k =>
        ps.setLong(1, 1000L + k); ps.setLong(2, k.toLong)
        ps.setLong(3, 99000L + k)
        ps.executeUpdate()
      }
    } finally conn.close()
    drain()
    val after = spark.read.parquet(out)
    assert(after.count() == n1 + 5,
      "restart must emit exactly the rows beyond the committed cursor")
    assert(after.select("id").collect().map(_.getLong(0)).toSet
      .count(_ > 1000L) == 5)
  }
}
