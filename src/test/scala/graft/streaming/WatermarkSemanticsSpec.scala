package graft.streaming

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Pins the ENGINE's watermark semantics for append-mode streaming
  * aggregation — the contract `stream_watermark_late`'s oracle encodes.
  *
  * Measured behavior (Spark 4.1): the watermark bounds STATE LIFETIME
  * and APPEND EMISSION, not input admission. A row arriving behind the
  * watermark still merges into its window when that window's state has
  * not yet been finalized, because eviction is evaluated AFTER the
  * batch's merge; the emitted set is exactly the windows whose end ≤
  * final watermark. If a Spark upgrade starts dropping late input rows
  * pre-merge (the stricter reading of the docs), these pins fail loudly
  * and the op's oracle must change with them.
  */
class WatermarkSemanticsSpec extends SparkSpec {

  private val Hr = 3600000000000L // ns

  private def writeOne(rows: Seq[(Long, Long, Long)], dir: java.nio.file.Path,
                       name: String, mtime: Long): Unit = {
    import spark.implicits._
    val tmp = dir.resolve(s"tmp_$name")
    rows.toDF("event_id", "user_id", "ts").coalesce(1)
      .write.parquet(tmp.toString)
    val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dst = dir.resolve("stream").resolve(name)
    Files.createDirectories(dst.getParent)
    Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
  }

  private def runHourly(streamDir: java.nio.file.Path): Map[Long, Long] = {
    val child = StreamRunner.tunedSession(spark)
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("ts", LongType)))
    val agg = child.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "1 hour")).agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("win_start_us"), col("cnt"))
    val name = s"wm_sem_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = child.table(name).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    child.sql(s"DROP TABLE IF EXISTS $name")
    out
  }

  test("late rows merge into a NEVER-SEEN window; trailing windows stay unfinalized") {
    val d = graft.util.TempDirs.create("wm_sem1")
    writeOne(Seq((10L, 1L, 2 * Hr), (11L, 1L, 3 * Hr), (12L, 1L, 4 * Hr),
      (13L, 1L, 5 * Hr + Hr / 2)), d, "f1.parquet", 1000000L)
    writeOne(Seq((1L, 1L, 10L), (2L, 1L, 20L)), d, "f2.parquet", 2000000L)
    val got = runHourly(d.resolve("stream"))
    // bucket 0 (late file) emits IN FULL — not dropped; final watermark =
    // 5.5 h − 10 min, so buckets 2..4 finalize and bucket 5 never does
    assert(got == Map(0L -> 2L, 7200000000L -> 1L, 10800000000L -> 1L,
      14400000000L -> 1L), s"got $got")
  }

  test("late rows merge into an ALREADY-AGGREGATED window before its eviction emits once") {
    val d = graft.util.TempDirs.create("wm_sem2")
    writeOne(Seq((9L, 1L, Hr / 2), (10L, 1L, 2 * Hr), (11L, 1L, 3 * Hr),
      (12L, 1L, 4 * Hr), (13L, 1L, 5 * Hr + Hr / 2)), d, "f1.parquet", 1000000L)
    writeOne(Seq((1L, 1L, 10L), (2L, 1L, 20L)), d, "f2.parquet", 2000000L)
    val got = runHourly(d.resolve("stream"))
    // bucket 0 emits EXACTLY ONCE with on-time + late rows merged (3):
    // eviction is evaluated after the batch's merge, so the late batch's
    // rows are folded in before the append emission
    assert(got == Map(0L -> 3L, 7200000000L -> 1L, 10800000000L -> 1L,
      14400000000L -> 1L), s"got $got")
  }
}
