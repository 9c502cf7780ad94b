package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool for the optimization rounds (like [[PlanDump]]): run one or
  * more registered STREAMING queries and print every micro-batch's
  * progress JSON — the durationMs breakdown (addBatch / getBatch /
  * commitOffsets / walCommit) and the stateOperators metrics (rows,
  * memory, commit time, the custom per-provider metrics) — so "where do
  * the streaming seconds go" is answered from the engine's own telemetry
  * instead of guessed. Optional conf overrides (`k=v` args containing
  * `=`) are applied to the session BEFORE the op runs, so provider A/Bs
  * (HDFS- vs RocksDB-backed state store) run the identical op body.
  *
  * Usage: runMain graft.StreamProbe <baseDir> <query|k=v> [...]
  *
  * Pseudo-args (never passed to the session): `scale=K` replays against
  * the [[Scale.buildScaled]] k× corpus with [[Scale.replayFns]]'
  * replay-disorder watermark overrides — the realistic-state-size leg of
  * a state-store provider A/B; `mode=dense|sharded` picks the replication
  * flavor; `reps=N` repeats each query (warm reps matter at k×).
  */
/** Registered by class name via `spark.sql.streaming.streamingQueryListeners`
  * so EVERY session — including the tuned child session the ops actually
  * stream on — reports to it (a listener added to the parent's manager
  * never sees the child's queries).
  */
class ProbeListener extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    println(s"PROGRESS ${e.progress.json}")
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProbe <baseDir> <query|conf=v> [...]")
    val base = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (kvs, queries) = args.drop(1).partition(_.contains("="))
    val pseudo = Set("scale", "mode", "reps")
    val (pseudoKvs, confs) = kvs.partition(kv => pseudo(kv.split("=", 2)(0)))
    val pmap = pseudoKvs.map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val scaleK = pmap.getOrElse("scale", "1").toInt
    val scaleMode = pmap.getOrElse("mode", "dense")
    val reps = pmap.getOrElse("reps", "1").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        classOf[ProbeListener].getName)
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (scaleK > 1) Scale.buildScaled(spark, base, scaleK, scaleMode)
              else base
    queries.foreach { name =>
      val fn = if (scaleK > 1)
        Scale.replayFns.getOrElse(name, SparkEntry.queries(name))
      else SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        println(s"=== query: $name rep $rep (scale=$scaleK) ===")
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"=== done: $name rep=$rep rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s ===")
      }
    }
    // listener events are async; give the bus a moment before exiting
    Thread.sleep(2000)
    spark.stop()
  }
}
