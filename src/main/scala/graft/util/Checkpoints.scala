package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for iterative DataFrame algorithms.
  *
  * `localCheckpoint` materializes to executor block storage — fast, but
  * NOT fault-tolerant: the truncated lineage cannot be recomputed, so on
  * a real cluster a single lost executor kills a long iterative job with
  * no recovery path. Reliable `checkpoint()` writes to the
  * SparkContext's checkpoint directory (HDFS / object store in
  * production) and survives executor loss, at the cost of a filesystem
  * round-trip per materialization.
  *
  * The choice is a session conf, not a code change: every iterative op
  * (cluster label propagation, star contraction, PageRank, shared
  * signature builds) truncates through [[truncate]], and
  * `spark.graft.reliableCheckpoints=true` flips them all to reliable
  * checkpoints. Durability of the checkpoint location is the caller's
  * contract: a real deployment sets `SparkContext.setCheckpointDir` to a
  * fault-tolerant path first; if none is set, a [[TempDirs]] directory
  * is installed so the reliable path works out of the box on a
  * single-node session (durable across executor loss there, since
  * local[*] executors share the driver's filesystem).
  *
  * Disk-growth note for reliable mode: Spark only deletes checkpoint
  * data when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * (default false; a context-creation-time setting), so each truncation
  * leaves a snapshot of the working set in the checkpoint dir for the
  * job's lifetime. The iterative ops here run FIXED small round counts
  * (≤ 30), bounding growth at rounds × working-set; a long-lived
  * deployment driving many reliable jobs should enable the cleaner conf
  * on its session or recycle its checkpoint directory between jobs.
  */
object Checkpoints {
  val Flag = "spark.graft.reliableCheckpoints"

  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get(Flag, "false").toBoolean) {
      val sc = s.sparkContext
      // benign race: concurrent first callers both install a temp dir and
      // one wins — checkpoints land in whichever is current at write time
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(TempDirs.create("graft_checkpoint").toString)
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** `df.truncated` — postfix sugar so call sites read like the
    * `localCheckpoint()` they replace.
    */
  implicit final class Truncate(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = Checkpoints.truncate(df)
  }
}
