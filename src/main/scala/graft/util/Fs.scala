package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for the sink/maintenance operators' small
  * metadata probes (input-byte sizing for compaction, did-the-write-
  * publish-partitions for MV refresh). `java.io.File` worked on the
  * sandbox's local FS but silently lists NOTHING on `hdfs://` / `s3a://`
  * paths; this is the cluster-portable spelling of the same O(#files)
  * listing, resolved through the session's own Hadoop configuration —
  * the round-15 review note closed.
  */
object Fs {
  private def resolve(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Total bytes of the dir's immediate `part-*` data files. */
  def partFileBytes(spark: SparkSession, dir: String): Long = {
    val (fs, p) = resolve(spark, dir)
    fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
  }

  /** Immediate `part-*` data file paths of `dir` (fully qualified, the
    * spelling `spark.read.parquet(paths: _*)` accepts).
    */
  def listPartFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = resolve(spark, dir)
    fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).toSeq
  }

  /** Whether `dir` exists and contains at least one immediate child
    * directory named `prefix*` — the did-the-partitioned-write-publish-
    * anything probe (a write of an empty frame leaves only _SUCCESS).
    */
  def hasChildDir(spark: SparkSession, dir: String, prefix: String): Boolean = {
    val (fs, p) = resolve(spark, dir)
    fs.exists(p) && fs.listStatus(p)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
  }
}
