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

  /** Per-file (path, min, max) of an INT64 column read from parquet
    * FOOTER statistics alone — the zone-map build that touches no data
    * pages, so index (re)build cost is O(#files) metadata reads
    * regardless of table bytes (the production claim `op_zonemap_prune`'s
    * doc makes; at cluster scale the per-file loop distributes as a
    * mapPartitions over the path list, same statistics calls). Row-group
    * stats are merged per file; all-null row groups contribute nothing.
    * A file with NO usable statistics for the column throws loudly: the
    * callers derive data-global query bounds from these stats, and a
    * silent sentinel range would desynchronize them from the oracle's
    * true min/max. (A production zone map would instead mark such a file
    * always-selected — selection correctness never depends on the map —
    * but Spark-written INT64 parquet always carries min/max.)
    */
  def footerLongStats(spark: SparkSession, paths: Seq[String], column: String)
      : Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    paths.flatMap { ps =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(ps), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        if (blocks.forall(_.getRowCount == 0L)) None // rowless: never selectable
        else {
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var any = false
          blocks.foreach { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .foreach { chunk =>
                val st = chunk.getStatistics
                if (st != null && !st.isEmpty && st.hasNonNullValue) {
                  mn = math.min(mn, st.genericGetMin.asInstanceOf[Number].longValue)
                  mx = math.max(mx, st.genericGetMax.asInstanceOf[Number].longValue)
                  any = true
                }
              }
          }
          if (!any) throw new IllegalStateException(
            s"no footer statistics for column $column in $ps")
          Some((ps, mn, mx))
        }
      } finally reader.close()
    }
  }

  /** Total row count of the given parquet files from FOOTER metadata
    * alone (sum of per-block row counts) — no data pages touched, so a
    * count is O(#files) metadata reads regardless of table bytes: the
    * metadata-only-count optimization every lakehouse runtime applies
    * to unfiltered `count(*)`. At cluster scale the loop distributes as
    * a mapPartitions over the path list, same footer calls.
    */
  def footerRowCount(spark: SparkSession, paths: Seq[String]): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    paths.map { ps =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(ps), conf))
      try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    }.sum
  }

  /** Immediate child directories of `dir` named `prefix*` (the
    * `col=value` dirs of a partitioned write), as (dirName, fullPath).
    */
  def listChildDirs(spark: SparkSession, dir: String, prefix: String)
      : Seq[(String, String)] = {
    val (fs, p) = resolve(spark, dir)
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => (st.getPath.getName, st.getPath.toString)).toSeq
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
