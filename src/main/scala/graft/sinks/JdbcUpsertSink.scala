package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** Keyed JDBC upsert sink for `writeStream.foreachBatch` — the Spark-native
  * materialization of the reference's sink leg (Kafka Connect ClickHouse
  * sink + ReplacingMergeTree dedup, reference `setup.sh:63,128-137`): each
  * micro-batch is applied as DELETE-by-key + INSERT inside one transaction
  * per partition, so replaying a batch (at-least-once delivery,
  * `setup.sh:101-103,144-147`) converges to the same state — idempotent
  * upsert, the same effect the reference gets from merge-time dedup.
  *
  * Contract: the batch must be key-unique (run
  * [[graft.operators.Upsert.latestByKey]] upstream — the deterministic
  * strengthening of the reference's version-less merge, SURVEY §3.3) and
  * batches are applied in micro-batch order (Structured Streaming
  * guarantees this under checkpointing).
  *
  * Scale: work happens on executors via `foreachPartition` — one
  * connection + two prepared statements per partition, JDBC batch API,
  * nothing on the driver. Partition count = upstream shuffle partitions.
  */
object JdbcUpsertSink {

  /** Build a foreachBatch function writing to `table` keyed by `keyCols`. */
  def upsertBatch(url: String, table: String, keyCols: Seq[String])
      : (DataFrame, Long) => Unit = (batch, _) => {
    val cols = batch.schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"key $keyCols not in $cols")
    batch.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(
            s"DELETE FROM $table WHERE " +
              keyCols.map(k => s"$k = ?").mkString(" AND "))
          val ins = conn.prepareStatement(
            s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
              s"(${cols.map(_ => "?").mkString(", ")})")
          rows.foreach { r =>
            keyCols.zipWithIndex.foreach { case (k, i) =>
              del.setObject(i + 1, r.getAs[Any](k))
            }
            del.addBatch()
            cols.zipWithIndex.foreach { case (c, i) =>
              ins.setObject(i + 1, r.getAs[Any](c))
            }
            ins.addBatch()
          }
          del.executeBatch()
          ins.executeBatch()
          conn.commit()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally conn.close()
      }
    }
  }
}
