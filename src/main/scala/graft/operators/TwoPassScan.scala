package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

import graft.util.Checkpoints.Truncate

/** Generic two-pass distributed ordered scan — the one implementation
  * behind `Aggregations.prefixScan2` (running sums for the KS statistic)
  * and `PipelineOps.rankScan` (vocabulary rank + coverage), so the subtle
  * machinery lives exactly once.
  *
  * Pass 1 range-partitions by `sortExprs`, sorts within partitions, and
  * folds each partition to ONE state value `S` collected to the driver
  * (O(#partitions), never data). The per-partition states are prefix-
  * combined into the offset each partition starts from, plus the grand
  * total, and broadcast back. Pass 2 re-runs the same local scan, emitting
  * one output row per input row from (grand, running state, row). No
  * single-partition exchange anywhere — the plan holds at any cardinality.
  *
  * The range partitioning is materialized ONCE (`Checkpoints.truncate`)
  * because both passes must see the identical partition layout — a lazy
  * recompute could re-sample different range boundaries under pass 2 and
  * the broadcast offsets would be wrong. `sortExprs` must induce a TOTAL
  * order over the rows (callers pre-aggregate to distinct keys) so the
  * result is partitioning-independent.
  */
private[operators] object TwoPassScan {

  def apply[S: ClassTag](df: DataFrame, sortExprs: Seq[Column],
                         outSchema: StructType, zero: S,
                         add: (S, Row) => S, combine: (S, S) => S,
                         emit: (S, S, Row) => (Row, S)): DataFrame = {
    val s = df.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .truncated
    val totals = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.foldLeft(zero)(add)))
    }.collect().sortBy(_._1).map(_._2)
    val grand = totals.foldLeft(zero)(combine)
    val offsets = totals.scanLeft(zero)(combine).init // totals of partitions < i
    val bc = s.sparkContext.broadcast(offsets)
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var st = bc.value(i)
      it.map { r =>
        val (out, st2) = emit(grand, st, r)
        st = st2
        out
      }
    }
    s.createDataFrame(rows, outSchema)
  }
}
