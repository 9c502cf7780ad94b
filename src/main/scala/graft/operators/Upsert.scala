package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ReplacingMergeTree-style keyed upsert semantics (SURVEY §2.1).
  *
  * The reference materializes state as "latest row version per key"
  * (`ENGINE = ReplacingMergeTree() ORDER BY user_id`, reference
  * `setup.sh:63,136-137`) with merge-order-dependent tie-breaking; we impose
  * a deterministic total version order (version desc, then tiebreak desc) —
  * a documented strengthening (SURVEY §3.3).
  *
  * Scale note: one shuffle on the key (window partition), no global sort.
  * At 100 TB the key-partitioned window is the canonical Spark dedup plan;
  * AQE handles skewed keys. `row_number` (not `rank`) keeps exactly one row.
  */
object Upsert {

  /** Keep the latest row per key: version desc, tiebreaks desc. */
  def latestByKey(df: DataFrame, key: Seq[Column], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply a CDC op-log with the reference's delete semantics: tombstones are
    * dropped before they ever reach the sink (`tombstones.on.delete=false` +
    * `drop.tombstones`, reference `setup.sh:94,107`), so state = latest
    * non-delete row per key.
    */
  def applyCdc(opLog: DataFrame, opCol: Column, key: Seq[Column],
               version: Seq[Column]): DataFrame =
    latestByKey(opLog.filter(opCol =!= lit("d")), key, version)

  /** Apply a CDC op-log WITH delete propagation — the semantics the
    * reference demonstrably lacks (its `setup.sh:192-197` probes a delete
    * but never asserts it reached the sink; `drop.tombstones` guarantees
    * it cannot): the key's state is its latest row version, and if that
    * latest op is a delete the key is absent from the sink. Same single
    * key-partitioned window shuffle as [[applyCdc]] — the delete filter
    * is applied AFTER picking the latest version, so a delete followed by
    * a re-insert (higher version) correctly resurrects the key.
    */
  def applyCdcWithDeletes(opLog: DataFrame, opCol: Column, key: Seq[Column],
                          version: Seq[Column]): DataFrame =
    latestByKey(opLog, key, version).filter(opCol =!= lit("d"))
}
