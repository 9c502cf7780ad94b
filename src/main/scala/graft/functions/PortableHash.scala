package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The cross-engine 32-bit hash every KMV consumer shares: the first 8
  * md5 hex digits of the value's string rendering, parsed as an integer —
  * reproducible bit-for-bit in DuckDB as
  * `CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8)) AS BIGINT)`,
  * which is what makes the whole KMV family oracle-checkable. ONE
  * definition: the batch sketches, the sketch-partial MV, and the
  * streaming sketch all oracle against the same DuckDB rendering, so a
  * drift in any copy (e.g. widening the hex prefix) would silently
  * desynchronize stream state from batch sketches.
  */
object PortableHash {

  /** Uniform hash in [0, 2³²); NULL in → NULL out. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  /** Uniform hash in [0, 2⁶⁰) — the first 15 md5 hex digits, the widest
    * prefix that parses into a signed BIGINT on both engines without
    * overflow. DuckDB rendering:
    * `CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT)`.
    * Used where a consumer needs a near-64-bit space (the minhash
    * signatures' min-over-hashes, where 32-bit collisions would bias the
    * Jaccard estimator) AND cross-engine reproducibility.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** The DuckDB rendering of [[hash60]] over a SQL string expression —
    * ONE definition for every oracle builder (minhash signatures,
    * simhash fingerprints, sign-LSH planes), so a prefix-width change
    * cannot silently desynchronize one oracle family from the engine.
    *
    * Minimum oracle-side DuckDB: **0.10** — the `'0x…'` VARCHAR→BIGINT
    * hex cast this rendering relies on was added there. On an older
    * DuckDB every hash60-keyed oracle fails at once with a cast error;
    * if that ever appears across the whole LSH/sketch family
    * simultaneously, check the DuckDB version before suspecting the
    * engine. (Also noted in BASELINE.md.)
    */
  def duckDbHash60Sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** NULL values map to the KMV sketches' −1 "no value" skip sentinel. */
  def hash32OrSkip(c: Column): Column = coalesce(hash32(c), lit(-1L))
}
