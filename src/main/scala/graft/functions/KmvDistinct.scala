package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the PORTABLE
  * approximate-distinct: unlike HLL (whose register layout and hash are
  * engine-specific, so `agg_approx_distinct` can only be rows-checked),
  * KMV over an md5-derived 32-bit hash is exactly reproducible in ANY
  * engine, so the whole sketch is DuckDB-oracle-checkable bit-for-bit.
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002): with U(k) the kth smallest of n distinct
  * uniform hashes, E[U(k)] ≈ k/(n+1), so n̂ = (k−1)/U(k) is (nearly)
  * unbiased; σ/n ≈ 1/√(k−2). The estimate is computed in pure INTEGER
  * arithmetic — floor((k−1)·2³² / h(k)) — so no float ever crosses the
  * engine boundary.
  *
  * Scale shape: the buffer is ≤k sorted distinct hashes (O(k) state) and
  * the Aggregator is map-side combinable — partials merge associatively in
  * any tree, the property that makes KMV the sketch you ship to 1000
  * executors (vs the exact distinct's full (group, key) shuffle). Groups
  * with fewer than k distinct hashes return the EXACT count (the sketch IS
  * the full hash set there). Most rows short-circuit on `h ≥ buffer.last`
  * without allocating.
  *
  * NEGATIVE inputs are skipped as "no value": the one-scan multi-column
  * profile (`op_table_profile_sketch`) feeds every column's md5-derived
  * hash through `coalesce(h, -1)`, so a NULL cell neither trips the
  * primitive-Long input encoder nor counts as a distinct value (real
  * hashes are conv() of 8 hex digits — always in [0, 2³²), so the skip
  * is a no-op for the grouped distinct op). This keeps N sketches riding
  * ONE Aggregate with no Expand, where the exact profile's multi-distinct
  * pays rows × (n_cols+1) through the shuffle. The profile uses k=256
  * (σ ≈ 6%) — a CBO stats pass wants tighter cardinalities than the 13%
  * the grouped k=64 sketch accepts — and `KmvSketchProps` proves the
  * sentinel, exactness, and merge laws for all k.
  */
class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, Long] {
  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf =
    if (h < 0L) b else insert(b, h)

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    b.hs.foldLeft(a)(insert)

  override def finish(b: KmvBuf): Long =
    if (b.hs.size < k) b.hs.size.toLong
    else ((k - 1).toLong << 32) / b.hs.last

  private def insert(b: KmvBuf, h: Long): KmvBuf = {
    val v = b.hs
    if (v.size == k && h >= v.last) b // common case: not among the k smallest
    else if (v.contains(h)) b // distinct semantics: duplicates collapse
    else {
      val grown = (v :+ h).sorted
      KmvBuf(if (grown.size > k) grown.take(k) else grown)
    }
  }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

case class KmvBuf(hs: Vector[Long])

/** The SURVEY §2.4 `agg_kmv_distinct` instance (k=64, σ ≈ 13%). */
object KmvDistinct extends KmvSketch(64)
