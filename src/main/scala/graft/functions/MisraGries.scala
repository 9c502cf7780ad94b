package graft.functions

import scala.collection.mutable

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS'12): a fixed-capacity
  * counter map over a stream of items with the guarantee that after
  * observing n items, every item's counter underestimates its true count
  * by at most n/(capacity+1) — so every item with true frequency
  * > n/(capacity+1) is PRESENT in the summary. Merging two summaries
  * (counter-wise add, then decrement all by the (capacity+1)-th largest
  * counter and drop non-positives) preserves the guarantee over the
  * combined stream, which is exactly what a map-side-combine /
  * tree-aggregate over partitions needs: each executor keeps O(capacity)
  * state regardless of partition cardinality, and the driver merges
  * 32 (or 1000) small maps — never the full token distribution.
  *
  * This is the candidate-PRESCREEN half of `agg_heavy_hitters_mg`; the
  * operator's second pass re-counts only the surviving candidates
  * exactly, so the final output is deterministic and oracle-checkable.
  */
final class MisraGries(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  private[functions] val counters = mutable.Map.empty[String, Long]

  /** Exact total stream weight observed (adds and merges both carry it),
    * so callers get the n of the n/(capacity+1) guarantee without a
    * second counting pass.
    */
  var total: Long = 0L

  def add(item: String, weight: Long = 1L): this.type = {
    require(weight >= 0, "negative weights unsupported")
    // a zero-weight insert would plant a 0-valued counter that makes the
    // eviction decrement (min of counter values) permanently 0, silently
    // dropping every later new item — treat it as the no-op it is
    if (weight == 0) return this
    total += weight
    counters.get(item) match {
      case Some(c) => counters(item) = c + weight
      case None if counters.size < capacity => counters(item) = weight
      case None =>
        // decrement-all by the largest amount that frees a slot: the
        // standard batched form (min counter vs incoming weight)
        val dec = math.min(weight, counters.values.min)
        if (dec > 0) {
          val dead = counters.iterator
            .filter(_._2 <= dec).map(_._1).toList
          counters.mapValuesInPlace((_, c) => c - dec)
          dead.foreach(counters.remove)
        }
        val rem = weight - dec
        if (rem > 0 && counters.size < capacity) counters(item) = rem
    }
    this
  }

  /** Mergeable-summaries COMBINE: add counter-wise; if over capacity,
    * subtract the (capacity+1)-th largest counter value from every
    * counter and drop the non-positive ones.
    */
  def merge(other: MisraGries): this.type = {
    total += other.total
    other.counters.foreach { case (k, v) =>
      counters(k) = counters.getOrElse(k, 0L) + v
    }
    if (counters.size > capacity) {
      val cut = counters.values.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity) // (capacity+1)-th largest
      val dead = counters.iterator.filter(_._2 <= cut).map(_._1).toList
      counters.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(counters.remove)
    }
    this
  }

  /** Surviving candidate items (a superset of every item with true
    * frequency > n/(capacity+1)).
    */
  def candidates: Set[String] = counters.keySet.toSet

  /** Counter value for an item (0 if evicted/never seen): underestimates
    * the true count by at most total/(capacity+1).
    */
  def estimate(item: String): Long = counters.getOrElse(item, 0L)

  def size: Int = counters.size
}
