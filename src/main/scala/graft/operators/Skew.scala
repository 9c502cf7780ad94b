package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi join (SURVEY §4.3 "salting for skew").
  *
  * When one join key carries a disproportionate share of the big side, the
  * single shuffle partition owning it becomes the straggler. Salting
  * splits each key into `buckets` sub-keys: the big side gets a
  * DETERMINISTIC salt derived from a caller-supplied unique column (never
  * `rand()` — retries/speculative tasks must produce identical rows), the
  * small side replicates each row across all salts, and the join key
  * becomes (key, salt) — spreading the hot key over `buckets` partitions.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; explicit
  * salting remains the tool when AQE can't help (aggregation-after-join
  * keyed on the same column, or non-AQE engines downstream).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 bigSaltSource: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__graft_salt",
      pmod(xxhash64(bigSaltSource), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("__graft_salt",
      explode(expr(s"sequence(0L, ${buckets - 1}L)")))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__graft_salt") === replicatedSmall("__graft_salt"))
      .drop("__graft_salt")
  }
}
