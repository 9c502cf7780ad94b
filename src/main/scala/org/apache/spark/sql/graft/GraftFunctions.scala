package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

import graft.functions.{BigramCounts, CosineSimilarity, FirstBandMatch, LshBucket, SigMatchCount, Simhash60}

/** Registration shim living in the `org.apache.spark.sql` namespace so it
  * can reach `sessionState.functionRegistry` (which is `private[sql]`) —
  * the standard pattern for Spark extension libraries that must register
  * native expressions on an ALREADY-BUILT session (e.g. the driver-owned
  * Verify/Bench sessions, which we cannot configure with
  * `spark.sql.extensions`). New sessions should prefer
  * [[graft.GraftExtensions]].
  */
object GraftFunctions {

  /** Idempotently register the graft native expressions. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_lsh_bucket", exprs => LshBucket(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash60", exprs => Simhash60(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bigram_counts", exprs => BigramCounts(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sig_match", exprs => SigMatchCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_first_band_match",
      exprs => FirstBandMatch(exprs(0), exprs(1), exprs(2)), "built-in")
    // Spark's own bloom-filter aggregate + probe are implemented but NOT
    // exposed in the public function registry (they back the optimizer's
    // runtime row-group filtering); surfacing them here gives the dedup /
    // decontamination prescreens a mergeable O(KB) sketch without any UDF
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
