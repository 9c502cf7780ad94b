package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

import graft.functions.CosineSimilarity

/** Registration shim living in the `org.apache.spark.sql` namespace so it
  * can reach `sessionState.functionRegistry` (which is `private[sql]`) —
  * the standard pattern for Spark extension libraries that must register
  * native expressions on an ALREADY-BUILT session (e.g. the driver-owned
  * Verify/Bench sessions, which we cannot configure with
  * `spark.sql.extensions`). New sessions should prefer
  * [[graft.GraftExtensions]].
  */
object GraftFunctions {

  /** Idempotently register the `graft_cosine` native expression. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}
