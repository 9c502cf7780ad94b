package graft.operators

import graft.SparkSpec

/** Pins [[Windows.winCumulativeDistinct]]'s NULL-type contract: the byType
  * window orders `event_type` ASC NULLS LAST explicitly, because Spark's
  * ASC default is NULLS FIRST while DuckDB's is NULLS LAST — with the
  * default, a NULL run lands at the partition head where `lag` is also
  * NULL and `eqNullSafe(NULL, NULL)` is true, so the NULL group would be
  * counted ZERO times on the Spark side while the oracle counts it once.
  * With NULLS LAST pinned on both sides, a NULL run following any non-null
  * type is flagged exactly once, and an all-NULL partition counts zero in
  * both engines (matching count(DISTINCT)'s null-exclusion at the limit).
  */
class WindowsNullSpec extends SparkSpec {

  test("win_cumulative_distinct counts a NULL type run exactly once") {
    import java.nio.file.Files
    import spark.implicits._
    val U = 1000L // ts is nanos in the corpus; op divides to µs
    // user 1: a, NULL, a, b, NULL → running distinct 1, 2, 2, 3, 3
    // user 2: NULL, NULL → all-NULL partition counts zero → 0, 0
    val rows = Seq[(Long, Long, Option[String], Long)](
      (1L, 1L, Some("a"), 10L * U), (2L, 1L, None, 20L * U),
      (3L, 1L, Some("a"), 30L * U), (4L, 1L, Some("b"), 40L * U),
      (5L, 1L, None, 50L * U),
      (6L, 2L, None, 10L * U), (7L, 2L, None, 20L * U))
    val dir = graft.util.TempDirs.create("graft_windist_null")
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val got = Windows.winCumulativeDistinct.fn(spark, dir.toString)
      .select("event_id", "n_distinct_types").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 3L,
      6L -> 0L, 7L -> 0L)
    assert(got == expected, s"got $got")
  }
}
