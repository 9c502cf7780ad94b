package graft.operators

import graft.SparkSpec

/** Edge-case specs for the round-12 surface additions, on a synthetic
  * events corpus (the oracle certifies corpus-scale agreement; these pin
  * the semantic corners a dense corpus may never hit).
  */
class AsofEntropySpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.util.TempDirs.create("asof_entropy")
    def ns(sec: Long) = sec * 1000000000L
    val rows = Seq(
      // user 1: signups 10 s before and 5 s after the click — forward wins
      (100L, 1L, "click", ns(100)),
      (1L, 1L, "signup", ns(90)), (2L, 1L, "signup", ns(105)),
      // user 2: exactly equidistant — tie prefers the backward side
      (200L, 2L, "click", ns(100)),
      (3L, 2L, "signup", ns(95)), (4L, 2L, "signup", ns(105)),
      // user 3: only a (much) later signup
      (300L, 3L, "click", ns(100)), (5L, 3L, "signup", ns(250)),
      // user 4: no signup at all — null match
      (400L, 4L, "click", ns(100)),
      // user 5: signup exactly at the click — delta 0 via the backward frame
      (500L, 5L, "click", ns(100)), (6L, 5L, "signup", ns(100)))
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(d.resolve("events.parquet").toString)
    d.toString
  }

  test("join_asof_nearest: direction, tie→backward, one-sided, empty, equal-ts") {
    val got = Joins.joinAsofNearest.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))).toMap
    val us = 1000000L
    assert(got(100L) == ((2L, 5L * us)), s"forward nearer must win: ${got(100L)}")
    assert(got(200L) == ((3L, -5L * us)), s"tie must prefer backward: ${got(200L)}")
    assert(got(300L) == ((5L, 150L * us)))
    assert(got(400L) == ((-1L, Long.MinValue)), "no signup → null match")
    assert(got(500L) == ((6L, 0L)), "equal timestamp matches with delta 0")
  }

  test("asof family: NULL user_id rows are excluded, never matched to each other") {
    import spark.implicits._
    // Window.partitionBy groups NULL keys into one partition, which would
    // match a NULL-user click to a NULL-user signup — a SQL equi-join
    // never matches NULLs, so the family filters NULL keys up front
    // (mirrored in the oracles). NULL-user rows must not appear AT ALL.
    def ns(sec: Long) = sec * 1000000000L
    val rows = Seq[(Long, Option[Long], String, Long)](
      (100L, None, "click", ns(100)), (1L, None, "signup", ns(95)),
      (200L, Some(2L), "click", ns(100)), (2L, Some(2L), "signup", ns(90)))
    val d = graft.util.TempDirs.create("asof_nulluser")
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(d.resolve("events.parquet").toString)
    Seq(Joins.joinAsofBackward, Joins.joinAsofForward, Joins.joinAsofNearest)
      .foreach { q =>
        val got = q.fn(spark, d.toString).select("event_id").collect()
          .map(_.getLong(0)).toSet
        assert(got == Set(200L), s"${q.name}: got $got")
      }
  }

  test("ts_interval_union: a long interval swallows non-consecutive short ones") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("iv_union")
    def minNs(m: Long) = m * 60000000000L
    // dur_minutes = event_id % 120 + 1. User 1: A opens [0, 60m); B sits
    // inside A; C starts at 50m — AFTER B has ended (a consecutive-gap
    // sessionizer with any threshold < 35m would split here) but still
    // under A's umbrella, so the running-max merge keeps one island.
    // E at 120m starts past every end → second island.
    val rows = Seq(
      (59L, 1L, "click", minNs(0)),   // A: [0, 60m)
      (4L, 1L, "click", minNs(10)),   // B: [10m, 15m) ⊂ A
      (9L, 1L, "click", minNs(50)),   // C: [50m, 60m) — gap from B, inside A
      (2L, 1L, "click", minNs(120)))  // E: [120m, 123m) — new island
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(d.resolve("events.parquet").toString)
    val got = PipelineOps.tsIntervalUnion.fn(spark, d.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4))) // start, end, n
    assert(got.toSeq == Seq(
      (0L, 3600000000L, 3L),            // [0, 60m] with A, B, C
      (7200000000L, 7380000000L, 1L)),  // [120m, 123m]
      s"got ${got.toSeq}")
  }

  test("agg_skew_kurt_manual: zero-variance group yields NULL, not NaN") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("skew_degenerate")
    Seq(
      (1L, 1L, "flat", 1000000000L, 5.0), (2L, 1L, "flat", 2000000000L, 5.0),
      (3L, 1L, "var", 3000000000L, 1.0), (4L, 1L, "var", 4000000000L, 3.0),
      (5L, 2L, "var", 5000000000L, 8.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.parquet(d.resolve("events.parquet").toString)
    val got = Aggregations.aggSkewKurtManual.fn(spark, d.toString).collect()
      .map(r => r.getString(0) -> ((r.isNullAt(3), r.isNullAt(4)))).toMap
    // Spark would render 0/0 as NaN while DuckDB renders NULL (and errors
    // on sqrt of a cancellation-negative m2) — the guard makes both NULL
    assert(got("flat") == ((true, true)), s"constant group: $got")
    assert(got("var") == ((false, false)))
  }

  test("agg_entropy: term-rounded decimal sums — skewed, uniform, degenerate") {
    val got = Aggregations.aggEntropy.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // 1 click + 2 signups: round(-(1/3)ln(1/3),6) + round(-(2/3)ln(2/3),6)
    assert(got(1L)._1 == 3 && got(1L)._2 == 2 && near(got(1L)._3, 0.636514))
    assert(near(got(2L)._3, 0.636514))
    // 1+1 uniform: 2 · round((1/2)ln 2, 6)
    assert(near(got(3L)._3, 0.693148) && near(got(5L)._3, 0.693148))
    // single event type: entropy exactly 0
    assert(got(4L) == ((1L, 1L, 0.0)))
  }
}
