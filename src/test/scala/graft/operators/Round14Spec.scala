package graft.operators

import graft.SparkSpec

/** Semantic corner pins for the round-14 additions. */
class Round14Spec extends SparkSpec {

  test("src_cdc_quarantine: three failure classes route exactly; good checksum exact") {
    import spark.implicits._
    // event_id 0 → truncated JSON (unparseable), 97·1+... careful: classes
    // are event_id mod 97 — use 0 (truncate), 1 (payload-less), 2
    // (tombstone), and 3..6 as clean rows. Tombstones appear in NEITHER
    // leg; the quarantine legs carry a NULL checksum; the good leg's
    // checksum is the exact event_id sum 3+4+5+6.
    val rows = Seq[(Long, Long, String, Long)](
      (0L, 10L, "click", 1000000000L), (1L, 11L, "view", 2000000000L),
      (2L, 12L, "click", 3000000000L), (3L, 13L, "view", 4000000000L),
      (4L, 14L, "click", 5000000000L), (5L, 15L, "purchase", 6000000000L),
      (6L, 16L, "view", 7000000000L))
    val d = graft.util.TempDirs.create("r14_cdcq")
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(d.resolve("events.parquet").toString)
    val got = SourceOps.srcCdcQuarantine.fn(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      ("missing_payload", 1L, -1L),
      ("ok", 4L, 18L),
      ("unparseable_json", 1L, -1L)), s"got ${got.toSeq}")
  }
}
