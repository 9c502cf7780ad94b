package graft.operators

import org.apache.spark.sql.functions.{col, expr}

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

  test("op_schema_ddl_fanout: catalog discovery covers the full inventory with identical DDL") {
    val fan = SourceOps.opSchemaDdlFanout.fn(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(fan.keySet == graft.Tables.all.toSet, s"discovered ${fan.keySet}")
    // the catalog-discovered DDL must equal the static-inventory render
    val static0 = SourceOps.opSchemaDdlTypemap.fn(spark, sf).collect()
      .filter(_.getString(0) == "graft")
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(fan == static0)
  }

  test("agg_kmv_distinct: exact under k, ~13% beyond k, partition-order independent") {
    import spark.implicits._
    import graft.functions.KmvDistinct
    val kmv = org.apache.spark.sql.functions.udaf(KmvDistinct)
    // group A: 10 distinct keys (< k=64) → EXACT count; group B: 5000
    // distinct keys → estimate within 4σ ≈ 50% of truth (σ≈13%); both
    // invariant under repartitioning (merge-tree independence)
    val rows = (1 to 10).map(i => ("A", i.toLong)) ++
      (1 to 5000).map(i => ("B", 100000L + i))
    def run(parts: Int) = rows.toDF("g", "k").repartition(parts)
      .select(col("g"),
        expr("cast(conv(substring(md5(cast(k as string)), 1, 8), 16, 10) as bigint)").as("h"))
      .groupBy(col("g")).agg(kmv(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run(8)
    assert(got("A") == 10L, s"under-k group must be exact: $got")
    assert(math.abs(got("B") - 5000.0) / 5000.0 < 0.5, s"estimate off: $got")
    assert(run(1) == got && run(32) == got,
      "KMV must be merge-order independent")
  }

  test("llm_ttr_stats: repeated tokens lower the ratio; singleton doc is 1.0") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("r14_ttr")
    Seq((1L, "a b a b a"), (2L, "x"), (3L, "p q r"))
      .toDF("doc_id", "text")
      .write.parquet(d.resolve("documents.parquet").toString)
    val got = LlmOps.llmTtrStats.fn(spark, d.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((5L, 2L, 0.4)), 2L -> ((1L, 1L, 1.0)),
      3L -> ((3L, 3L, 1.0))), s"got $got")
  }

  test("op_table_profile: nulls and distincts counted per column in one pass") {
    import spark.implicits._
    val d = graft.util.TempDirs.create("r14_profile")
    Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (2L, "b"), (null, "b"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(d.resolve("orders.parquet").toString)
    val got = SourceOps.opTableProfile.fn(spark, d.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // count(DISTINCT) excludes NULLs in both engines
    assert(got == Map("o_orderkey" -> ((4L, 1L, 2L)),
      "o_orderstatus" -> ((4L, 1L, 2L))), s"got $got")
  }

  test("ts_funnel_stages: order violations drop users at exactly their failing stage") {
    import spark.implicits._
    // u1 converts fully in order; u2's click PRECEDES its first view
    // (fails stage 2); u3 views only; u4 clicks post-view but never buys;
    // u5's purchase precedes its first qualifying click (fails stage 3).
    // The dense corpus converts everyone, so this fixture is what
    // actually pins the >= anchors.
    val rows = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L),
      (3L, "view", 1L),
      (4L, "view", 1L), (4L, "click", 2L),
      (5L, "purchase", 1L), (5L, "view", 2L), (5L, "click", 3L))
    val d = graft.util.TempDirs.create("r14_funnel")
    rows.map { case (u, t, ts) => (u, t, ts * 1000L) }
      .toDF("user_id", "event_type", "ts")
      .write.parquet(d.resolve("events.parquet").toString)
    val r = PipelineOps.tsFunnelStages.fn(spark, d.toString).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 1L)),
      s"got $r")
  }

  test("stream_snapshot_handoff: multi-batch replay over the seam equals batch state") {
    import spark.implicits._
    // cut = max/2 = 5, overlap 2 → snapshot covers ids ≤ 5, WAL replays
    // ids > 3. user 2's only version (id 2) reaches the final state ONLY
    // through the snapshot (a gap would lose it); user 3's versions 4,5
    // are BOTH snapshotted and replayed (overlap double-apply must not
    // regress); users 1/4/5 take updates (or first appear) post-cut.
    val rows = Seq[(Long, Long, String, Double, Long)](
      (1L, 1L, "view", 1.0, 100000L), (2L, 2L, "view", 2.0, 200000L),
      (4L, 3L, "click", 3.0, 300000L), (3L, 4L, "view", 4.0, 400000L),
      (3L, 5L, "click", 5.0, 450000L), (4L, 6L, "view", 6.0, 600000L),
      (5L, 7L, "purchase", 7.0, 700000L), (1L, 9L, "click", 9.0, 900000L),
      (4L, 10L, "view", 10.0, 1000000L))
    val d = graft.util.TempDirs.create("r14_handoff")
    val tbl = d.resolve("events.parquet").toString
    // three appended single-file writes → three files → three micro-batches
    Seq(rows.take(4), rows.slice(4, 7), rows.drop(7)).foreach { part =>
      part.toDF("user_id", "event_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("append").parquet(tbl)
    }
    val got = graft.streaming.StreamingOps
      .snapshotHandoff(spark, d.toString, overlap = 2L,
        maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 9L, 2L -> 2L, 3L -> 5L, 4L -> 10L, 5L -> 7L),
      s"got $got")
  }
}
