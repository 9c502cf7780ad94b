package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-layout pins for `sink_compact_small_files` and the plan pin
  * for `op_table_profile_sketch` — the properties the DuckDB oracle
  * cannot see (it only proves CONTENT): the compaction must actually
  * shrink the file count, and the range layout must leave each output
  * file with a disjoint `o_orderkey` span (what parquet footer min/max
  * pruning and downstream merge joins consume); the sketch profile must
  * plan WITHOUT the multi-distinct Expand that the exact profile pays.
  */
class CompactionSpec extends SparkSpec {

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("sink_compact_small_files shrinks 64 fragments to few files") {
    val frag = SourceOps.fragmentedOrdersDir(spark, sf)
    assert(partFiles(frag).length == 64,
      s"fixture should be 64-way fragmented, got ${partFiles(frag).length}")
    val out = SourceOps.compactOrders(spark, sf)
    val n = partFiles(out).length
    assert(n < 16, s"compaction left $n files for a ~MB-scale table")
    // content survives byte-for-byte in aggregate
    assert(spark.read.parquet(out).count() ==
      graft.Tables.read(spark, sf, "orders").count())
  }

  test("compacted files carry pairwise-disjoint o_orderkey ranges") {
    val out = SourceOps.compactOrders(spark, sf)
    val ranges = partFiles(out).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2,
          s"overlapping file ranges: ..$hi vs $lo2.. — range layout lost")
      case _ => ()
    }
  }

  test("op_table_profile_sketch plans one Aggregate with NO Expand") {
    val p = SourceOps.opTableProfileSketch.fn(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Expand"),
      s"sketch profile must not pay the multi-distinct Expand:\n$p")
    // and the exact profile DOES pay it — the contrast the sketch exists for
    val exact = SourceOps.opTableProfile.fn(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(exact.contains("Expand"), "exact profile no longer plans Expand")
  }

  test("mv refresh writes only the touched ~1/5 of day partitions") {
    val (mv0dir, refreshDir, touched) = SourceOps.mvRefresh(spark, sf)
    def dayDirs(dir: String): Set[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("day="))
        .map(_.getName).toSet
    val allDays = dayDirs(mv0dir)
    val written = dayDirs(refreshDir)
    assert(touched.forall(_ % 5 == 2), s"non-delta day touched: $touched")
    assert(written.size == touched.size,
      s"wrote ${written.size} partitions for ${touched.size} touched days")
    assert(written.size < allDays.size / 2,
      s"refresh rewrote ${written.size}/${allDays.size} partitions — not incremental")
  }

  test("mv refresh partition-prunes the touched-day read of the base MV") {
    val (mv0dir, _, touched) = SourceOps.mvRefresh(spark, sf)
    val pruned = spark.read.parquet(mv0dir)
      .withColumn("day", col("day").cast("long"))
      .filter(col("day").isin(touched: _*))
    val p = pruned.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("day")),
      s"day filter did not reach the partition filters:\n$p")
  }

  test("sink_compact_merge_dedup: ONE exchange, disjoint key ranges, upsert content") {
    val out = SourceOps.compactMergeDedup(spark, sf)
    // content ≡ the window-dedup op (the oracle also pins this; here we
    // pin it against the IN-REPO reference implementation directly)
    val merged = spark.read.parquet(out)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    val frag = spark.read.parquet(SourceOps.fragmentedEventsDir(spark, sf))
    val expect = Upsert.latestByKey(frag,
      Seq(col("user_id")), Seq(col("ts_us"), col("event_id")))
      .select(merged.columns.map(col): _*)
    assert(merged.exceptAll(expect).isEmpty && expect.exceptAll(merged).isEmpty,
      "merged state differs from latest-per-key")
    // the fused pass must shuffle ONCE (the range exchange) — fusing is
    // the point: window dedup would add a hash exchange. Asserted on the
    // op's REAL pipeline via its frame seam, so a regression that slips
    // a second shuffle into the op itself cannot pass
    val exchanges = SourceOps.mergeDedupFrame(spark, sf)
      .queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"fused merge must plan exactly one exchange, saw $exchanges")
    // disjoint per-file key ranges — what keeps pruning + merge joins alive
    val ranges = partFiles(out)
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping user_id ranges: ..$hi vs $lo2..")
      case _ => ()
    }
    // and it actually deduplicated: one row per user
    assert(merged.groupBy("user_id").count().filter(col("count") > 1).isEmpty)
  }

  test("op_zonemap_prune reads a strict subset of the compacted files") {
    val (sel, total, lo, hi) = SourceOps.zonemapPrune(spark, sf)
    assert(total > 1, s"layout has $total files — zone map has nothing to prune")
    assert(sel.nonEmpty && sel.size < total,
      s"zone map selected ${sel.size}/$total files — no file-level skipping")
    // the pruned read + residual predicate equals the full-scan answer
    val dir = SourceOps.zonemapLayoutDir(spark, sf)
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey").between(lo, hi)).count()
    val pruned = spark.read.parquet(sel: _*)
      .filter(col("o_orderkey").between(lo, hi)).count()
    assert(pruned == full, s"pruned read lost rows: $pruned vs $full")
  }

  test("sketch mv refresh writes only touched partitions; merge is lossless") {
    val (mv0dir, refreshDir, touched) = SourceOps.mvSketchRefresh(spark, sf)
    def dayDirs(dir: String): Set[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("day="))
        .map(_.getName).toSet
    assert(touched.forall(_ % 5 == 2), s"non-delta day touched: $touched")
    assert(dayDirs(refreshDir).size == touched.size)
    assert(dayDirs(refreshDir).size < dayDirs(mv0dir).size / 2,
      "sketch refresh rewrote most partitions — not incremental")
    // lossless merge: refreshed minima ≡ single-pass sketch over the
    // post-delta row set (the KmvSketchProps law, end-to-end)
    val kmvM = udaf(new graft.functions.KmvMinima(64))
    val full = graft.Tables.read(spark, sf, "events")
      .filter(col("event_id") % lit(7) =!= 0 ||
        (expr("(ts div 1000) div 86400000000") % lit(5) === 2 &&
          col("event_id") % lit(7) === 0))
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("event_type"),
        graft.functions.PortableHash.hash32OrSkip(col("user_id")).as("hv"))
      .groupBy(col("day"), col("event_type"))
      .agg(kmvM(col("hv")).as("mins"))
      .filter(col("day") % lit(5) === 2) // the touched slice
    val refreshed = spark.read.parquet(refreshDir)
      .withColumn("day", col("day").cast("long"))
      .select(col("day"), col("event_type"), col("mins"))
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty,
      "refreshed sketch partials differ from the single-pass recompute")
  }

  test("incremental zone map scans only the 2-file delta and indexes every file") {
    val (dir, idx, delta, total) = SourceOps.zonemapIncremental(spark, sf)
    assert(delta.size == 2, s"late tail should be 2 files, delta was $delta")
    assert(idx.size == total,
      s"index covers ${idx.size} of $total files after refresh")
    assert(total == 18, s"expected 16 base + 2 appended files, got $total")
    // the box query reads a strict subset, and BOTH unsorted tail files
    // are selected (each spans the whole key range) — the index stays
    // correct for appends that ignore the sort layout
    val gmn = idx.map(_._2).min; val gmx = idx.map(_._3).max
    val lo = gmn + (gmx - gmn) * 2 / 5; val hi = gmn + (gmx - gmn) / 2
    val sel = idx.filter(f => f._3 >= lo && f._2 <= hi).map(_._1)
    assert(sel.size < total, s"box query selected all $total files — no pruning")
    val deltaNames = delta.map(_.split('/').last).toSet
    assert(sel.count(p => deltaNames(p.split('/').last)) == 2,
      "full-span tail files must stay visible to every box query")
    // pruned read ≡ full-scan filter on the same directory
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey").between(lo, hi)).count()
    val pruned = spark.read.parquet(sel: _*)
      .filter(col("o_orderkey").between(lo, hi)).count()
    assert(pruned == full, s"pruned read lost rows: $pruned vs $full")
  }

  test("sketch estimates are within 20% of exact distincts at k=256") {
    val est = SourceOps.opTableProfileSketch.fn(spark, sf)
      .select(col("column_name"), col("n_distinct_est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SourceOps.opTableProfile.fn(spark, sf)
      .select(col("column_name"), col("n_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (c, nd) =>
      val e = est(c)
      // σ/n ≈ 1/√254 ≈ 6% at k=256; 20% is a >3σ acceptance band, and
      // under-256-distinct columns must be EXACT (sketch = full hash set)
      if (nd < 256) assert(e == nd, s"$c: expected exact $nd, got $e")
      else assert(math.abs(e - nd) <= 0.20 * nd, s"$c: est $e vs exact $nd")
    }
  }
}
