package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-18 operators: incremental SCD2 apply, retention vacuum over a
  * file-sharing version chain, bloom skip index, text normalization,
  * per-source KL drift. Each op's VALUES are already DuckDB-hash-checked
  * (all five are oracle-registered); these tests pin the properties the
  * oracle cannot see — pass-through/file-level behavior, subset reads,
  * sketch guarantees.
  */
class Round18Spec extends SparkSpec {

  test("sink_scd2_apply: incremental apply equals full rebuild on a crafted delta") {
    import spark.implicits._
    // keys: 1 = base-only (must pass through untouched), 2 = base+delta
    // (current row must close at the first delta ts), 3 = delta-only
    // (new key appears with its own intervals), NULL = base+delta (the
    // window groups NULLs into ONE partition, so the null-safe key
    // routing must close the NULL base row too). Cutoff = min day + 15;
    // days here are 0 (base) and 20 (delta).
    val d0 = 0L
    val d20 = 20L * 86400000000L
    val dir = graft.util.TempDirs.create("scd2_apply_fixture")
    Seq(
      (10L, d0 + 1000L, Some(1L), "click", 1.0, "{}"),
      (11L, d0 + 2000L, Some(1L), "click", 2.0, "{}"),
      (12L, d0 + 1000L, Some(2L), "click", 3.0, "{}"),
      (13L, d20 + 1000L, Some(2L), "click", 4.0, "{}"),
      (14L, d20 + 1000L, Some(3L), "click", 5.0, "{}"),
      (15L, d20 + 2000L, Some(3L), "click", 6.0, "{}"),
      (16L, d0 + 1000L, None, "click", 7.0, "{}"),
      (17L, d20 + 1000L, None, "click", 8.0, "{}")
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
      .write.parquet(dir.resolve("events.parquet").toString)
    val got = SourceOps.sinkScd2Apply.fn(spark, dir.toString).collect()
    // full rebuild via the plain historization op on the same corpus
    val want = SourceOps.opScd2Intervals.fn(spark, dir.toString)
      .select(got.head.schema.fieldNames.map(col): _*).collect()
    assert(got.toSeq == want.toSeq,
      s"incremental apply diverged from full rebuild:\n${got.toSeq}\nvs\n${want.toSeq}")
    // and the crafted closure really happened: key 2's base row closed at
    // the first delta ts, key 1 untouched (open), key 3 two intervals,
    // and the NULL key behaves exactly like key 2 (one closed, one open)
    val byKey = got.groupBy(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(byKey(Some(1L)).count(_.getBoolean(5)) == 1 && byKey(Some(1L)).length == 2)
    val k2 = byKey(Some(2L)).sortBy(r => r.getLong(3))
    assert(k2.head.get(4) == d20 + 1000L, "base current row must close at first delta ts")
    assert(byKey(Some(3L)).length == 2 && byKey(Some(3L)).count(_.getBoolean(5)) == 1)
    val kn = byKey(None).sortBy(r => r.getLong(3))
    assert(kn.length == 2 && kn.head.get(4) == d20 + 1000L && kn.last.getBoolean(5),
      "NULL-keyed base current row must close at the NULL-keyed delta ts")
  }

  test("sink_vacuum_retention: orphans deleted, shared files survive, head intact") {
    val (manifests, head, orphans, allDirs) = SourceOps.vacuumChain(spark, sf)
    def name(p: String) = java.nio.file.Paths.get(p).getFileName.toString
    assert(allDirs.map(name).toSet ==
      Set("b0_g0", "b1_g0", "b2_g0", "b3_g0", "b1_g1", "b2_g2"))
    // orphans are EXACTLY the superseded-and-unreferenced dirs
    assert(orphans.map(name).toSet == Set("b1_g0", "b2_g0"), s"orphans $orphans")
    orphans.foreach(p => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"orphan $p must be deleted from disk"))
    // files the head still references survive — including ones shared
    // with v0 (b0_g0, b3_g0): vacuum must never break the head
    manifests(2).foreach(p => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"live $p must survive vacuum"))
    // head readable and row-exact vs the logical definition
    val n = spark.read.parquet(head: _*).count()
    val expect = Tables.read(spark, sf, "orders")
      .filter(col("o_orderkey") % 8 =!= 6).count()
    assert(n == expect, s"head rows $n != logical $expect")
    // v0 is gone as a QUERYABLE version: its manifest now dangles
    assert(manifests(0).exists(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
  }

  test("op_bloom_skip_index: strict-subset read with no false negative") {
    val (dir, idx) = SourceOps.bloomSkipIndex(spark, sf)
    assert(idx.size > 1, "layout must have multiple files for skipping to mean anything")
    val docs = Tables.read(spark, sf, "documents")
    val probeId = docs.agg(min(col("doc_id"))).head.getLong(0) + 42L
    val probe = docs.filter(col("doc_id") === probeId)
      .select(md5(col("text").cast("binary"))).head.getString(0)
    val probeHash = spark.range(1).select(xxhash64(lit(probe))).head.getLong(0)
    val sel = idx.filter { case (_, bytes) =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes)).mightContainLong(probeHash)
    }.map(_._1)
    // no false negative: scanning ONLY the selected files finds every
    // doc a full scan finds
    val viaIndex = spark.read.parquet(sel: _*)
      .filter(md5(col("text").cast("binary")) === probe)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir)
      .filter(md5(col("text").cast("binary")) === probe)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaIndex == full && full.contains(probeId))
    // skipping: a point probe on a near-unique digest must not select
    // every file (16 files, 1 true positive, fp rate ~ bits/n bounded)
    assert(sel.size < idx.size,
      s"bloom index selected all ${idx.size} files — no skipping happened")
  }

  test("llm_text_normalize is idempotent (the op's own expression, corpus + edge rows)") {
    import spark.implicits._
    val edges = Seq("Hello,  World!!", "a  b   c", "MiXeD-case_42",
      " trim me ", "İstanbul — naïve café")
    val texts = graft.Tables.read(spark, sf, "documents")
      .select(col("text")).as[String].collect().toSeq ++ edges
    val once = texts.toDF("text")
      .select(PipelineOps.normalizeText(col("text")).as("n"))
    val twice = once.select(PipelineOps.normalizeText(col("n")).as("n"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("sink_wap_publish: corrupt candidate is staged but never published") {
    val (manifest, audits, publishedDir) = SourceOps.wapPublish(spark, sf)
    // the good build passed every audit and owns the manifest
    assert(audits.filter(_._1 == "v_good").forall(_._3))
    assert(publishedDir.endsWith("v_good"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(manifest)), "UTF-8") == publishedDir)
    // the corrupt build was staged (files exist for forensics)...
    val corruptDir = publishedDir.stripSuffix("v_good") + "v_corrupt"
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(corruptDir)),
      "corrupt candidate must remain staged for inspection")
    // ...but its key-uniqueness audit failed, so it never published
    val corrupt = audits.filter(_._1 == "v_corrupt").map(a => a._2 -> a._3).toMap
    assert(corrupt("non_empty") && corrupt("no_null_day") && !corrupt("key_unique"),
      s"unexpected corrupt-candidate audits: $corrupt")
    // reading through the manifest sees the GOOD row count, not the
    // duplicated slice
    val published = spark.read.parquet(publishedDir).count()
    val staged = spark.read.parquet(corruptDir).count()
    assert(staged > published, "fixture must actually duplicate rows")
  }

  test("llm_winnow_fingerprint: coverage guarantee and density") {
    // winnowing guarantee: every window of w=4 consecutive 3-shingles
    // contributes at least one fingerprint → fingerprint positions are
    // never more than w apart within a doc
    val fps = LlmOps.llmWinnowFingerprint.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byDoc.foreach { case (doc, ps) =>
      ps.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1) - pair(0) <= 4,
          s"doc $doc: fingerprint gap ${pair(1) - pair(0)} > w")
      }
    }
    // density ≈ 2/(w+1): far fewer fingerprints than shingles
    val nShingles = graft.Tables.read(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.expr(
        "sum(greatest(size(split(text, ' ')) - 2, 0))")).head.getLong(0)
    assert(fps.length < nShingles,
      s"${fps.length} fingerprints not sparser than $nShingles shingles")
  }

  test("sink_merge_into: all three branches and the overlap precedence") {
    val target = graft.Tables.read(spark, sf, "orders")
    val maxKey = target.agg(max(col("o_orderkey"))).head.getLong(0)
    val out = SourceOps.sinkMergeInto.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val targetKeys = target.select(col("o_orderkey"))
      .collect().map(_.getLong(0)).toSet
    targetKeys.foreach { k =>
      if (k % 7 == 3)      assert(out(k) == "U", s"update branch lost key $k")
      else if (k % 11 == 5) assert(!out.contains(k), s"delete branch kept key $k")
      else                  assert(out.contains(k), s"untouched key $k vanished")
    }
    // overlap precedence: a key hit by BOTH update and delete clauses
    // (≡ 38 mod 77) survives as an update
    targetKeys.filter(k => k % 77 == 38).foreach(k =>
      assert(out(k) == "U", s"overlap key $k must resolve update-over-delete"))
    // inserts land above the original key space, tagged 'I'
    val inserted = out.keys.filter(_ > maxKey)
    assert(inserted.nonEmpty && inserted.forall(out(_) == "I"))
  }

  test("llm_winnow_dedup_pairs: every candidate pair shares a literal 3-gram") {
    val pairs = LlmOps.llmWinnowDedupPairs.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val grams = graft.Tables.read(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 1)
      .select(col("doc_id"), expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
             i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""").as("g"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    pairs.foreach { case (a, b) =>
      assert(grams(a).intersect(grams(b)).nonEmpty,
        s"candidate pair ($a, $b) shares no literal 3-gram — fingerprint lied")
    }
  }

  test("agg_ddsketch_quantile: estimates within the 1% relative-error guarantee") {
    val est = Aggregations.aggDdsketchQuantile.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val vals = graft.Tables.read(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    def exact(xs: Array[Double], p: Long): Double = xs((((xs.length * p + 99) / 100) - 1).toInt)
    val gamma = 1.02
    val bound = (gamma - 1) / (gamma + 1) + 1e-6
    vals.foreach { case (t, xs) =>
      val (p50, p95, p99) = est(t)
      Seq((p50, 50L), (p95, 95L), (p99, 99L)).foreach { case (e, p) =>
        val x = exact(xs, p)
        if (x > 0)
          assert(math.abs(e - x) / x <= bound,
            s"$t p$p: est $e vs exact $x exceeds DDSketch bound $bound")
        else assert(e == 0.0)
      }
    }
  }

  test("ts_seasonal_decompose: components reconstruct the series exactly") {
    val rows = PipelineOps.tsSeasonalDecompose.fn(spark, sf).collect()
    assert(rows.length >= 7, "corpus must span more than a week of days")
    var interior = 0
    rows.foreach { r =>
      val v = r.getDouble(1)
      if (!r.isNullAt(2)) {
        interior += 1
        val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
        // residual is defined FROM the rounded components, so the
        // reconstruction closes to the rounding grain exactly
        assert(math.abs(v - recon) <= 2e-6,
          s"day ${r.getLong(0)}: $v != trend+seasonal+residual $recon")
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4),
          "edge days must have no seasonal/residual either")
      }
    }
    assert(interior == rows.length - 6, "exactly 3 edge days on each end")
  }

  test("op_constraint_audit: clean corpus is clean; crafted violations are counted") {
    import spark.implicits._
    val clean = SourceOps.opConstraintAudit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L), s"driver corpus must audit clean: $clean")
    // one violation of every class
    val dir = graft.util.TempDirs.create("constraint_fixture")
    Seq(
      (1L, Some(10L), "F", 100.0, "1-URGENT", "c"),
      (1L, Some(11L), "O", 100.0, "2-HIGH", "dup key"), // duplicate o_orderkey
      (3L, None, "X", 100.0, "3-MEDIUM", "bad status + null cust")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_comment")
      .write.parquet(dir.resolve("orders.parquet").toString)
    Seq(
      (1L, 1, 10.0, 0.05),   // ok
      (1L, 2, 99.0, 0.05),   // quantity out of range
      (1L, 3, 10.0, 0.5),    // discount out of range
      (999L, 1, 10.0, 0.05)  // FK orphan
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    val got = SourceOps.opConstraintAudit.fn(spark, dir.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("fk_lineitem_orders") == (1L, 4L))
    assert(got("not_null_o_custkey") == (1L, 3L))
    assert(got("range_l_quantity") == (1L, 4L))
    assert(got("range_l_discount") == (1L, 4L))
    assert(got("status_domain") == (1L, 3L))
    assert(got("unique_o_orderkey") == (2L, 3L))
  }

  test("llm_source_kl_drift: KL is non-negative and finite for every source") {
    val rows = LlmOps.llmSourceKlDrift.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getDouble(2)
      // Gibbs' inequality up to the 1e-6 per-term rounding the op documents
      assert(!kl.isNaN && !kl.isInfinite && kl >= -1e-4,
        s"source ${r.getString(0)} KL $kl out of range")
    }
  }

  test("ts_holt_forecast: fold matches an exact driver-side replay of the recursion") {
    val rows = PipelineOps.tsHoltForecast.fn(spark, sf).collect()
    assert(rows.length >= 7, "corpus must span more than a week of days")
    // replay the identical operation sequence on the observed series:
    // level/trend recurse on UNROUNDED doubles, output rounds to 6 dp
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var level = rows.head.getDouble(1)
    var trend = 0.0
    assert(rows.head.isNullAt(4), "first day has no one-step-ahead forecast")
    assert(rows.head.getDouble(2) == r6(level) && rows.head.getDouble(3) == 0.0)
    rows.drop(1).foreach { r =>
      val x = r.getDouble(1)
      val forecast = level + trend
      val newLevel = 0.5 * x + 0.5 * (level + trend)
      val newTrend = 0.5 * ((0.5 * x + 0.5 * (level + trend)) - level) + 0.5 * trend
      assert(r.getDouble(2) == r6(newLevel) && r.getDouble(3) == r6(newTrend)
          && r.getDouble(4) == r6(forecast),
        s"day ${r.getLong(0)}: engine (${r.getDouble(2)}, ${r.getDouble(3)}, " +
          s"${r.getDouble(4)}) != replay (${r6(newLevel)}, ${r6(newTrend)}, ${r6(forecast)})")
      level = newLevel; trend = newTrend
    }
    // days are strictly increasing — the sort_array over unique days is total
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("llm_reservoir_sample: exactly the 200 smallest md5 ranks, via top-k not a full sort") {
    val df = LlmOps.llmReservoirSample.fn(spark, sf)
    // plan shape: per-partition top-k + driver merge, never a global sort
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "the sample must be a TakeOrderedAndProject, not a full Sort+Limit")
    val got = df.collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.length == 200)
    // driver reference: rank every doc, take the 200 smallest (rank, id)
    val expected = Tables.read(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0))
      .map { id =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:rsv".getBytes("UTF-8"))
        (id, d.map("%02x".format(_)).mkString)
      }
      .sortBy { case (id, h) => (h, id) }.take(200).sortBy(_._1)
    assert(got.toSeq == expected.map { case (id, h) => (id, h) }.toSeq)
  }

  test("src_binary_files: length predicate pushes down to the binaryFile scan") {
    val dir = SourceOps.binaryBlobsDir(spark, sf)
    val df = spark.read.format("binaryFile").load(dir)
      .filter(col("length") < 300)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(length), LessThan(length,300)]"),
      s"length filter must reach the binaryFile source:\n$scan")
    // and the registered op reproduces the shard it was written from
    val got = SourceOps.srcBinaryFiles.fn(spark, sf).collect()
    val expected = graft.Tables.read(spark, sf, "documents")
      .filter(col("doc_id") % 100 === 7).count()
    assert(got.length == expected && expected > 0)
  }

  test("ts_forecast_backtest: summary replays exactly from the Holt output") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hw = PipelineOps.tsHoltForecast.fn(spark, sf).collect()
      .filter(!_.isNullAt(4)).map(r => (r.getDouble(1), r.getDouble(4)))
    val absErr = hw.map { case (obs, f) => BigDecimal(r6(math.abs(obs - f))) }
    val sape = hw.map { case (obs, f) =>
      BigDecimal(r6(math.abs(obs - f) / ((math.abs(obs) + math.abs(f)) / 2.0)))
    }
    val got = PipelineOps.tsForecastBacktest.fn(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == hw.length)
    assert(r.getDouble(1) == r6(absErr.sum.toDouble / hw.length),
      s"mae ${r.getDouble(1)}")
    assert(r.getDouble(2) == r6(sape.sum.toDouble / hw.length),
      s"smape ${r.getDouble(2)}")
    assert(r.getDouble(3) == absErr.max.toDouble, s"max_abs_err ${r.getDouble(3)}")
  }

  test("llm_mmr_diversify: matches an independent greedy replay from raw embeddings") {
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float]) =
      r4(graft.functions.VectorMath.cosineD(a, b))
    val rel = vecs.keys.filter(_ != 0L).toSeq
      .map(id => (id, cos(vecs(id), q)))
      .sortBy { case (id, rl) => (-rl, id) }.take(20)
    var selected = List(rel.maxBy { case (id, rl) => (rl, -id) })
    var out = List((1L, selected.head._1, selected.head._2,
      Option.empty[Double], selected.head._2))
    (2 to 8).foreach { rnk =>
      val best = rel.filterNot(c => selected.exists(_._1 == c._1))
        .map { case (id, rl) =>
          val ms = selected.map(s => cos(vecs(id), vecs(s._1))).max
          (id, rl, ms, r6(0.7 * rl - 0.3 * ms))
        }.maxBy { case (id, _, _, score) => (score, -id) }
      selected = selected :+ ((best._1, best._2))
      out = out :+ ((rnk.toLong, best._1, best._2, Some(best._3), best._4))
    }
    val got = LlmOps.llmMmrDiversify.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4)))
    assert(got.toList == out, s"engine ${got.toList} != replay $out")
    // greedy invariant: from rank 2 on, chosen MMR scores are
    // non-increasing — the score function is fixed and a candidate's
    // penalty only grows with the selected set. (Rank 1 is raw relevance,
    // a DIFFERENT function: with negative inter-candidate cosines the
    // rank-2 MMR score can legitimately exceed it.)
    val scores = got.drop(1).map(_._5)
    assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
  }

  test("ts_seasonal_anomaly: threshold is 3x the mean absolute residual of the interior days") {
    val dec = PipelineOps.tsSeasonalDecompose.fn(spark, sf).collect()
      .filter(!_.isNullAt(4)).map(r => (r.getLong(0), r.getDouble(4)))
    val got = PipelineOps.tsSeasonalAnomaly.fn(spark, sf).collect()
    assert(got.length == dec.length, "one row per interior (residual-bearing) day")
    // threshold replay in the same exact arithmetic: BigDecimal sum of the
    // 6-dp residuals, one double division, one 6-dp round
    val sumAbs = dec.map { case (_, r) =>
      BigDecimal(r).abs.setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val thr = BigDecimal(sumAbs.toDouble / dec.length * 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val decMap = dec.toMap
    got.foreach { r =>
      assert(r.getDouble(2) == thr, s"threshold ${r.getDouble(2)} != replay $thr")
      assert(r.getDouble(1) == decMap(r.getLong(0)), "residual must match decompose")
      assert(r.getBoolean(3) == (math.abs(r.getDouble(1)) > thr))
    }
  }
}
