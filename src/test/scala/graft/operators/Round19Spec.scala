package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-19 additions: minhash estimator calibration, ANN recall@10
  * evaluation, and bitmap audience algebra — each pinned against an
  * independent in-driver recomputation over the same corpus (the DuckDB
  * oracle proves cross-engine equality; these prove the SEMANTICS).
  */
class Round19Spec extends SparkSpec {

  test("llm_minhash_calibration: curve cells are sane and cover every candidate pair") {
    val out = graft.SparkEntry.queries("llm_minhash_calibration")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (m, n, mj, mae) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(m >= 0 && m <= 16, s"matching level out of range: $r")
      assert(n > 0, s"empty cell emitted: $r")
      assert(mj >= 0.0 && mj <= 1.0, s"mean exact J out of [0,1]: $r")
      // |est - J| ≤ max(est, 1-est) ≤ 1 always; the banded candidates
      // are similarity-biased so the realized error stays well inside
      assert(mae >= 0.0 && mae <= 0.5, s"mean abs err implausible: $r")
    }
    // the curve partitions the candidate set: cell counts sum to the
    // shard's banded candidate pair count
    val shardToks = LlmOps.docTokens(spark, sf)
      .filter(col("doc_id") % 5 === 1)
    val nCand = LlmOps.minhashPairs(spark, shardToks).count()
    assert(out.map(_.getLong(1)).sum == nCand,
      s"curve covers ${out.map(_.getLong(1)).sum} of $nCand candidates")
    // exact duplicates concentrate at the top of the curve: the highest
    // populated matching level must carry at least the overall mean J
    val top = out.maxBy(_.getLong(0))
    val overall = out.map(r => r.getDouble(2) * r.getLong(1)).sum /
      out.map(_.getLong(1)).sum
    assert(top.getDouble(2) >= overall - 1e-9,
      s"top level ${top.getDouble(2)} below overall mean $overall")
  }

  test("llm_ann_recall_eval: per-anchor accounting replayed brute-force in the driver") {
    val out = graft.SparkEntry.queries("llm_ann_recall_eval")(spark, sf)
      .collect()
    val e = Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val anchors = e.filter(_._1 % 50 == 0)
    assert(out.length == anchors.length, "one row per probe anchor")
    val bucket = e.map { case (id, v) =>
      id -> graft.functions.VectorMath.lshBucket(v, 6)
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val (aId, nc, nh, rec) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nh <= 10 && nh <= nc, s"hits bound violated: $r")
      assert(rec == nh / 10.0, s"recall must be n_hits/10: $r")
      val av = anchors.find(_._1 == aId).get._2
      val others = e.filter(_._1 != aId)
      def cand(id: Long) = {
        val x = bucket(id) ^ bucket(aId)
        x == 0 || java.lang.Integer.bitCount(x) == 1
      }
      assert(nc == others.count(o => cand(o._1)), s"candidate count: $r")
      val top10 = others
        .map(o => (o._1, BigDecimal(cos(av, o._2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      assert(nh == top10.count(cand), s"hit count vs brute force: $r")
    }
  }

  test("llm_split_leakage_audit: leakage equals a driver digest recomputation") {
    val out = graft.SparkEntry.queries("llm_split_leakage_audit")(spark, sf)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("test", "val"))
    val docs = Tables.read(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val id = r.getLong(0)
        val bucket = ((id * 2654435761L) % 1000000007L) % 100
        val split =
          if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getString(1).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (split, digest)
      }
    val trainDigests = docs.collect { case ("train", dg) => dg }.toSet
    Seq("val", "test").foreach { sp =>
      val ev = docs.filter(_._1 == sp)
      val (nDocs, nLeaked, rate) = out(sp)
      assert(nDocs == ev.length, s"$sp doc count")
      assert(nLeaked == ev.count(d => trainDigests(d._2)), s"$sp leak count")
      assert(rate == BigDecimal(nLeaked.toDouble / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$sp rate")
    }
  }

  test("ts_acf: seven lags over the contiguous day range, lag-1 agrees with a driver Pearson") {
    val out = graft.SparkEntry.queries("ts_acf")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 7L))
    out.foreach { r =>
      if (!r.isNullAt(2))
        assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"|acf| > 1: $r")
    }
    // daily series from an independent aggregation; contiguous days ⇒
    // n_pairs(lag) = |days| - lag
    val daily = Tables.read(spark, sf, "events")
      .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(out.map(_.getLong(1)).toSeq ==
      (1 to 7).map(l => daily.length.toLong - l))
    // driver Pearson at lag 1 (BigDecimal sums mirror the decimal moments)
    val pairs = daily.sliding(2).map(a => (a(0)._2, a(1)._2)).toSeq
    val n = pairs.length.toDouble
    def dsum(xs: Seq[Double], scale: Int) =
      xs.map(BigDecimal(_).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val sx = dsum(pairs.map(_._1), 10); val sy = dsum(pairs.map(_._2), 10)
    val sxx = dsum(pairs.map(p => p._1 * p._1), 6)
    val syy = dsum(pairs.map(p => p._2 * p._2), 6)
    val sxy = dsum(pairs.map(p => p._1 * p._2), 6)
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(out.head.getDouble(2) - want) < 1e-6,
      s"lag-1 acf ${out.head.getDouble(2)} != driver $want")
  }

  test("llm_label_centroid_drift: geometry invariants + one label's norm replayed") {
    val out = graft.SparkEntry.queries("llm_label_centroid_drift")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val total = Tables.read(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == total, "n_vecs partitions the corpus")
    out.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"|cos| > 1: $r")
      assert(r.getDouble(3) >= 0.0, s"negative norm: $r")
    }
    // replay one label's centroid norm with exact decimal coordinate sums
    val lab = out.head.getInt(0)
    val vecs = Tables.read(spark, sf, "embeddings")
      .filter(col("label") === lab)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val means = (0 until 64).map { i =>
      vecs.map(v => BigDecimal(v(i).toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vecs.length
    }
    val norm = math.sqrt(means.map(m =>
      BigDecimal(m * m).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble)
    assert(math.abs(out.head.getDouble(3) - norm) < 1e-6,
      s"label $lab norm ${out.head.getDouble(3)} != driver $norm")
  }

  test("agg_bitmap_audience: set algebra equals a direct (user, day) recomputation") {
    val row = graft.SparkEntry.queries("agg_bitmap_audience")(spark, sf)
      .head()
    val dayNs = 86400000000000L
    val ev = Tables.read(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicks = ev.collect { case (u, "click", d) => (u, d) }.toSet
    val purch = ev.collect {
      case (u, "purchase", d) if u % 3 != 0 => (u, d)
    }.toSet
    val cu = clicks.map(_._1); val pu = purch.map(_._1)
    assert(row.getLong(0) == cu.size, "n_clickers")
    assert(row.getLong(1) == pu.size, "n_purchasers")
    assert(row.getLong(2) == (cu & pu).size, "n_both")
    val overlap = clicks & purch
    assert(row.getLong(3) == overlap.map(_._1).size, "n_same_day")
    assert(row.getLong(4) == overlap.size, "overlap_days")
    assert(row.getLong(5) == (clicks | purch).size, "union_days")
    // the carve keeps the audiences genuinely distinct
    assert(row.getLong(2) < row.getLong(0).max(row.getLong(1)))
  }
}
