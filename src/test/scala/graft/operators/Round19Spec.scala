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
