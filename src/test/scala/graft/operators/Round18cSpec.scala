package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-18 third wave: invariant pins for the late additions. All of
  * these ops are oracle-registered (values DuckDB-hash-checked at
  * sf0.01 AND sf0.1); the tests pin the mathematical invariants the
  * hash gate cannot express — range bounds, monotonicity, conservation
  * identities — so a future change that stays self-consistent in both
  * engines but breaks the op's MEANING still fails loudly.
  */
class Round18cSpec extends SparkSpec {

  test("graph_clustering_coeff: C in [0, 1] and consistent with the triangle-count key") {
    val r = graft.SparkEntry.queries("graph_clustering_coeff")(spark, sf)
      .collect().head
    val (tri, wedges) = (r.getLong(0), r.getLong(1))
    val triKey = graft.SparkEntry.queries("graph_triangle_count")(spark, sf)
      .collect().head.getLong(0)
    assert(tri == triKey, s"coefficient op counted $tri triangles, key $triKey")
    if (wedges > 0) {
      val c = r.getDouble(2)
      assert(c >= 0.0 && c <= 1.0, s"C out of range: $c")
      assert(c == 3.0 * tri / wedges)
    } else assert(r.isNullAt(2))
  }

  test("graph_assortativity: r in [-1, 1] when defined") {
    val r = graft.SparkEntry.queries("graph_assortativity")(spark, sf)
      .collect().head
    if (!r.isNullAt(1)) {
      val a = r.getDouble(1)
      assert(a >= -1.0 && a <= 1.0, s"assortativity out of range: $a")
    }
  }

  test("ts_cohort_retention: age-0 retention is exactly 1 for every cohort") {
    val rows = graft.SparkEntry.queries("ts_cohort_retention")(spark, sf)
      .collect()
    val age0 = rows.filter(_.getLong(1) == 0L)
    assert(age0.nonEmpty)
    age0.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0,
        s"a cohort is active on its own first day by definition: $r")
    }
    // retention counts never exceed the cohort size at any age
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3), s"$r"))
  }

  test("agg_activity_bitmap: popcount and recovered endpoints match the raw activity") {
    val out = graft.SparkEntry.queries("agg_activity_bitmap")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = Tables.read(spark, sf, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> rs.map(_.getLong(1)).toSet }
    assert(out.keySet == raw.keySet)
    raw.foreach { case (u, days) =>
      val (_, nActive, first, last) = out(u)
      assert(nActive == days.size, s"user $u popcount")
      assert(first == days.min && last == days.max,
        s"user $u endpoints recovered from the bitmap must be min/max day")
    }
  }

  test("llm_dedup_threshold_sweep: cumulative pair counts are non-increasing in tau") {
    val rows = graft.SparkEntry.queries("llm_dedup_threshold_sweep")(spark, sf)
      .collect().sortBy(_.getDouble(0))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.85, 0.9, 0.95))
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(1) >= hi.getLong(1),
          s"tighter tau cannot yield more pairs: $lo vs $hi")
      case _ =>
    }
    // the 0.9 point must agree with the production pair set's cardinality
    val n09 = rows.find(_.getDouble(0) == 0.9).get.getLong(1)
    assert(n09 == LlmOps.shardedJaccardPairs(spark, sf).count(),
      "sweep at tau=0.9 must equal the production shard pair set")
  }

  test("llm_vocab_coverage_curve: coverage is monotone in k and bounded by 1") {
    val rows = graft.SparkEntry.queries("llm_vocab_coverage_curve")(spark, sf)
      .collect().sortBy(_.getLong(0))
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(1) <= hi.getLong(1), "covered mass grows with k")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("ts_user_lifetime: span and activity invariants per user") {
    val rows = graft.SparkEntry.queries("ts_user_lifetime")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), s"first <= last: $r")
      assert(r.getLong(5) <= r.getLong(4), s"active days <= events: $r")
      assert(r.getLong(5) >= 1 && r.getLong(3) >= 0)
      // active days cannot exceed the inclusive calendar span
      assert(r.getLong(5) <= r.getLong(3) + 1, s"active days vs span: $r")
    }
  }
}
