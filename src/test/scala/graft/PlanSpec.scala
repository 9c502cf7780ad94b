package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.col

import graft.operators._

/** Physical-plan audits (SURVEY §4): the scale properties — filter
  * pushdown, column pruning, broadcast joins, TakeOrderedAndProject —
  * must be visible in the executed plan, not assumed. These guard against
  * regressions that stay correct but stop scaling (e.g. a filter that
  * silently becomes post-scan, a dimension join that reverts to shuffle).
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def scanOf(df: DataFrame, marker: String): String =
    plan(df).linesIterator.filter(_.contains(marker)).mkString("\n")

  test("minhash band join: first-band-match emission, no pair-dedup aggregate") {
    // the r20 skew fix: each pair leaves the join exactly once (filtered
    // on its first fully-matching band), so the plan must carry the
    // native expression and must NOT re-aggregate pairs — a HashAggregate
    // keyed (id1, id2) reappearing here is the 2.3 GB candidate exchange
    // coming back
    val toks = operators.LlmOps.docTokens(spark, sf).cache()
    val p = plan(operators.LlmOps.minhashPairs(spark, toks,
      broadcastRowBudget = 0L, tileRowBudget = 0L))
    assert(p.contains("graft_first_band_match"), p)
    assert(p.contains("graft_sig_match"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("id1") && l.contains("id2")), p)
  }

  test("op_filter_pred pushes both predicates into the parquet scan") {
    val p = plan(Expressions.opFilterPred.fn(spark, sf))
    assert(p.contains("PushedFilters:"), p)
    // the toString truncates the PushedFilters list, so match prefixes
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
    assert(p.contains("GreaterThan(o_total"), p)
  }

  test("src_ts_range_prune pushes the native ts range into the events scan") {
    val p = plan(operators.SourceOps.srcTsRangePrune.fn(spark, sf))
    assert(p.contains("PushedFilters:"), p)
    // both bounds must reach the source as atomic ts comparisons —
    // a canonical-long filter would appear as unix_micros(...) post-scan
    assert(p.contains("GreaterThanOrEqual(ts"), p)
    assert(p.contains("LessThan(ts"), p)
  }

  test("op_project_compute prunes the scan to the 4 needed columns") {
    val p = scanOf(Expressions.opProjectCompute.fn(spark, sf), "ReadSchema")
    assert(p.contains("l_orderkey"), p)
    assert(!p.contains("l_shipdate") && !p.contains("l_quantity"),
      s"scan reads more columns than the projection needs:\n$p")
  }

  test("join_broadcast plans a BroadcastHashJoin for the dimension side") {
    assert(plan(Joins.joinBroadcast.fn(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("join_hint_shuffle_hash actually plans a ShuffledHashJoin") {
    assert(plan(Joins.joinHintShuffleHash.fn(spark, sf)).contains("ShuffledHashJoin"))
  }

  test("join_interval_overlap keeps the equality key a hash/merge join, not nested-loop") {
    val p = plan(Joins.joinIntervalOverlap.fn(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range predicate must be a post-join filter on an equi join:\n$p")
  }

  test("op_topk_global becomes TakeOrderedAndProject (no global sort shuffle)") {
    assert(plan(SetOps.opTopkGlobal.fn(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("llm_contamination_ngram broadcasts the eval shingle set") {
    val p = plan(LlmOps.llmContaminationNgram.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set shingles must broadcast, not shuffle:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(800))
  }

  test("agg_hash_groupby does partial (map-side) then final hash aggregation") {
    val p = plan(Aggregations.aggHashGroupby.fn(spark, sf))
    // partial_sum before the exchange, final sum after — two HashAggregates
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_sum"), p)
  }

  test("sink_upsert_latest_by_key shuffles exactly once (window on the key)") {
    val p = plan(SourceOps.sinkUpsertLatestByKey.fn(spark, sf))
    // one exchange for the window partition key, one for the final presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("llm_edit_distance_dup stays an equi-join on the block key, never nested-loop") {
    val p = plan(LlmOps.llmEditDistanceDup.fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"prefix blocking must plan as an equi-join:\n${p.take(1200)}")
  }

  test("ts_cusum_drift's three window frames share one user_id shuffle") {
    val p = plan(PipelineOps.tsCusumDrift.fn(spark, sf))
    // one exchange for the user_id windows + one for the presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("llm_unigram_logprob keeps the vocabulary distributed (no driver collect)") {
    val p = plan(PipelineOps.llmUnigramLogprob.fn(spark, sf))
    // a driver-collected vocab would re-enter the plan as a LocalTableScan
    // (local relation built from collected rows); the distributed form has
    // only parquet scans and the materialized lnp side
    assert(!p.contains("LocalTableScan"),
      s"vocabulary must never be materialized on the driver:\n${p.take(1200)}")
  }

  test("llm_vocab_build ranks with no single-partition exchange") {
    val p = plan(PipelineOps.llmVocabBuild.fn(spark, sf))
    assert(!p.contains("SinglePartition"),
      s"vocab ranking must not funnel through one partition:\n${p.take(1200)}")
  }

  test("join_asof_nearest computes both directions in one window pass") {
    val p = plan(Joins.joinAsofNearest.fn(spark, sf))
    // one Window operator evaluates all four frame columns — the backward
    // and forward frames share the user sort, never a second shuffle
    assert("Window".r.findAllIn(p).size == 1, s"frames must share one window:\n$p")
    // signup-dedup groupBy + window partition + presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("agg_max_by combines map-side: partial max_by before the exchange") {
    val p = plan(Aggregations.aggMaxBy.fn(spark, sf))
    // THE claim of the op: the exchange carries one candidate per
    // (partition, group), i.e. a partial aggregate precedes it — the
    // window-based latest-by-key alternative has no partial at all
    assert(p.contains("partial_max_by"), p.take(1200))
    assert(!p.contains("Window"), "must be an aggregate, not a window sort")
  }

  test("ts_interval_union: window, island sum and per-island agg share the user shuffle") {
    val p = plan(PipelineOps.tsIntervalUnion.fn(spark, sf))
    // HashPartitioning(user) satisfies ClusteredDistribution(user, island),
    // so the groupBy must NOT add a third exchange — one for the user
    // window, one for the presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("agg_skew_kurt_manual: one partial+final agg pass carries all four moments") {
    val p = plan(Aggregations.aggSkewKurtManual.fn(spark, sf))
    assert(p.contains("partial_sum"), p.take(900))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("llm_bigram_logprob keeps the bigram vocabulary distributed") {
    val p = plan(PipelineOps.llmBigramLogprob.fn(spark, sf))
    assert(!p.contains("LocalTableScan"),
      s"bigram model must never be materialized on the driver:\n${p.take(900)}")
  }

  test("join_skew_salted plans a shuffled hash join on the salted key, never broadcast") {
    val p = plan(Joins.joinSkewSalted.fn(spark, sf))
    // the op exists for the can't-broadcast case: a broadcast plan would
    // make the salting dead weight and hide the skew behavior under test
    assert(p.contains("ShuffledHashJoin"), p.take(1200))
    assert(!p.contains("BroadcastHashJoin"),
      s"salted join must not revert to broadcast:\n${p.take(1200)}")
  }

  test("llm_ngram_pmi: top-50 is TakeOrderedAndProject; model tables stay distributed") {
    val p = plan(PipelineOps.llmNgramPmi.fn(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n${p.take(1200)}")
    assert(!p.contains("LocalTableScan"),
      s"marginal tables must never be materialized on the driver:\n${p.take(1200)}")
  }

  test("agg_weighted_median: both windows and the final agg share the group shuffle") {
    val p = plan(Aggregations.aggWeightedMedian.fn(spark, sf))
    // (flag, qty) groupBy exchange + flag window exchange + presentation
    // sort; the running and total windows share one partitioning, and
    // HashPartitioning(flag) satisfies the final groupBy — nothing else
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("ts_mad_anomaly: median windows run over aggregated counts, not corpus rows") {
    val p = plan(PipelineOps.tsMadAnomaly.fn(spark, sf))
    // every Window node must sit above a HashAggregate (the (type, value)
    // count table) — a window whose child scans raw events would be the
    // corpus-sort plan this op exists to avoid; med/MAD join back via
    // broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    val winOverScan = p.linesIterator.sliding(6).exists(w =>
      w.head.trim.startsWith("Window") &&
        w.tail.exists(_.contains("FileScan")) &&
        !w.tail.exists(_.contains("HashAggregate")))
    assert(!winOverScan, s"a median window scans raw rows:\n${p.take(1500)}")
  }

  test("llm_corpus_shuffle ranks globally with no single-partition exchange") {
    val p = plan(PipelineOps.llmCorpusShuffle.fn(spark, sf))
    assert(!p.contains("SinglePartition"),
      s"global shuffle position must come from the two-pass scan, not one task:\n${p.take(1200)}")
  }

  test("op_snapshot_diff keeps the key diff an equi full-outer join") {
    val p = plan(SetOps.opSnapshotDiff.fn(spark, sf))
    assert(p.contains("FullOuter"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"diff must stay a hash/merge equi-join:\n${p.take(1200)}")
  }

  test("llm_bpe_merge_step: top-20 is TakeOrderedAndProject over aggregates, no window") {
    val p = plan(PipelineOps.llmBpeMergeStep.fn(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(900))
    assert(!p.contains("Window"),
      s"pair ranking must be aggregate-first, not a sorted window:\n${p.take(900)}")
  }

  test("agg_exact_quantiles: quantile picks share the group shuffle") {
    val p = plan(Aggregations.aggExactQuantiles.fn(spark, sf))
    // (flag, qty) groupBy + flag window + presentation sort — the four
    // quantile CASEs ride ONE window pass and the final groupBy reuses
    // the flag partitioning
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("ts_weekday_profile: overall row rolls up from cells — no second corpus scan") {
    val p = plan(PipelineOps.tsWeekdayProfile.fn(spark, sf))
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans <= 1, s"the rollup must reuse the cell table, got $scans scans:\n$p")
  }

  test("agg_entropy: per-user total rides the groupBy output, bounded exchanges") {
    val p = plan(Aggregations.aggEntropy.fn(spark, sf))
    // (user,type) groupBy + user window + (user,tot) re-agg + final sort;
    // anything beyond means a plan regression (e.g. a scalar collect join)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 4, s"$exchanges exchanges:\n$p")
    assert(!p.contains("LocalTableScan"), "no driver materialization")
  }

  test("src_cdc_quarantine: single corpus pass — decode evaluated once, one hash agg") {
    val p = plan(SourceOps.srcCdcQuarantine.fn(spark, sf))
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans == 1, s"the audit must decode in ONE pass, got $scans scans:\n$p")
  }

  test("op_exists_in_subquery plans semi + anti joins, never a nested loop") {
    val p = plan(Expressions.opExistsInSubquery.fn(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS must plan a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT IN must plan an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("op_dpp_star_join: the fact scan carries a dynamic pruning partition filter") {
    val p = plan(SourceOps.opDppStarJoin.fn(spark, sf))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"the day-partitioned fact scan must be runtime-pruned by the dim filter:\n$p")
  }

  test("join_bucketed_colocated: neither side reshuffles on the join key") {
    val p = plan(Joins.joinBucketedColocated.fn(spark, sf))
    assert(p.contains("SortMergeJoin"), s"merge hint must hold:\n$p")
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed sides must join without a key shuffle:\n$p")
  }

  test("op_schema_ddl_fanout: catalog metadata only — no corpus data scan") {
    val p = plan(SourceOps.opSchemaDdlFanout.fn(spark, sf))
    assert(!p.contains("FileScan"), s"metadata op must not scan data:\n$p")
  }

  test("agg_kmv_set_ops: k-minima via TakeOrderedAndProject, no full sort") {
    val p = plan(Aggregations.aggKmvSetOps.fn(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"global limit-after-order must plan per-partition top-k:\n$p")
    // the k-minima estimates stay exact vs the sketch laws: union of the
    // two populations is >k here, so the estimate path is exercised
    val r = Aggregations.aggKmvSetOps.fn(spark, sf).head()
    val (u, i) = (r.getLong(0), r.getLong(1))
    assert(u > 0 && i >= 0 && i <= u, s"union $u, intersection $i")
  }

  test("join_bloom_prescreen: the bloom probe prunes fact rows PRE-join") {
    val (fact, dim) = Joins.bloomPrescreen(spark, sf)
    val total = graft.Tables.read(spark, sf, "orders").count()
    val pruned = fact.count()
    val trueMatches = graft.Tables.read(spark, sf, "orders")
      .join(dim, col("o_custkey") === col("c_custkey")).count()
    // the prescreen must keep every true match (bloom: no false negatives)
    // and kill most of the ~4/5 non-matching fact rows pre-shuffle
    assert(pruned >= trueMatches, s"bloom dropped true matches: $pruned < $trueMatches")
    assert(pruned < total / 2,
      s"prescreen kept $pruned of $total fact rows — no useful pruning")
    // and the probe runs as a plain filter in the fact subtree, not after
    // the join — asserted by WALKING the SparkPlan tree, not by comparing
    // plan-string line indexes (AQE re-printing / reused-exchange sections
    // can reorder lines without any semantic change; ADVICE r15)
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def hasProbe(node: SparkPlan): Boolean = node.exists {
      case f: FilterExec => f.condition.exists(_.isInstanceOf[BloomFilterMightContain])
      case _             => false
    }
    val root = Joins.joinBloomPrescreen.fn(spark, sf).queryExecution.sparkPlan
    val joins = root.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, s"no join in plan:\n$root")
    // the probe FilterExec must be a DESCENDANT of the join, on the side
    // that carries the fact columns (orders), i.e. the streamed side
    val factSides = joins.flatMap(_.children.filter(_.output.exists(_.name == "o_totalprice")))
    assert(factSides.nonEmpty, s"no fact side under any join:\n$root")
    assert(factSides.exists(hasProbe),
      s"bloom probe must filter the fact subtree BELOW the join:\n$root")
  }

  test("llm_span_corruption: map-side only — the single exchange is the output sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val root = operators.PipelineOps.llmSpanCorruption.fn(spark, sf)
      .queryExecution.executedPlan
    val exchanges = root.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.length <= 1,
      s"per-doc transform must not shuffle before the output sort:\n$root")
  }

  test("llm_oov_rate: the vocab side joins via broadcast, scoring never shuffles the corpus on tok") {
    val p = plan(LlmOps.llmOovRate.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"K-bounded vocab must broadcast:\n$p")
  }

  test("llm_hard_negative_mine: the anchor side broadcasts under the budget") {
    val p = plan(LlmOps.llmHardNegativeMine.fn(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"anchors under budget must broadcast:\n$p")
  }

  test("llm_nb_lang_classifier: the class table broadcasts into the scoring fanout") {
    val p = plan(LlmOps.llmNbLangClassifier.fn(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the |classes|-row table must broadcast:\n$p")
  }

  test("llm_split_leakage_audit: document bodies never ride the leakage join") {
    val p = plan(LlmOps.llmSplitLeakageAudit.fn(spark, sf))
    // the semi join must key on the 16-byte digest; shuffling `text`
    // would make the audit corpus-bytes-wide at 100 TB
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text"),
      s"document text crosses an exchange:\n$exchanges")
  }

  test("ts_acf: aggregate-first — no corpus scan survives into the lag joins") {
    val p = plan(PipelineOps.tsAcf.fn(spark, sf))
    // the events scan is fully reduced to the materialized |days| table
    // BEFORE any join: the joined plan must read only the checkpointed
    // daily rows (Scan ExistingRDD), never parquet — a regression that
    // joins raw events would surface as a file scan below the join
    assert(p.contains("Join"), p.take(800))
    assert(!p.contains("Scan parquet") && !p.contains("FileScan"),
      s"a corpus file scan reached the lag-join plan:\n${p.take(1500)}")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the checkpointed daily table as the join input:\n${p.take(800)}")
  }

  test("llm_label_centroid_drift: one corpus explode feeds map-side partial aggs") {
    val p = plan(LlmOps.llmLabelCentroidDrift.fn(spark, sf))
    // the per-(label, pos) and per-pos sums must partial-aggregate
    // before their exchanges — the corpus-sized explode never shuffles raw
    assert(p.contains("HashAggregate"), p.take(800))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("embedding"),
      s"raw embedding arrays cross an exchange:\n$exchanges")
  }
}
