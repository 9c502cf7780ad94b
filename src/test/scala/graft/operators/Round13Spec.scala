package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic corner pins for the round-13 additions — the corpus oracle
  * certifies engine/DuckDB agreement at scale; these fixtures pin the
  * properties the dense corpus may never exercise.
  */
class Round13Spec extends SparkSpec {

  test("agg_weighted_median: weight mass moves the median; lower-median on even splits") {
    import spark.implicits._
    // flag X: one heavy row drags the weighted median to 10 (the plain
    // median of the values would be 2); flag Y: even total weight picks
    // the LOWER median (1, not 2)
    // the NULL-quantity row must be EXCLUDED, not sorted to either end
    // (Spark and DuckDB disagree on where NULLs sort, so inclusion would
    // diverge): with it counted, X's heavy tail would no longer reach
    // cum·2 ≥ tot at value 10
    val rows = Seq[(String, Option[Double], Double)](
      ("X", Some(1.0), 1.00), ("X", Some(2.0), 1.00), ("X", Some(10.0), 10.00),
      ("X", None, 50.00),
      ("Y", Some(1.0), 1.00), ("Y", Some(2.0), 1.00))
    val d = graft.util.TempDirs.create("r13_wmedian")
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.parquet(d.resolve("lineitem.parquet").toString)
    val got = Aggregations.aggWeightedMedian.fn(spark, d.toString).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("X" -> 10.0, "Y" -> 1.0), s"got $got")
  }

  test("ts_mad_anomaly: one huge outlier cannot inflate the MAD the way it inflates a stddev") {
    import spark.implicits._
    // type a: the 100 is >5 sample stddevs from nowhere — a z-gate using
    // the outlier-inflated stddev (~44) would NOT flag it at 3σ from the
    // mean (~20.8); MAD stays 0 so the robust gate flags exactly it.
    // type b: symmetric series, MAD 1, nothing beyond 3·MAD.
    // the NULL value is excluded from median, MAD and row counts alike
    val rows = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)),
      ("a", Some(100.0)), ("a", None),
      ("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(3.0)), ("b", Some(4.0)),
      ("b", Some(5.0)))
    val d = graft.util.TempDirs.create("r13_mad")
    rows.toDF("event_type", "value")
      .write.parquet(d.resolve("events.parquet").toString)
    val got = PipelineOps.tsMadAnomaly.fn(spark, d.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("a") == ((1.0, 0.0, 1L, 5L)), s"got ${got("a")}")
    assert(got("b") == ((3.0, 1.0, 0L, 5L)), s"got ${got("b")}")
  }

  test("llm_corpus_shuffle: NULL doc_ids are excluded; positions stay dense") {
    import spark.implicits._
    val rows = Seq[(Option[Long], String)](
      (Some(1L), "a"), (Some(2L), "b"), (None, "c"), (Some(3L), "d"))
    val d = graft.util.TempDirs.create("r13_shuffle_null")
    rows.toDF("doc_id", "text")
      .write.parquet(d.resolve("documents.parquet").toString)
    val got = PipelineOps.llmCorpusShuffle.fn(spark, d.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq.sorted == Seq(0L, 1L, 2L), s"got ${got.toList}")
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L), s"got ${got.toList}")
  }

  test("join_skew_salted equals the plain unsalted join on the corpus") {
    val salted = Joins.joinSkewSalted.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = graft.Tables.read(spark, sf, "events")
      .groupBy(upper(col("event_type")).as("type_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain, s"salting changed the result:\n$salted\nvs\n$plain")
  }

  test("llm_dedup_containment catches a short doc embedded in a long one that Jaccard misses") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = ((1 to 10) ++ (100 to 339)).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, short), (2L, long), (3L, "zz yy xx ww vv"))
    val d = graft.util.TempDirs.create("r13_containment")
    rows.toDF("doc_id", "text")
      .write.parquet(d.resolve("documents.parquet").toString)
    val cont = LlmOps.llmDedupContainment.fn(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toList
    // doc1's 8 shingles all appear in doc2 (shared prefix + the w10→w100
    // boundary shingles are doc2-only) → containment 8/8 = 1.0
    assert(cont == List((1L, 2L, 1.0)), s"got $cont")
    // the same pair's Jaccard is 8/248 ≈ 0.032, under the 0.04 gate
    val jac = LlmOps.llmNgramJaccard.fn(spark, d.toString).collect()
    assert(jac.isEmpty, s"jaccard gate should miss the embedding: ${jac.toList}")
  }

  test("src_csv_quarantine: bad lines neither kill the parse nor vanish — raw text preserved") {
    val got = SourceOps.srcCsvQuarantine.fn(spark, sf).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("ok", null, 10L),
      ("quarantined", "9999,1,2,EXTRA_COLUMN", 1L),
      ("quarantined", "not_a_number,2,3.0", 1L)), s"got $got")
  }

  test("count-min partials merge to the whole-corpus sketch; estimates bound exact counts") {
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = graft.Tables.read(spark, sf, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
    def sketchOf(rows: Array[org.apache.spark.sql.Row]): Seq[CountMinSketch] =
      rows.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk"))).toSeq
    val perDay = sketchOf(ev.groupBy(col("day"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .collect())
    val merged = perDay.reduce { (a, b) => a.mergeInPlace(b); a }
    val whole = sketchOf(ev
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .collect()).head
    assert(java.util.Arrays.equals(merged.toByteArray, whole.toByteArray),
      "cell-wise merge of day partials must equal the whole-corpus sketch")
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (t, n) =>
      val est = merged.estimateCount(t)
      assert(est >= n, s"CMS may never undercount: $t est=$est exact=$n")
      assert(est <= n + (0.001 * merged.totalCount()).toLong + 1,
        s"estimate beyond the eps*N bound: $t est=$est exact=$n")
    }
    // and the registry op surfaces the same numbers
    val op = Aggregations.aggCountminSketch.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (t, n) =>
      assert(op(t)._1 == n && op(t)._2 == merged.estimateCount(t), s"$t: ${op(t)}")
    }
  }
}
