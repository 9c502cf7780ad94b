package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.streaming.StreamingOps

/** Round-18 second wave: XML round-trip, BFS hop distance, n-gram
  * novelty, streaming windowed top-k, mean-shift changepoint. All five
  * are oracle-registered (values DuckDB-hash-checked at sf0.01 AND
  * sf0.1); these tests pin the properties the oracle cannot see —
  * encoding fidelity on hostile values, BFS minimality/bounds on
  * crafted graphs, and the structural invariants of the ranked/argmax
  * outputs.
  */
class Round18bSpec extends SparkSpec {

  test("src_xml_roundtrip: XML escaping round-trips hostile string values byte-exactly") {
    import spark.implicits._
    // every XML metacharacter class: element/entity chars, quotes,
    // whitespace-adjacent text — if the writer's escaping or the
    // reader's unescaping were lossy, equality would break
    val rows = Seq(
      (1L, "a<b&c>d"),
      (2L, "quote\"apos'"),
      (3L, "]]>cdata-terminator"),
      (4L, "&amp;already-escaped"),
      (5L, "tab\tand newline\nkept"))
    val dir = graft.util.TempDirs.create("xml_escape").toString
    rows.toDF("id", "s").write.mode("overwrite")
      .option("rowTag", "doc").xml(dir)
    val back = spark.read.option("rowTag", "doc")
      .schema("id BIGINT, s STRING").xml(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1),
      s"XML round-trip mutated values: ${back.toSeq}")
  }

  test("graph_bfs_distance: minimality, depth bound, and frontier semantics on crafted graphs") {
    import spark.implicits._
    // path 1-2-3-4-5 seeded at 1 (1 % 10 == 1): hop distances, and 5
    // (4 hops out) must be absent under the fixed depth-3 bound
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2")
    val got = GraphOps.bfsDistance(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"path distances wrong: $got")
    // diamond 1-2, 1-3, 2-4, 3-4: node 4 reachable two ways, dist must
    // be the MIN (2), proving the visited anti-join keeps first-visit
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("id1", "id2")
    val d = GraphOps.bfsDistance(diamond).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(4L) == 2L && d(2L) == 1L && d(3L) == 1L, s"diamond: $d")
    // two seeds (1 and 11), disjoint components: each node takes the
    // distance from ITS component's seed — multi-source, not per-seed
    val two = Seq((1L, 2L), (11L, 12L), (12L, 13L)).toDF("id1", "id2")
    val t = GraphOps.bfsDistance(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 0L, 2L -> 1L, 11L -> 0L, 12L -> 1L, 13L -> 2L),
      s"multi-source: $t")
  }

  test("llm_ngram_novelty: first doc fully novel, ratios bounded, short docs absent") {
    val out = graft.SparkEntry.queries("llm_ngram_novelty")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    // ingestion order: the lowest doc_id with >= 5 tokens sees an empty
    // prior corpus, so every one of its shingles is novel by definition
    val first = out.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1) && first.getDouble(3) == 1.0,
      s"first doc must be fully novel: $first")
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // docs under 5 tokens have no shingles and must not appear
    val shortDocs = Tables.read(spark, sf, "documents")
      .filter(size(split(col("text"), " ")) < 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !shortDocs.contains(r.getLong(0))))
  }

  test("stream_topk_per_window: per-bucket rank structure matches the batch counts") {
    val out = StreamingOps.streamTopkPerWindow.fn(spark, sf).collect()
    val byBucket = out.groupBy(_.getLong(0))
    byBucket.foreach { case (b, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.length <= 3 &&
        sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"bucket $b ranks: ${sorted.toSeq}")
      // counts non-increasing by rank; equal counts break ties by type asc
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getLong(3) > lo.getLong(3) ||
            (hi.getLong(3) == lo.getLong(3) &&
              hi.getString(2) < lo.getString(2)),
            s"bucket $b tie-break violated: $hi vs $lo")
        case _ =>
      }
    }
    // the rank-1 type per bucket IS the batch modal type under the same
    // tie-break — the streaming count stage lost nothing
    val batch = Tables.read(spark, sf, "events")
      .groupBy(expr("ts div 3600000000000").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))
          .orderBy(col("cnt").desc, col("event_type").asc)))
      .filter(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    byBucket.foreach { case (b, rows) =>
      val top = rows.minBy(_.getLong(1))
      assert(batch(b) == ((top.getString(2), top.getLong(3))),
        s"bucket $b: streaming top-1 ${top} != batch ${batch(b)}")
    }
  }

  test("bpeMergeFold == reference greedy scan on 400 randomized symbol arrays") {
    import spark.implicits._
    // symbols drawn so merged outputs collide with inputs ("a"+"a"="aa"
    // is itself a symbol) — the adversarial regime for greedy non-overlap
    val alphabet = Vector("a", "b", "aa", "ab", "ba")
    val rnd = new scala.util.Random(18)
    val cases = (1 to 400).map { i =>
      val syms = Vector.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length)))
      val (a, b) = (alphabet(rnd.nextInt(alphabet.length)),
        alphabet(rnd.nextInt(alphabet.length)))
      (i, syms, a, b)
    }
    def ref(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val got = cases.toDF("id", "s", "a", "b")
      .select(col("id"), PipelineOps.bpeMergeFold.as("w"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.foreach { case (i, syms, a, b) =>
      val want = ref(syms, a, b).mkString(" ")
      assert(got(i) == want,
        s"case $i: syms=$syms pair=($a,$b): fold '${got(i)}' != scan '$want'")
    }
  }

  test("bfsDistance == reference BFS on 60 randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(81)
    (1 to 60).foreach { _ =>
      val n = 2 + rnd.nextInt(10)
      val ids = (0 until n).map(_ => rnd.nextLong().abs % 100 + 1)
      val edges = (0 until n + rnd.nextInt(8)).map(_ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        val nodes = adj.keySet
        val seeds = nodes.filter(_ % 10 == 1)
        // reference multi-source BFS, depth <= 3
        var dist = seeds.map(_ -> 0L).toMap
        var frontier = seeds
        (1 to 3).foreach { r =>
          val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
            .diff(dist.keySet)
          dist = dist ++ next.map(_ -> r.toLong)
          frontier = next
        }
        val got = GraphOps.bfsDistance(edges.toDF("id1", "id2")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == dist, s"edges=$edges: engine $got != reference $dist")
      }
    }
  }

  test("llm_bpe_train_iters: greedy-leftmost non-overlap on the a=b adversarial run") {
    import spark.implicits._
    // "aaaa aaa": step-1 argmax is (a,a) with count 5; greedy leftmost
    // rewrites aaaa -> "aa aa" (NOT "aa a a" or "a aa a") and aaa ->
    // "aa a" — the merged "aa" must not re-merge with the next raw "a"
    // in the same pass. Step 2 then tie-breaks (aa,a) < (aa,aa) on the
    // b column; step 3 merges the remaining (aa,aa).
    val dir = graft.util.TempDirs.create("bpe_train_fixture")
    Seq((1L, "aaaa aaa", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val got = PipelineOps.llmBpeTrainIters.fn(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 5L), (2L, "aa", "a", 1L),
      (3L, "aa", "aa", 1L)), s"merge table: ${got.toSeq}")
  }

  test("graph_component_sizes: size-weighted histogram conserves the shard cardinality") {
    val out = graft.SparkEntry.queries("graph_component_sizes")(spark, sf)
      .collect()
    val weighted = out.map(r => r.getLong(0) * r.getLong(1)).sum
    val shard = Tables.read(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 1).count()
    assert(weighted == shard,
      s"sum(size * n_components) = $weighted must equal shard size $shard")
    assert(out.forall(r => r.getLong(0) >= 1 && r.getLong(1) >= 1))
  }

  test("llm_bpe_tokenize_apply: accounting consistent with the trained rewrite") {
    import spark.implicits._
    // same fixture as the train spec: after 3 merges the vocab is
    // aaaa -> "aa aa" (2 symbols... then (aa,aa) merges -> "aaaa", 1) and
    // aaa -> "aa a" -> "aaa" via (aa,a) at step 2 (1 symbol); the doc has
    // 2 words, 7 chars, and must therefore count 2 BPE tokens
    val dir = graft.util.TempDirs.create("bpe_apply_fixture")
    Seq((1L, "aaaa aaa", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val got = PipelineOps.llmBpeTokenizeApply.fn(spark, dir.toString).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 2L, 2L, 7L)), s"accounting: $r")
    assert(r.getDouble(4) == 3.5, s"compression: $r")
  }

  test("op_count_metadata_only: the footer count launches no Spark job") {
    val dir = graft.util.TempDirs.create("meta_count_spec").toString
    Tables.read(spark, sf, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val counts = SourceOps.metadataPartitionCounts(spark, dir, "lang")
    // the metadata probe itself runs during DataFrame CONSTRUCTION (the
    // footer loop) — only the trivial local collect of the built rows
    // may run after; assert the loop launched nothing
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"footer count must launch no Spark job ($before -> $after)")
    val got = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.read(spark, sf, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"metadata counts $got != data counts $want")
  }

  test("llm_span_corruption: mask accounting replayed from the hash law") {
    val out = graft.SparkEntry.queries("llm_span_corruption")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    def start(docId: Long, i: Long) =
      ((docId * 2654435761L + i * 40503L) % 1000000007L) % 20 == 0
    // replay the span law in the driver for a handful of docs
    out.take(25).foreach { r =>
      val (docId, n) = (r.getLong(0), r.getLong(1))
      val masked = (1L to n).map(i =>
        start(docId, i) || (i > 1 && start(docId, i - 1)) ||
          (i > 2 && start(docId, i - 2)))
      val sentinels = masked.zipWithIndex.count { case (m, idx) =>
        m && (idx == 0 || !masked(idx - 1)) }
      assert(r.getLong(2) == (1L to n).count(start(docId, _)), s"spans: $r")
      assert(r.getLong(3) == masked.count(identity), s"masked: $r")
      assert(r.getLong(4) == sentinels, s"sentinels: $r")
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(3) <= 3 * r.getLong(2),
        s"merge bounds: $r")
    }
    // corpus-level realized mask rate lands near the 15% design point
    val rate = out.map(_.getLong(3)).sum.toDouble / out.map(_.getLong(1)).sum
    assert(rate > 0.08 && rate < 0.22, s"corpus mask rate off-design: $rate")
  }

  test("llm_hard_negative_mine: negatives always cross labels and beat every other cross-label candidate") {
    val out = graft.SparkEntry.queries("llm_hard_negative_mine")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val anchors = Tables.read(spark, sf, "embeddings")
      .filter(col("vec_id") % 25 === 0).count()
    assert(out.length == anchors, "exactly one hardest negative per anchor")
    out.foreach { r =>
      assert(r.getInt(1) != r.getInt(3), s"negative must cross labels: $r")
      assert(r.getLong(0) != r.getLong(2))
    }
    // spot-check one anchor against a brute-force driver recompute
    val a = out.head
    val vecs = Tables.read(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val av = vecs.find(_._1 == a.getLong(0)).get
    val best = vecs.filter(_._3 != av._3)
      .map { case (id, v, l) =>
        val s = BigDecimal(graft.functions.VectorMath.dotD(av._2, v) /
          (graft.functions.VectorMath.normD(av._2) * graft.functions.VectorMath.normD(v)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, l, s)
      }.minBy { case (id, _, s) => (-s, id) }
    assert((a.getLong(2), a.getInt(3), a.getDouble(4)) == best,
      s"argmax mismatch: $a vs $best")
  }

  test("llm_mix_temperature: flattening direction and probability conservation") {
    val out = graft.SparkEntry.queries("llm_mix_temperature")(spark, sf)
      .collect()
    val pSum = out.map(_.getDouble(4)).sum
    assert(math.abs(pSum - 1.0) < 1e-9, s"p_sample must sum to 1: $pSum")
    assert(out.map(_.getLong(5)).sum <= 1000000L,
      "floor'd per-source draws cannot exceed the epoch budget")
    out.foreach { r =>
      val (n, w) = (r.getLong(1), r.getDouble(3))
      assert(w == BigDecimal(math.sqrt(n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"weight must be round(sqrt(n), 6): $r")
    }
    // temperature flattens RATIOS: for any two sources, the sampling
    // ratio is the sqrt of the corpus ratio (strictly closer to 1 for
    // unequal sizes) — checked on the extremes
    val big = out.maxBy(_.getLong(1))
    val small = out.minBy(_.getLong(1))
    if (big.getLong(1) > small.getLong(1)) {
      val corpusRatio = big.getDouble(2) / small.getDouble(2)
      val sampleRatio = big.getDouble(4) / small.getDouble(4)
      assert(sampleRatio < corpusRatio && sampleRatio > 1.0,
        s"flattening violated: corpus $corpusRatio vs sample $sampleRatio")
    }
  }

  test("ts_holt_winters: exact driver replay, weekday keying survives gap days") {
    import spark.implicits._
    // days 0, 1, 2, 8, 9: the gap (3..7 missing) means day 8 (w=1) must
    // read the seasonal slot day 1 wrote — %7 keying, not row position
    val days = Seq(0L, 1L, 2L, 8L, 9L)
    val vals = Seq(10.0, 14.0, 9.0, 20.0, 6.0)
    val dir = graft.util.TempDirs.create("hw_fixture")
    days.zip(vals).zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, day * 86400000000L * 1000L, 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("events.parquet").toString)
    val got = PipelineOps.tsHoltWinters.fn(spark, dir.toString).collect()
    // independent driver replay of the recursion on unrounded doubles
    var (l, b) = (0.0, 0.0)
    val sArr = Array.fill(7)(0.0)
    var first = true
    val want = days.zip(vals).map { case (day, x) =>
      val w = (day % 7).toInt
      if (first) {
        first = false; l = x; b = 0.0
        (day, x, x, 0.0, 0.0, None)
      } else {
        val sprev = sArr(w)
        val fc = l + b + sprev
        val lvl = 0.5 * (x - sprev) + 0.5 * (l + b)
        val tr = 0.5 * (lvl - l) + 0.5 * b
        val sn = 0.5 * (x - lvl) + 0.5 * sprev
        l = lvl; b = tr; sArr(w) = sn
        (day, x, lvl, tr, sn, Some(fc))
      }
    }
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, (day, x, lvl, tr, sn, fc)) =>
      assert(g.getLong(0) == day && g.getDouble(1) == x)
      assert(g.getDouble(2) == r6(lvl), s"level day $day: $g vs ${r6(lvl)}")
      assert(g.getDouble(3) == r6(tr), s"trend day $day")
      assert(g.getDouble(4) == r6(sn), s"seasonal day $day")
      fc match {
        case None => assert(g.isNullAt(5), s"first forecast must be NULL")
        case Some(f) => assert(g.getDouble(5) == r6(f), s"forecast day $day")
      }
    }
  }

  test("llm_nb_lang_classifier: confusion matrix partitions the test split exactly") {
    val out = graft.SparkEntry.queries("llm_nb_lang_classifier")(spark, sf)
      .collect()
    // every test doc classified exactly once: per-true-lang row sums of
    // the matrix equal the held-out split's doc counts
    val rowSums = out.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    val want = Tables.read(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rowSums == want, s"matrix row sums $rowSums != test split $want")
    // predicted classes come from the train split's label set
    val trainLangs = Tables.read(spark, sf, "documents")
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(1)).toSet.subsetOf(trainLangs))
  }

  test("ts_changepoint_meanshift: one argmax row per type, split partitions the series exactly") {
    val out = graft.SparkEntry.queries("ts_changepoint_meanshift")(spark, sf)
      .collect()
    val totals = Tables.read(spark, sf, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == totals.keySet,
      "exactly one row per event type")
    out.foreach { r =>
      val (nb, na) = (r.getLong(2), r.getLong(3))
      assert(nb > 0 && na > 0, s"both sides non-empty: $r")
      assert(nb + na == totals(r.getString(0)),
        s"split must partition the series: $r")
      val diff = math.abs(r.getDouble(5) - r.getDouble(6))
      assert(r.getLong(4) == math.floor(diff * 1000000).toLong,
        s"diff_micro must be the floor-scaled |Δmean|: $r")
    }
  }
}
