package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Plan + behavior audits for the second-wave pipeline ops (SURVEY §2.8).
  * Value correctness is the DuckDB oracle's job; these assert the SCALE
  * properties — shuffle counts, broadcast sides, exactness invariants —
  * that the oracle can't see.
  */
class PipelineOpsSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(plan(df)).length

  test("tfidf broadcasts the vocab-sized df side — no shuffle join") {
    val p = plan(PipelineOps.llmTfidfTopTerms.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("sessionize runs window + session agg on ONE user_id shuffle") {
    val df = PipelineOps.tsSessionize.fn(spark, sf)
    // one hash shuffle for the user_id window (the co-keyed groupBy reuses
    // it) + one range shuffle for the presentation sort — nothing else
    assert(shuffles(df) == 2, plan(df).take(1500))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // session invariants: indices are 1..n per user, durations non-negative
    rows.groupBy(_.getLong(0)).foreach { case (_, sess) =>
      val idx = sess.map(_.getLong(1)).sorted.toVector
      assert(idx == (1L to idx.length).toVector)
    }
    assert(rows.forall(r => r.getLong(5) >= 0 && r.getLong(2) >= 1))
  }

  test("z-score: decimal moments are merge-order independent; flags match σ") {
    val one = PipelineOps.tsZscoreAnomaly.fn(spark, sf)
    val r1 = one.collect().toSeq
    // repartitioning the input changes partial-agg merge order; decimal
    // sums must make the result bit-identical anyway
    val viaRepart = PipelineOps.tsZscoreAnomaly.fn(spark, sf)
    assert(viaRepart.repartition(7).orderBy("event_id").collect().toSeq
      .map(_.toSeq) == r1.map(_.toSeq))
    assert(r1.exists(_.getBoolean(6)), "corpus should contain |z|>2 outliers")
    r1.foreach { r =>
      val (z, flag) = (Option(r.get(5)).map(_.asInstanceOf[Double]), r.getBoolean(6))
      assert(flag == z.exists(v => math.abs(v) > 2.0))
    }
  }

  test("mix rebalance: every cell contributes exactly min-cell-size docs") {
    val rows = PipelineOps.llmMixRebalance.fn(spark, sf).collect()
    val perCell = rows.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length).toMap
    assert(perCell.values.toSet.size == 1,
      s"unequal cell contributions: ${perCell.values.toSet}")
    val docs = graft.Tables.read(spark, sf, "documents")
    val minCell = docs.groupBy("lang", "source").count()
      .agg(org.apache.spark.sql.functions.min("count")).head().getLong(0)
    assert(perCell.values.head.toLong == minCell)
  }

  test("quality quantile keeps ~top quarter per language, rank-exactly") {
    val kept = PipelineOps.llmQualityQuantile.fn(spark, sf).collect()
    val total = graft.Tables.read(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val n = total(lang)
      // percent_rank ≥ 0.75 keeps floor((n-1)/4)+1 of n rows — and the
      // lone-doc guard keeps exactly that 1 row when n = 1 (pr = 0)
      val expect = (n - 1) / 4 + 1
      assert(rows.length.toLong == expect, s"$lang: ${rows.length} vs $expect of $n")
    }
    assert(kept.forall(r => r.getDouble(3) >= 0.75 || total(r.getString(1)) == 1))
  }

  test("quality quantile keeps the lone doc of a single-doc language") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_qq").toString
    // 8 docs in 'en' plus ONE doc in 'zz' — without the lone-stratum
    // guard the zz row has percent_rank 0 and vanishes entirely
    val docs = ((1L to 8L).map(i =>
      (i, "en", s"the quick doc $i with some tokens", 30L)) :+
      (9L, "zz", "lone stratum document", 21L))
      .toDF("doc_id", "lang", "text", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = PipelineOps.llmQualityQuantile.fn(spark, dir).collect()
    val langs = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(langs("zz") == 1, "lone-language doc must survive the cut")
    assert(langs("en") == 2, "en keeps floor((8-1)/4)+1 = 2 docs")
  }

  test("embed normalize: unit norms, idempotent, zero-safe") {
    // registry row: (vec_id, label, norm_before, unit_norm, first_component)
    val rows = PipelineOps.llmEmbedNormalize.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getDouble(2) > 0)
        assert(math.abs(r.getDouble(3) - 1.0) < 1e-3, s"vec ${r.getLong(0)}")
    }
    // TRUE idempotence: feed the normalized output back through the
    // kernel — vectors must be fixed points (norm ≈ 1 ⇒ division by ~1
    // reproduces the same floats after the round trip within 1 ulp-ish)
    val once = PipelineOps.normalizeEmbeddings(
      graft.Tables.read(spark, sf, "embeddings"))
      .select(col("vec_id"), col("normalized").as("embedding"))
    val twice = PipelineOps.normalizeEmbeddings(once)
      .select(col("vec_id"), col("normalized"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val first = once.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    first.foreach { case (id, v) =>
      v.zip(twice(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= math.ulp(math.abs(a).max(1e-10f)) * 4,
          s"vec $id drifts on re-normalization: $a vs $b")
      }
    }
  }

  test("chunking covers every token; chunks respect size/stride") {
    val chunks = PipelineOps.llmDocChunking.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lens = graft.Tables.read(spark, sf, "documents")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val len = lens(doc)
      // starts are 1, 41, 81, ...; the chunk count is ceil(len / 40)
      assert(cs.length.toLong == (len + 39) / 40, s"doc $doc chunk count")
      cs.foreach { case (_, idx, start, n) =>
        assert(start == idx * 40 + 1 && n >= 1 && n <= 50, s"doc $doc chunk $idx")
      }
      // full coverage: last chunk reaches the final token
      val (_, _, lastStart, lastN) = cs.maxBy(_._2)
      assert(lastStart + lastN - 1 == len, s"doc $doc tail coverage")
    }
  }

  test("packing is gap-free: blocks fill contiguously in scramble order") {
    val rows = PipelineOps.llmPackBlocks.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, first, off, span) =>
      assert(off >= 0 && off < 256, s"doc $doc offset")
      // span is exactly the number of 256-blocks [first*256 + off, +n) touches
      assert(span == (off + n - 1) / 256 + 1, s"doc $doc span")
    }
    // global token positions are a gap-free prefix of the packed stream
    val total = rows.map(_._2).sum
    val maxEnd = rows.map { case (_, n, first, off, _) => first * 256 + off + n }.max
    assert(maxEnd == total, "packed stream has gaps or overlaps")
  }

  test("bloom prescreen has NO false negatives and a bounded flag rate") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val docs = graft.Tables.read(spark, sf, "documents")
    import org.apache.spark.sql.functions.col
    val bfHex = PipelineOps.bloomOf(docs.filter(col("doc_id") % 50 === 0))
      .map("%02X".format(_)).mkString
    // probing the very texts the sketch was built from must ALL hit
    val selfHits = docs.filter(col("doc_id") % 50 === 0)
      .selectExpr(s"graft_bloom_contains(X'$bfHex', xxhash64(text)) AS hit")
      .collect().map(_.getBoolean(0))
    assert(selfHits.nonEmpty && selfHits.forall(identity))
    // the registered op flags true dups + a small FP tail, never the bulk
    val flags = PipelineOps.llmBloomPrescreen.fn(spark, sf).collect()
    val rate = flags.count(_.getBoolean(1)).toDouble / flags.length
    assert(rate < 0.2, s"flag rate $rate — sketch too small or broken")
  }

  test("inverted index postings are sorted, deduplicated, and df-consistent") {
    val rows = PipelineOps.llmInvertedIndex.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val postings = r.getString(3).split(",").map(_.toLong).toSeq
      assert(postings == postings.distinct.sorted, r.getString(0))
      assert(postings.length.toLong == r.getLong(2), "df == |postings|")
      assert(r.getLong(1) >= r.getLong(2), "cf >= df")
    }
  }

  test("rankScan equals the sequential rank/prefix-sum, at any partitioning") {
    import spark.implicits._
    val data = (1 to 400).map(i => (s"tok_$i", (i * 13 % 37).toLong + 1))
    val grand = data.map(_._2).sum
    val expected = data.sortBy { case (t, n) => (-n, t) }
      .scanLeft(("", 0L, -1L, 0L)) { case ((_, _, id, cum), (t, n)) =>
        (t, n, id + 1, cum + n)
      }.tail
      .map { case (t, n, id, cum) => (id, t, n, cum, grand) }
    Seq(1, 5, 17).foreach { p =>
      val got = PipelineOps.rankScan(
        data.toDF("token", "n").repartition(p))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(got.toSeq == expected, s"input partitions=$p")
    }
  }
}
