package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Exact-reference + determinism audits for the graph ops and the
  * quantile sketch (no-oracle keys).
  */
class GraphOpsSpec extends SparkSpec {

  test("degree distribution sums back to the paired-node and edge counts") {
    val pairs = LlmOps.simhashPairs(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val dist = GraphOps.graphDegreeDistSimhash.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(dist.map(_._2).sum == nodes)
    // sum(degree * n_nodes) = 2 |E|
    assert(dist.map { case (d, n) => d * n }.sum == 2L * pairs.length)
  }

  test("pagerank equals the exact driver reference, bit for bit") {
    val pairsDf = LlmOps.simhashPairs(spark, sf).select("id1", "id2")
    val got = GraphOps.pageRank(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver reference replaying the exact operation sequence: per-edge
    // double division, per-node decimal(scale 15, HALF_UP) sum, damping
    // update in double
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val n = deg.size
    val damping = 0.85
    val base = (1.0 - damping) / n
    var ranks = deg.keys.map(_ -> 1.0 / n).toMap
    (1 to 5).foreach { _ =>
      val sums = scala.collection.mutable.Map
        .empty[Long, java.math.BigDecimal]
      edges.foreach { case (src, dst) =>
        val c = java.math.BigDecimal.valueOf(ranks(src) / deg(src))
          .setScale(15, java.math.RoundingMode.HALF_UP)
        sums(dst) = sums.getOrElse(dst, java.math.BigDecimal.ZERO).add(c)
      }
      ranks = sums.map { case (id, s) =>
        id -> (base + damping * s.doubleValue())
      }.toMap
    }
    assert(got.keySet == ranks.keySet)
    got.foreach { case (id, r) =>
      assert(r == ranks(id), s"doc $id: engine $r vs reference ${ranks(id)}")
    }
    // and bit-identical under a different input partitioning
    val gotRepart = GraphOps.pageRank(pairsDf.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotRepart == got)
  }

  test("star contraction equals union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 20 + trial * 10
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val nodes = (0L until n.toLong).toDF("doc_id")
      val got = LlmOps.dedupClusterRepStar(edges.toDF("id1", "id2"), nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0L until n.toLong).foreach { id =>
        assert(got(id) == find(id), s"trial $trial doc $id")
      }
    }
  }

  test("reliable-checkpoint seam: iterative ops run end-to-end on durable checkpoints") {
    // flip every Checkpoints.truncate site to reliable checkpoint() and
    // run the two iterative flagships end-to-end: results must equal the
    // default localCheckpoint path, and checkpoint data must actually
    // land in the checkpoint dir (proving the reliable path executed)
    val flag = graft.util.Checkpoints.Flag
    val pairsDf = LlmOps.simhashPairs(spark, sf).select("id1", "id2")
    val nodes = graft.Tables.read(spark, sf, "documents").select(col("doc_id"))
    // driverBudget=0 forces the distributed propagation loop — the path
    // whose per-round truncations the seam exists for
    val localClusters = LlmOps.dedupClusterRep(pairsDf, nodes, driverBudget = 0L)
      .collect().toSeq
    val localRanks = GraphOps.pageRank(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set(flag, "true")
    try {
      val reliableClusters = LlmOps.dedupClusterRep(pairsDf, nodes, driverBudget = 0L)
        .collect().toSeq
      val reliableRanks = GraphOps.pageRank(pairsDf).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(reliableClusters == localClusters)
      assert(reliableRanks == localRanks)
      val cpDir = spark.sparkContext.getCheckpointDir
      assert(cpDir.nonEmpty, "reliable path must install a checkpoint dir")
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(new java.net.URI(cpDir.get).getPath))
      val written =
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(written > 0, s"no checkpoint files under ${cpDir.get}")
    } finally spark.conf.unset(flag)
  }

  test("approx quantiles bracket the exact percentiles per group") {
    // registry row is scalar-split: (l_returnflag, q25, q50, q75, n)
    val approx = Aggregations.aggApproxQuantile.fn(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = graft.Tables.read(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, aq) =>
      val eq = exact(k)
      assert(aq.length == 3 && aq == aq.sorted, s"$k: quantiles unordered")
      // accuracy 10000 ⇒ rank error ≤ 1e-4·n; on this value range that is
      // well within 2% of the exact value
      aq.zip(eq).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.02, s"$k: approx $a vs exact $e")
      }
    }
  }

  private def triangles(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    GraphOps.triangleCount(edges.toDF("id1", "id2")).collect()(0).getLong(0)
  }

  test("link prediction: wedge-derived non-edges with exact Jaccard, edges excluded") {
    import spark.implicits._
    // 1-2, 2-3, 3-4, 1-3: non-edges (1,4) and (2,4) each share one
    // neighbor (the hub 3); every existing edge must be filtered out even
    // when it also closes a wedge (1-2 via hub 3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("id1", "id2")
    val got = GraphOps.linkPrediction(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(got == List((1L, 4L, 1L, 2L, 1L, 0.5), (2L, 4L, 1L, 2L, 1L, 0.5)),
      s"got $got")
  }

  test("triangle count on fixture graphs") {
    // one triangle + a pendant edge
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) == 1L)
    // K4 has 4 triangles; input deliberately unordered + duplicated
    assert(triangles(Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (2L, 1L))) == 4L)
    // square without diagonals has none; with one diagonal, two
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(triangles(square) == 0L)
    assert(triangles(square :+ (1L, 3L)) == 2L)
    // self-loops must not create triangles
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))) == 1L)
  }

  test("oracle-checked degree distribution conserves nodes/edges on the sharded jaccard graph") {
    val shard = col("doc_id") % 5 === 1
    val pairs = LlmOps.jaccardPairs(spark, LlmOps.docTokens(spark, sf).filter(shard))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val dist = GraphOps.graphDegreeDist.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(dist.map(_._2).sum == nodes)
    assert(dist.map { case (d, n) => d * n }.sum == 2L * pairs.length)
  }

  test("oracle-checked triangle count matches brute force on the sharded jaccard graph") {
    val shard = col("doc_id") % 5 === 1
    val edges = LlmOps.jaccardPairs(spark, LlmOps.docTokens(spark, sf).filter(shard))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val undirected = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.toSet
    val adj = undirected.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = undirected.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b): Long
    }.sum
    val got = GraphOps.graphTriangleCount.fn(spark, sf).collect()
    assert(got.length == 1 && got.head.getLong(0) == expected)
  }

  test("triangle count matches the brute-force reference on the real pair graph") {
    val pairs = LlmOps.simhashPairs(spark, sf).select("id1", "id2")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val undirected = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.toSet
    val adj = undirected.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = undirected.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b): Long
    }.sum
    assert(triangles(edges.toSeq) == expected)
  }
}
