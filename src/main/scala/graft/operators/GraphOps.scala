package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.util.Checkpoints.Truncate

/** Graph analytics over the document-similarity graph (the simhash
  * near-dup pairs) — the "what structure does my near-dup graph have"
  * companion to cluster resolution.
  *
  * Scale shape: both ops run on the PAIRED subgraph only (edge list ≪
  * corpus, exactly like cluster resolution); PageRank is the canonical
  * iterative DataFrame loop — per iteration one (edges ⋈ ranks) shuffle
  * + one hash agg, `Checkpoints.truncate` truncating lineage (reliable
  * checkpoints under `spark.graft.reliableCheckpoints=true`) — with the §2.0
  * determinism discipline applied to floats: per-edge contributions are
  * single IEEE-exact double divisions, the per-node SUM accumulates in
  * DECIMAL(30,15) (merge-order independent), and the damping update is a
  * fixed double expression — so every iteration, and therefore the
  * result, is bit-deterministic regardless of partitioning (spec-proven
  * against an exact driver reference and under repartitioning).
  */
object GraphOps {

  /** The SQL-portable pair CTE shared by the oracle-checked graph ops:
    * the exact-Jaccard τ=0.9 edge set on the deterministic `doc_id % 5 = 1`
    * shard — the SAME scoping (and for the same reason) as
    * `llm_dedup_keep_best`: the oracle's token self-join is quadratic in
    * clique size, and the shard keeps DuckDB at seconds while the engine
    * path exercised is the identical full `jaccardPairs` machinery.
    */
  private val jaccardPairsCte =
    """WITH docs AS (SELECT * FROM documents WHERE doc_id % 5 = 1),
       toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                        CAST(COUNT(*) AS BIGINT) AS inter
                 FROM toks a JOIN toks b
                   ON a.tok = b.tok AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id),
       pairs AS (SELECT id1, id2 FROM inter
                 JOIN sizes s1 ON id1 = s1.doc_id
                 JOIN sizes s2 ON id2 = s2.doc_id
                 WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.9)"""

  /** Sharded exact-Jaccard pair list (engine side of [[jaccardPairsCte]]),
    * materialized once per (session, corpus) in
    * [[LlmOps.shardedJaccardPairs]] — five registry ops consume the
    * identical pair join.
    */
  private def shardedJaccardPairs(s: SparkSession, d: String): DataFrame =
    LlmOps.shardedJaccardPairs(s, d)

  /** Degree distribution of the near-dup similarity graph: degree per
    * paired doc, then histogram (degree → node count). Two hash aggs on
    * the edge list. Runs on the exact-Jaccard sharded edge set so it is
    * fully DuckDB-oracled (all integers, hash-checked); the banded-simhash
    * flavor stays registered as [[graphDegreeDistSimhash]] — the 100 TB
    * scale demo, where the edge list comes from LSH banding instead of the
    * exact pair join.
    */
  val graphDegreeDist: Q = Q(
    "graph_degree_dist",
    (s, d) => {
      val p = shardedJaccardPairs(s, d)
      val deg = p.select(col("id1").as("id"))
        .union(p.select(col("id2").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(asc_nulls_first("degree"))
    },
    Some(jaccardPairsCte +
      """, deg AS (SELECT id, COUNT(*) AS degree
                   FROM (SELECT id1 AS id FROM pairs
                         UNION ALL SELECT id2 AS id FROM pairs)
                   GROUP BY id)
         SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY degree ORDER BY degree NULLS FIRST"""))

  /** The banded-simhash degree distribution — same two hash aggs, but
    * the edge list is the Hamming≤3 simhash pair set. Fully
    * oracle-checked since the portable-hash fingerprint swap (r19):
    * the oracle is [[LlmOps.simhashPairsSql]] + the identical SQL tail
    * the exact-Jaccard flavor uses (conservation spec + scale demo
    * retained; see SCALE.md).
    */
  val graphDegreeDistSimhash: Q = Q(
    "graph_degree_dist_simhash",
    (s, d) => {
      // materialized once: the union references the pair list twice, and
      // without this the whole simhash subtree (corpus scans included)
      // re-expands per reference (ScanAuditSpec pins the bound)
      val p = LlmOps.simhashPairs(s, d).select(col("id1"), col("id2")).truncated
      val deg = p.select(col("id1").as("id"))
        .union(p.select(col("id2").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(asc_nulls_first("degree"))
    },
    Some(LlmOps.simhashPairsSql(3) +
      """, deg AS (SELECT id, COUNT(*) AS degree
                   FROM (SELECT id1 AS id FROM pairs
                         UNION ALL SELECT id2 AS id FROM pairs)
                   GROUP BY id)
         SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY degree ORDER BY degree NULLS FIRST"""))

  /** PageRank over the (symmetrized) similarity graph: damping 0.85,
    * FIXED 5 iterations, restricted to paired nodes. Runs on the
    * exact-Jaccard sharded edge set so even the ITERATIVE float loop is
    * DuckDB-oracled bit-for-bit: the §2.0 determinism discipline
    * (per-edge double division → DECIMAL(30,15) cast → exact decimal SUM
    * → one double damping update per round) makes every iteration a
    * fixed IEEE operation sequence BOTH engines can replay — the oracle
    * is a recursive CTE whose recursive term joins edges and GROUP-BYs
    * the decimal contributions per destination, with every float literal
    * cast to DOUBLE so DuckDB's decimal-literal default cannot change
    * the arithmetic. The banded-simhash flavor stays registered as
    * [[graphPagerankSimhash]] (scale demo + exact driver-reference
    * spec).
    */
  val graphPagerank: Q = Q(
    "graph_pagerank",
    (s, d) =>
      pageRank(shardedJaccardPairs(s, d))
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy(desc("rank"), asc_nulls_first("doc_id")),
    Some(jaccardPairsCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """, edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                     UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
          deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
          nb AS (SELECT count(*) AS n,
                        (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / count(*)
                          AS base
                 FROM deg),
          pr AS (SELECT 0 AS it, d.src AS id, CAST(1.0 AS DOUBLE) / nb.n AS rank
                 FROM deg d CROSS JOIN nb
                 UNION ALL
                 SELECT r.it + 1, e.dst AS id,
                        min(nb.base) + CAST(0.85 AS DOUBLE)
                          * CAST(sum(CAST(r.rank / d.deg AS DECIMAL(30,15)))
                                 AS DOUBLE) AS rank
                 FROM pr r
                 JOIN edges e ON e.src = r.id
                 JOIN deg d ON d.src = r.id
                 CROSS JOIN nb
                 WHERE r.it < 5
                 GROUP BY r.it, e.dst)
          SELECT id AS doc_id, rank FROM pr WHERE it = 5
          ORDER BY rank DESC, doc_id NULLS FIRST"""))

  /** Banded-simhash PageRank — identical engine ([[pageRank]]),
    * Hamming≤3 simhash edge set. Fully oracle-checked since the
    * portable-hash fingerprint swap (r19): the oracle reuses
    * [[graphPagerank]]'s recursive-CTE iteration tail verbatim over
    * [[LlmOps.simhashPairsSql]]'s pair set — the same §2.0 fixed IEEE
    * operation sequence, now replayed on the banded graph too (exact
    * driver-reference + repartitioning-invariance spec retained).
    */
  val graphPagerankSimhash: Q = Q(
    "graph_pagerank_simhash",
    (s, d) => {
      val pairs = LlmOps.simhashPairs(s, d).select(col("id1"), col("id2"))
      pageRank(pairs)
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy(desc("rank"), asc_nulls_first("doc_id"))
    },
    Some(LlmOps.simhashPairsSql(3).replaceFirst("WITH", "WITH RECURSIVE") +
      """, edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                     UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
          deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
          nb AS (SELECT count(*) AS n,
                        (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / count(*)
                          AS base
                 FROM deg),
          pr AS (SELECT 0 AS it, d.src AS id, CAST(1.0 AS DOUBLE) / nb.n AS rank
                 FROM deg d CROSS JOIN nb
                 UNION ALL
                 SELECT r.it + 1, e.dst AS id,
                        min(nb.base) + CAST(0.85 AS DOUBLE)
                          * CAST(sum(CAST(r.rank / d.deg AS DECIMAL(30,15)))
                                 AS DOUBLE) AS rank
                 FROM pr r
                 JOIN edges e ON e.src = r.id
                 JOIN deg d ON d.src = r.id
                 CROSS JOIN nb
                 WHERE r.it < 5
                 GROUP BY r.it, e.dst)
          SELECT id AS doc_id, rank FROM pr WHERE it = 5
          ORDER BY rank DESC, doc_id NULLS FIRST"""))

  /** Iterative engine (unit-test seam). Every node of the symmetrized
    * pair graph has degree ≥ 1 and ≥ 1 in-edge, so there are no dangling
    * nodes and no rank dropout; N is the paired-node count.
    */
  private[operators] def pageRank(pairs: DataFrame, iters: Int = 5,
                                  damping: Double = 0.85): DataFrame = {
    // callers pass a materialized pair table (the cached shardedJaccardPairs
    // / simhashPairs); re-truncating it here would be one wasted eager job
    val p = pairs
    val edges = p.select(col("id1").as("src"), col("id2").as("dst"))
      .union(p.select(col("id2").as("src"), col("id1").as("dst")))
      .truncated
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .truncated
    val n = deg.count()
    require(n > 0, "pair graph is empty — nothing to rank")
    val base = (1.0 - damping) / n
    // edges/deg are materialized ONCE above and referenced every round;
    // with a fixed small iteration count the rank lineage stays bounded,
    // so the rounds compose into ONE lazy plan (single job) instead of an
    // eager materialization per round — for large `iters`, reinstate a
    // truncation every few rounds to bound lineage
    var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("rank"))
    (1 to iters).foreach { _ =>
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
      ranks = contribs.groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(30, 15))).as("s"))
        .select(col("dst").as("id"),
          (lit(base) + lit(damping) * col("s").cast(DoubleType)).as("rank"))
    }
    ranks
  }

  /** Triangle count of the similarity graph — the standard clustering /
    * community-density probe over the near-dup pair set (a corpus whose
    * near-dup graph is triangle-heavy has clone CLUSTERS, not just pairs
    * — exactly what `llm_dedup_cluster_rep` then collapses). Node-
    * iterator algorithm with DEGREE-ORDERED edge orientation (each edge
    * points from its lower-(degree, id) endpoint to the higher): every
    * wedge is enumerated exactly once at its lowest-ordered vertex, and
    * a vertex's out-degree under this orientation is O(√m), which bounds
    * the wedge blow-up — the textbook mitigation for the skew that id-
    * ordered orientation suffers when a hub lands on a low id. Three
    * equi-joins, no iteration. Runs on the exact-Jaccard sharded edge set
    * ([[jaccardPairsCte]]) so the count is DuckDB-oracled bit-for-bit
    * (the oracle's a<b<c 3-way self-join is orientation-free — triangle
    * count is orientation-independent, so both formulations agree by
    * construction); the banded-simhash flavor stays registered as
    * [[graphTriangleCountSimhash]] for scale.
    */
  val graphTriangleCount: Q = Q(
    "graph_triangle_count",
    (s, d) => triangleCount(shardedJaccardPairs(s, d)),
    Some(jaccardPairsCte +
      """ SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM pairs e1
          JOIN pairs e2 ON e2.id1 = e1.id2
          JOIN pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2"""))

  /** Banded-simhash triangle count — identical engine
    * ([[triangleCount]]), Hamming≤3 simhash edge set. Fully
    * oracle-checked since the portable-hash fingerprint swap (r19):
    * [[LlmOps.simhashPairsSql]] + the exact flavor's orientation-free
    * a<b<c tail (brute-force-reference spec + scale demo retained).
    */
  val graphTriangleCountSimhash: Q = Q(
    "graph_triangle_count_simhash",
    (s, d) => triangleCount(
      LlmOps.simhashPairs(s, d).select(col("id1"), col("id2"))),
    Some(LlmOps.simhashPairsSql(3) +
      """ SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM pairs e1
          JOIN pairs e2 ON e2.id1 = e1.id2
          JOIN pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2"""))

  /** Engine (unit-test seam): input is an undirected pair list (either
    * column order, duplicates/self-loops tolerated); output is one row
    * `n_triangles`.
    */
  private[operators] def triangleCount(pairs: DataFrame): DataFrame = {
    // input arrives materialized (cached pair tables at every call site);
    // it is referenced once, so truncating it here bought nothing
    val p = pairs
    val und = p.select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .truncated
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient each edge from its lower-(deg, id) endpoint; carry the
    // orientation key of the destination so wedge pairs order the same way
    val dir = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            struct(col("db").as("kDeg"), col("b").as("kId")).as("dstKey")))
          .otherwise(
            struct(col("b").as("src"), col("a").as("dst"),
              struct(col("da").as("kDeg"), col("a").as("kId")).as("dstKey")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dstKey").as("dstKey"))
      .truncated
    val wedges = dir.select(col("src"), col("dst").as("v"), col("dstKey").as("vKey"))
      .join(dir.select(col("src"), col("dst").as("w"), col("dstKey").as("wKey")),
        "src")
      .filter(col("vKey") < col("wKey"))
      .select(col("v"), col("w"))
    wedges
      .join(dir.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Link prediction by common neighbors + neighbor-Jaccard — "these two
    * docs aren't flagged as near-dups, but they share so many near-dup
    * neighbors that they probably are" (the transitive-miss recovery pass
    * a dedup pipeline runs after banding). Candidate pairs come from the
    * wedge join (two edges sharing an endpoint — the triangle-count
    * shuffle shape, bounded by Σdeg²), existing edges are removed with
    * one left_anti join, and the score is jaccard = common /
    * (deg(a) + deg(b) − common), a single exact-operand division. Top-20
    * by (score, common, pair) — a unique key, so TakeOrderedAndProject
    * emits a deterministic set. Simhash graph → not SQL-portable; fixture
    * spec pins the wedge/score math exactly.
    *
    * This op runs on the WIDER Hamming≤5 simhash graph (the dedup ops
    * stay at the complete ≤3 radius): at small scale the ≤3 graph is so
    * sparse that every wedge is already closed — 17 edges / 0 open
    * wedges at sf0.01 — which left the end-to-end rows-check vacuous.
    * The denser radius gives the transitive-miss recovery pass real
    * candidates to rank at every scale while keeping the identical
    * chunk-join plan shape.
    */
  val graphLinkPrediction: Q = Q(
    "graph_link_prediction",
    (s, d) => linkPrediction(shardedJaccardPairs(s, d)),
    Some(jaccardPairsCte +
      """, adj AS (SELECT id1 AS id, id2 AS nb FROM pairs
                   UNION ALL SELECT id2 AS id, id1 AS nb FROM pairs),
          deg AS (SELECT id, COUNT(*) AS deg FROM adj GROUP BY id),
          wedges AS (SELECT x.nb AS a, y.nb AS b, COUNT(*) AS common
                     FROM adj x JOIN adj y ON x.id = y.id AND x.nb < y.nb
                     GROUP BY x.nb, y.nb),
          cand AS (SELECT w.a, w.b, w.common FROM wedges w
                   ANTI JOIN pairs p ON w.a = p.id1 AND w.b = p.id2)
          SELECT c.a, c.b, c.common, da.deg AS deg_a, db.deg AS deg_b,
                 CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common)
                   AS jaccard
          FROM cand c
          JOIN deg da ON da.id = c.a
          JOIN deg db ON db.id = c.b
          ORDER BY jaccard DESC, common DESC,
                   a NULLS FIRST, b NULLS FIRST LIMIT 20"""))

  /** Radius-5 banded-simhash link prediction — the original wider-graph
    * registration (at small scale the Hamming≤3 graph has no open
    * wedges, and the ≤5 graph is the denser scale demo); identical
    * engine. Fully oracle-checked since the portable-hash fingerprint
    * swap (r19) — and the radius-5 oracle is the interesting one: the
    * 4-chunk banding is recall-APPROXIMATE past Hamming 3 (5 flipped
    * bits can touch all 4 chunks), so [[LlmOps.simhashPairsSql]] states
    * the banded subset (Hamming ≤ 5 AND ≥1 equal chunk), not the
    * brute-force truth — the oracle pins exactly what the engine
    * computes, chunk condition included (fixture spec retained).
    */
  val graphLinkPredictionSimhash: Q = Q(
    "graph_link_prediction_simhash",
    (s, d) => linkPrediction(
      LlmOps.simhashPairs(s, d, maxHamming = 5).select(col("id1"), col("id2"))),
    Some(LlmOps.simhashPairsSql(5) +
      """, adj AS (SELECT id1 AS id, id2 AS nb FROM pairs
                   UNION ALL SELECT id2 AS id, id1 AS nb FROM pairs),
          deg AS (SELECT id, COUNT(*) AS deg FROM adj GROUP BY id),
          wedges AS (SELECT x.nb AS a, y.nb AS b, COUNT(*) AS common
                     FROM adj x JOIN adj y ON x.id = y.id AND x.nb < y.nb
                     GROUP BY x.nb, y.nb),
          cand AS (SELECT w.a, w.b, w.common FROM wedges w
                   ANTI JOIN pairs p ON w.a = p.id1 AND w.b = p.id2)
          SELECT c.a, c.b, c.common, da.deg AS deg_a, db.deg AS deg_b,
                 CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common)
                   AS jaccard
          FROM cand c
          JOIN deg da ON da.id = c.a
          JOIN deg db ON db.id = c.b
          ORDER BY jaccard DESC, common DESC,
                   a NULLS FIRST, b NULLS FIRST LIMIT 20"""))

  /** Engine (unit-test seam): undirected edge list (a < b per row,
    * deduplicated) → non-edge pairs ranked by common-neighbor Jaccard.
    */
  private[operators] def linkPrediction(pairs: DataFrame): DataFrame = {
    val p = pairs // materialized by the caller (cached pair tables)
    // symmetrize: one row per (node, neighbor) direction
    val adj = p.select(col("id1").as("id"), col("id2").as("nb"))
      .unionByName(p.select(col("id2").as("id"), col("id1").as("nb")))
      .truncated
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // wedge join: two distinct neighbors of the same hub form a candidate
    val wedges = adj.select(col("id").as("hub"), col("nb").as("a"))
      .join(adj.select(col("id").as("hub"), col("nb").as("b")), "hub")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    wedges
      .join(p.select(col("id1").as("a"), col("id2").as("b")),
        Seq("a", "b"), "left_anti")
      .join(deg.select(col("id").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jaccard", col("common").cast(DoubleType) /
        (col("deg_a") + col("deg_b") - col("common")))
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        col("jaccard"))
      .orderBy(desc("jaccard"), desc("common"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Multi-source BFS hop distance over the similarity graph — "how far
    * is every document from a seed set along near-dup edges" (the
    * contagion query behind contamination-spread auditing: if a seed doc
    * is bad, its radius-k near-dup neighborhood is suspect). Textbook
    * frontier BFS as an iterative DataFrame loop: each round joins ONLY
    * the newly-discovered frontier against the edge list (one equi-join
    * keyed by node id) and anti-joins the visited set, so per-round cost
    * tracks the frontier×degree product, never revisiting settled nodes
    * — the same bounded-rounds shape every distributed BFS (Pregel-style)
    * uses at 100 TB scale, with `Checkpoints.truncate` bounding lineage
    * per round. Depth is FIXED at 3 (the audit radius), so the loop is 3
    * joins, not a convergence loop. Seeds = paired nodes with
    * `doc_id % 10 = 1`. Runs on the exact-Jaccard sharded edge set
    * ([[jaccardPairsCte]]); all-integer output, so the oracle is a
    * depth-bounded recursive CTE whose `min(d)` replays BFS's
    * first-visit distance exactly.
    */
  val graphBfsDistance: Q = Q(
    "graph_bfs_distance",
    (s, d) => bfsDistance(shardedJaccardPairs(s, d)),
    Some(jaccardPairsCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """, edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                     UNION SELECT id2 AS src, id1 AS dst FROM pairs),
          bfs AS (SELECT DISTINCT src AS node, 0 AS d FROM edges
                  WHERE src % 10 = 1
                  UNION
                  SELECT e.dst AS node, b.d + 1 AS d
                  FROM bfs b JOIN edges e ON e.src = b.node
                  WHERE b.d < 3)
          SELECT node AS doc_id, CAST(min(d) AS BIGINT) AS dist
          FROM bfs GROUP BY node ORDER BY doc_id NULLS FIRST"""))

  /** Engine (unit-test seam): undirected pair list → (doc_id, dist) for
    * every node within `maxHops` of the seed predicate, dist = exact
    * hop count (first-visit BFS distance).
    */
  private[operators] def bfsDistance(pairs: DataFrame, maxHops: Int = 3)
      : DataFrame = {
    val p = pairs // materialized by the caller (cached pair tables)
    val edges = p.select(col("id1").as("src"), col("id2").as("dst"))
      .union(p.select(col("id2").as("src"), col("id1").as("dst")))
      .truncated
    val seeds = edges.select(col("src").as("doc_id")).distinct()
      .filter(col("doc_id") % 10 === 1)
      .withColumn("dist", lit(0L))
      .truncated
    var dist = seeds
    var frontier = seeds.select(col("doc_id"))
    (1 to maxHops).foreach { r =>
      val discovered = frontier
        .join(edges, frontier("doc_id") === edges("src"))
        .select(col("dst").as("doc_id")).distinct()
        .join(dist, Seq("doc_id"), "left_anti")
        .truncated
      dist = dist.unionByName(
        discovered.withColumn("dist", lit(r.toLong))).truncated
      frontier = discovered
    }
    dist.orderBy(asc_nulls_first("doc_id"))
  }

  /** Connected-component SIZE DISTRIBUTION of the similarity graph —
    * the dedup-accounting histogram (how many singletons, how many
    * pairs, how big is the largest clone cluster): the one-line answer
    * to "what will dedup actually delete", and the roll-up of
    * `llm_dedup_keep_best`'s per-doc cluster table. Reuses the identical
    * budget-gated component engine ([[LlmOps.dedupClusterRep]]: driver
    * union-find under budget, distributed min-label propagation past
    * it), then two metadata-sized hash aggs (distinct clusters →
    * size histogram). Singleton docs (shard docs in no pair) count as
    * size-1 components — the histogram covers the WHOLE shard, so the
    * size-weighted sum equals the shard cardinality
    * (spec-pinned conservation). Runs on the exact-Jaccard sharded edge
    * set ([[jaccardPairsCte]]); all integers → fully DuckDB-oracled via
    * the same recursive-CTE min-label closure as `llm_dedup_keep_best`.
    */
  val graphComponentSizes: Q = Q(
    "graph_component_sizes",
    (s, d) => {
      val docs = Tables.read(s, d, "documents")
        .filter(col("doc_id") % 5 === 1).select(col("doc_id"))
      LlmOps.dedupClusterRep(shardedJaccardPairs(s, d), docs)
        .select(col("cluster"), col("cluster_size")).distinct()
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_components"))
        .orderBy(asc_nulls_first("cluster_size"))
    },
    Some(jaccardPairsCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """, edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                     UNION SELECT id2 AS src, id1 AS dst FROM pairs),
          cc AS (SELECT doc_id AS node, doc_id AS label FROM docs
                 UNION
                 SELECT e.src AS node, cc.label
                 FROM edges e JOIN cc ON cc.node = e.dst
                 WHERE cc.label < e.src),
          lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
          csz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
                  FROM lab GROUP BY cluster)
          SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_components
          FROM csz GROUP BY cluster_size
          ORDER BY cluster_size NULLS FIRST"""))

  /** Global clustering coefficient C = 3·triangles / wedges — the
    * transitivity of the near-dup graph ("if A~B and B~C, how often
    * A~C"): high C means clone CLUSTERS (banding missed pairs are
    * recoverable via `graph_link_prediction`), low C means isolated
    * pairs. Composes the two proven subtrees — the degree-ordered
    * node-iterator triangle count and a Σdeg(deg−1)/2 wedge rollup of
    * the degree table — into one 1-row cross join; both counts are
    * exact integers, the coefficient one exact-operand double
    * division. Exact-Jaccard sharded edge set → fully oracled.
    */
  val graphClusteringCoeff: Q = Q(
    "graph_clustering_coeff",
    (s, d) => {
      // already truncated+cached by the shared shardedJaccardPairs map
      val p = shardedJaccardPairs(s, d)
      val tri = triangleCount(p)
      val deg = p.select(col("id1").as("id"))
        .union(p.select(col("id2").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val wedges = deg.agg(
        sum(col("deg") * (col("deg") - 1) / 2).cast(LongType).as("n_wedges"))
      tri.crossJoin(wedges)
        .select(col("n_triangles"), col("n_wedges"),
          when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges"))
            .as("clustering_coeff"))
    },
    Some(jaccardPairsCte +
      """, tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                   FROM pairs e1
                   JOIN pairs e2 ON e2.id1 = e1.id2
                   JOIN pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2),
          deg AS (SELECT id, COUNT(*) AS deg
                  FROM (SELECT id1 AS id FROM pairs
                        UNION ALL SELECT id2 AS id FROM pairs)
                  GROUP BY id),
          w AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
                FROM deg)
          SELECT t.n_triangles, w.n_wedges,
                 CASE WHEN w.n_wedges > 0
                      THEN CAST(3.0 AS DOUBLE) * t.n_triangles / w.n_wedges
                 END AS clustering_coeff
          FROM tri t CROSS JOIN w"""))

  /** Degree assortativity of the similarity graph — the Pearson
    * correlation of endpoint degrees over the (symmetrized) edge list:
    * r > 0 means clones cluster with equally-cloned docs (hub-hub),
    * r < 0 means hubs attach to leaves (template + variants, the
    * boilerplate signature). Two hash aggs (degrees, then integer edge
    * moments Σx Σy Σxy Σx² Σy²) + one closed-form double expression
    * rounded 6 dp — the `agg_corr_manual` discipline on graph
    * structure; zero-variance degenerates to NULL identically in both
    * engines. Exact-Jaccard sharded edge set → fully oracled.
    */
  val graphAssortativity: Q = Q(
    "graph_assortativity",
    (s, d) => {
      // already truncated+cached by the shared shardedJaccardPairs map
      val p = shardedJaccardPairs(s, d)
      val edges = p.select(col("id1").as("src"), col("id2").as("dst"))
        .union(p.select(col("id2").as("src"), col("id1").as("dst")))
        .truncated
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val m = edges
        .join(deg.select(col("src"), col("deg").as("dx")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("dy")), "dst")
        .agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
      m.select(col("m"),
        expr("""CASE WHEN m * sxx - sx * sx <= 0 OR m * syy - sy * sy <= 0
                     THEN NULL
                ELSE round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                           / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                              * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                END""").as("assortativity"))
    },
    Some(jaccardPairsCte +
      """, edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                     UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
          deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
          m AS (SELECT CAST(count(*) AS BIGINT) AS m,
                       CAST(sum(a.deg) AS BIGINT) AS sx,
                       CAST(sum(b.deg) AS BIGINT) AS sy,
                       CAST(sum(a.deg * b.deg) AS BIGINT) AS sxy,
                       CAST(sum(a.deg * a.deg) AS BIGINT) AS sxx,
                       CAST(sum(b.deg * b.deg) AS BIGINT) AS syy
                FROM edges e
                JOIN deg a ON a.src = e.src
                JOIN deg b ON b.src = e.dst)
          SELECT m,
                 CASE WHEN m * sxx - sx * sx <= 0 OR m * syy - sy * sy <= 0
                      THEN NULL
                 ELSE round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                            / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                               * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                 END AS assortativity
          FROM m"""))

  val all: Seq[Q] = Seq(graphDegreeDist, graphDegreeDistSimhash,
    graphPagerank, graphPagerankSimhash, graphTriangleCount,
    graphTriangleCountSimhash, graphLinkPrediction,
    graphLinkPredictionSimhash, graphBfsDistance, graphComponentSizes,
    graphClusteringCoeff, graphAssortativity)
}
