package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench's stall-proofing decisions (pure functions —
  * no Spark): the BENCH_r14 lesson was that a loaded host can inflate
  * min-of-N cells 16–44× and cost a round its headline, so the detector
  * itself needs to be provably right about WHO gets re-timed and WHAT
  * counts as a stall.
  */
class BenchSpec extends AnyFunSuite {

  private val quiet = Map(
    "a" -> 0.1, "b" -> 0.2, "c" -> 0.3, "d" -> 0.4, "e" -> 0.5)

  test("a quiet sweep has no suspects") {
    assert(Bench.suspectCells(quiet).isEmpty)
  }

  test("a cell 10x over the median is suspect; sub-2s cells never are") {
    // median 0.3 => 5x-median threshold 1.5, but the 2 s floor governs:
    // 1.9 s stays, 3.0 s is re-timed
    val loaded = quiet + ("x" -> 1.9) + ("y" -> 3.0)
    assert(Bench.suspectCells(loaded) == Set("y"))
  }

  test("genuinely heavy registries raise the threshold with the median") {
    val heavy = Map("a" -> 4.0, "b" -> 5.0, "c" -> 6.0, "d" -> 22.0)
    // median 6.0 (upper-mid of the sorted evens) => threshold 30: a 22 s
    // cell in a ~5 s/query registry is plausibly real work, not a stall
    assert(Bench.suspectCells(heavy).isEmpty)
    // ...but past the threshold (median still 6.0 at five cells) it is
    assert(Bench.suspectCells(heavy + ("e" -> 31.0)) == Set("e"))
  }

  test("failed (infinite) cells are errors, never suspects") {
    val withFail = quiet + ("f" -> Double.PositiveInfinity)
    assert(Bench.suspectCells(withFail).isEmpty)
  }

  test("stalled = re-run beat the first measurement by >2x") {
    val first = Map("a" -> 10.0, "b" -> 10.0, "c" -> 0.3)
    // a: re-ran at 0.4 (25x better) -> stalled; b: re-ran at 9.0
    // (heavy query re-timed heavy) -> genuine; c: untouched
    val corrected = Map("a" -> 0.4, "b" -> 9.0, "c" -> 0.3)
    assert(Bench.stalledCells(first, corrected) == Seq("a"))
  }

  test("empty registry degrades to no suspects, no stalls") {
    assert(Bench.suspectCells(Map.empty).isEmpty)
    assert(Bench.stalledCells(Map.empty, Map.empty).isEmpty)
  }

  test("anchor ratio reads uniform inflation the stall detector ignores") {
    val anchor = (1 to 20).map(i => s"q$i" -> 0.3).toMap
    // a uniformly 1.3x-inflated host: every cell under the 5x-median
    // stall threshold, but the anchor median names the factor
    val inflated = anchor.view.mapValues(_ * 1.3).toMap
    assert(Bench.suspectCells(inflated).isEmpty)
    val r = Bench.anchorMedianRatio(inflated, anchor)
    assert(r.exists(x => math.abs(x - 1.3) < 1e-9), r.toString)
  }

  test("anchor ratio is None under 10 shared cells and ignores errors/zeros") {
    val anchor = (1 to 9).map(i => s"q$i" -> 0.3).toMap
    assert(Bench.anchorMedianRatio(anchor, anchor).isEmpty)
    val big = (1 to 12).map(i => s"q$i" -> 0.3).toMap
    val cur = big + ("q1" -> Double.PositiveInfinity) // failed cell drops out
    assert(Bench.anchorMedianRatio(cur, big + ("q2" -> 0.0)).nonEmpty)
  }

  test("loadAnchor parses the committed file shape and gates on sf") {
    val p = java.nio.file.Files.createTempFile("anchor", ".json")
    java.nio.file.Files.write(p,
      """{"cpus": 32, "sf": "sf0.1", "queries": {"q1_agg": 0.31, "q2": 1.5}}"""
        .getBytes("UTF-8"))
    val a = Bench.loadAnchor(p, "/root/testdata/sf0.1")
    assert(a == Map("q1_agg" -> 0.31, "q2" -> 1.5), a.toString)
    assert(Bench.loadAnchor(p, "/root/testdata/sf0.01").isEmpty, "sf mismatch must gate")
    assert(Bench.loadAnchor(p.resolveSibling("absent.json"), "/x/sf0.1").isEmpty)
  }

  test("loadAnchor parses the real committed BENCH_ANCHOR.json") {
    val a = Bench.loadAnchor(java.nio.file.Paths.get("BENCH_ANCHOR.json"),
      "/root/testdata/sf0.1")
    assert(a.size > 200, s"expected the full registry, got ${a.size}")
    assert(a.values.forall(v => v > 0 && v < 60), "timings must be sane seconds")
  }

  test("spike = reps disagreeing >3x; failed reps and singletons never spike") {
    val reps = Map(
      "steady" -> Seq(0.30, 0.35),          // within noise
      "spiky" -> Seq(1.75, 0.25),           // the ts_daily_active_users shape
      "edge" -> Seq(1.2, 0.4),              // exactly 3x: NOT a spike (>3x)
      "one_failed" -> Seq(Double.PositiveInfinity, 0.2), // error, not spike
      "single" -> Seq(0.4))
    assert(Bench.spikeCells(reps) == Set("spiky"))
  }

  test("rep median is the noise-robust mid, ignoring failed reps") {
    assert(Bench.repMedian(Seq(0.25, 1.75, 0.28)) == 0.28)
    assert(Bench.repMedian(Seq(0.2, Double.PositiveInfinity, 0.3)) == 0.3)
    assert(Bench.repMedian(Seq(Double.PositiveInfinity)).isInfinite)
  }

  test("rep metrics serialize as locale-proof JSON") {
    val j = Bench.RepMetrics(12L, 1.5, 0.0, 340L).json
    assert(j == """{"gc_ms":12,"shuffle_read_mb":1.5,"shuffle_write_mb":0.0,"max_task_ms":340}""")
  }
}
