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
}
