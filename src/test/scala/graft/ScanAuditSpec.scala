package graft

/** Registry-wide corpus-scan audit — the systemic form of the round-13
  * `ts_weekday_profile` lesson: Catalyst re-expands a shared aggregate
  * subtree that feeds both a rollup and a join side into REPEATED full
  * corpus scans unless the subtree is materialized once. This spec
  * executes every registered batch query's plan and counts `FileScan`s
  * per CORPUS table (temp-dir scans of an op's own outputs are ignored):
  * more than three scans of one table is a re-expansion bug, not a
  * design choice — every legitimate multi-pass op in the registry
  * (MAD's two count passes + final, snapshot-diff's derived snapshots)
  * needs at most three. Streaming ops are excluded: invoking their fn
  * RUNS the pipeline, and their returned plan reads the result table,
  * not the corpus.
  */
class ScanAuditSpec extends SparkSpec {

  test("no batch op scans the same corpus table more than 3 times") {
    val scanRe = ("FileScan \\w+ \\[[^\\]]*\\].*?" +
      "Location: [^\\[]*\\[([^\\]]*)\\]").r
    val offenders = SparkEntry.allQueries
      .filterNot(_.name.startsWith("stream_"))
      .flatMap { q =>
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString()
        // a plan under the cache discipline prints its cached subtree's
        // FileScan once PER REFERENCE, but the scan executes once — the
        // textual count over-reports exactly the ops that already fixed
        // the problem, so they are exempt
        if (plan.contains("InMemoryTableScan")) Seq.empty
        else {
          val corpusScans = scanRe.findAllMatchIn(plan)
            .map(_.group(1))
            .filter(_.contains("/testdata/"))
            .toSeq
            .groupBy(p => p.substring(p.lastIndexOf('/') + 1))
          corpusScans.collect {
            case (table, paths) if paths.size > 3 => (q.name, table, paths.size)
          }
        }
      }
    assert(offenders.isEmpty,
      s"ops re-scanning a corpus table >3 times (materialize the shared subtree):\n" +
        offenders.map { case (n, t, c) => s"  $n: $t ×$c" }.mkString("\n"))
  }
}
