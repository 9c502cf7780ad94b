package graft

/** Contract-level checks of the driver registration surface. */
class SparkEntrySpec extends SparkSpec {

  test("no duplicate query names in the registry") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a query implementation") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("t1 smoke: flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry matches the SURVEY §2 inventory size (146 keys, 121 oracles)") {
    assert(SparkEntry.queries.size == 146,
      s"got ${SparkEntry.queries.size} — update SURVEY §2 and this pin together")
    assert(SparkEntry.oracleSql.size == 121,
      s"got ${SparkEntry.oracleSql.size} oracle-registered keys")
  }
}
