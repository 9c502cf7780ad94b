package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden CDC replay of the reference's e2e scenario (reference
  * `setup.sh:155-207`): insert users 1,2,3 → delete 1 → insert 999 →
  * update 999. Reference semantics: deletes never reach the sink
  * (`tombstones.on.delete=false` + `drop.tombstones`, `setup.sh:94,107`),
  * upserts keep the latest version per key (ReplacingMergeTree,
  * `setup.sh:63`). Expected final state: 1,2,3 unchanged + 999 updated.
  */
class UpsertSpec extends SparkSpec {

  private def opLog = {
    import spark.implicits._
    Seq(
      ("u", 1, "user1", "Bronze", 1L),
      ("u", 2, "user2", "Silver", 2L),
      ("u", 3, "user3", "Gold", 3L),
      ("d", 1, null, null, 4L),
      ("u", 999, "test_user", "Test", 5L),
      ("u", 999, "updated_user", "Test", 6L)
    ).toDF("op", "user_id", "username", "account_type", "version")
  }

  private def finalState(df: org.apache.spark.sql.DataFrame) =
    Upsert.applyCdc(df, col("op"), Seq(col("user_id")), Seq(col("version")))
      .select("user_id", "username", "account_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private val expected = Set(
    (1, "user1", "Bronze"), (2, "user2", "Silver"), (3, "user3", "Gold"),
    (999, "updated_user", "Test"))

  test("golden replay: update applied, delete dropped (setup.sh:180-189 + 191-207)") {
    assert(finalState(opLog) == expected)
  }

  test("idempotence: replaying the whole log twice yields the same state") {
    assert(finalState(opLog.unionAll(opLog)) == expected)
  }

  private def finalStateWithDeletes(df: org.apache.spark.sql.DataFrame) =
    Upsert.applyCdcWithDeletes(df, col("op"), Seq(col("user_id")), Seq(col("version")))
      .select("user_id", "username", "account_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  test("golden replay with deletes: deleted key absent, later upserts survive") {
    // same setup.sh:155-207 scenario, delete-propagating semantics: user 1's
    // latest op is the delete, so the key vanishes from the sink
    assert(finalStateWithDeletes(opLog) == expected - ((1, "user1", "Bronze")))
  }

  test("delete-then-reinsert resurrects the key (latest version wins)") {
    import spark.implicits._
    val log = Seq(
      ("u", 7, "first", "A", 1L),
      ("d", 7, null, null, 2L),
      ("u", 7, "reborn", "B", 3L)
    ).toDF("op", "user_id", "username", "account_type", "version")
    assert(finalStateWithDeletes(log) == Set((7, "reborn", "B")))
    assert(finalStateWithDeletes(log.unionAll(log)) == Set((7, "reborn", "B")),
      "idempotent under full-log replay")
  }

  test("latestByKey keeps exactly one row per key with deterministic tiebreak") {
    import spark.implicits._
    val df = Seq((1, "a", 1L, 10L), (1, "b", 2L, 20L), (1, "c", 2L, 15L))
      .toDF("k", "v", "ver", "tiebreak")
    val kept = Upsert.latestByKey(df, Seq(col("k")), Seq(col("ver"), col("tiebreak")))
      .collect()
    assert(kept.length == 1)
    assert(kept.head.getAs[String]("v") == "b") // ver 2, tiebreak 20 wins
  }
}
