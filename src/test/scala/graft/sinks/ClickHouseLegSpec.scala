package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Upsert

/** The live-ClickHouse leg of the sink seam (reference `setup.sh:63,
  * 128-137`: INSERT-only sink into `ENGINE = ReplacingMergeTree()
  * ORDER BY <pk>`, background merges keep the latest row per key).
  *
  * Mirrors `KafkaLegSpec`'s gating: the integration test runs only
  * where `SPARK_GRAFT_CLICKHOUSE_URL` names a reachable ClickHouse JDBC
  * endpoint (an environment that also ships the ClickHouse JDBC driver
  * jar); offline it is skipped (assume → canceled, not passed). The
  * ungated tests prove everything provable without the server: the
  * dialect's INSERT-only statement set executes through the REAL
  * `JdbcUpsertSink` executor path against Derby, replays duplicate
  * physically (no delete leg), and latest-per-key read-back — the exact
  * semantic ReplacingMergeTree applies at merge time — converges to the
  * reference's golden state.
  */
class ClickHouseLegSpec extends SparkSpec {

  private val chUrlEnv = "SPARK_GRAFT_CLICKHOUSE_URL"

  private val referenceCols = Seq(
    "user_id" -> "integer",
    "username" -> "character varying",
    "account_type" -> "character varying")

  test("dialect contract: INSERT-only — no delete leg exists to prepare") {
    assert(ClickHouseDialect.deleteByKeySql("app.users", Seq("user_id")).isEmpty)
    assert(ClickHouseDialect.insertSql("app.users",
      Seq("user_id", "username", "account_type")) ==
      "INSERT INTO app.users (user_id, username, account_type) VALUES (?, ?, ?)")
    // and the rendered DDL is the reference's golden shape (README.md:108)
    val ddl = ClickHouseDialect.createTableDdl("iman", "users", referenceCols)
    assert(ddl.contains("ENGINE = ReplacingMergeTree()") &&
      ddl.contains("ORDER BY user_id"), ddl)
  }

  test("INSERT-only replay + latest-per-key read-back converges to golden (offline rendering)") {
    import spark.implicits._
    // Derby stands in for the wire: JdbcUpsertSink's executor mechanics
    // are dialect-independent, and ClickHouseDialect's statement set is
    // INSERT-only — so a replayed batch must land TWICE physically
    // (at-least-once, no delete), and the merge-time dedup semantic
    // (latest per key, which ReplacingMergeTree applies in background
    // merges) must still converge to the reference's golden end state
    val url = "jdbc:derby:memory:graftchx;create=true"
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE users (user_id INT, username VARCHAR(255), " +
        "account_type VARCHAR(50), version BIGINT)")
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    finally conn.close()

    val apply = JdbcUpsertSink.upsertBatch(url, "users", Seq("user_id"),
      ClickHouseDialect)
    val b1 = Seq((1, "user1", "Bronze", 1L), (2, "user2", "Silver", 2L))
      .toDF("user_id", "username", "account_type", "version")
    val b2 = Seq((1, "user1", "Platinum", 3L)) // the setup.sh:199 update
      .toDF("user_id", "username", "account_type", "version")
    apply(b1, 0L); apply(b2, 1L)
    apply(b2, 2L) // at-least-once replay of the last batch

    val raw = graft.sources.JdbcSnapshot.read(spark, url, "users")
      .select(col("USER_ID").as("user_id"), col("USERNAME").as("username"),
        col("ACCOUNT_TYPE").as("account_type"), col("VERSION").as("version"))
    // INSERT-only: the replayed batch is physically duplicated ...
    assert(raw.count() == 4, s"expected 2+1+1 physical rows, got ${raw.count()}")
    // ... and merge-semantics read-back still lands on golden
    val merged = Upsert.latestByKey(raw, Seq(col("user_id")),
      Seq(col("version"))).select("user_id", "username", "account_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(merged == Set((1, "user1", "Platinum"), (2, "user2", "Silver")))
  }

  test("live ClickHouse: golden DDL + INSERT-only upsert + FINAL read-back (gated)") {
    assume(sys.env.get(chUrlEnv).exists(_.nonEmpty),
      "no ClickHouse endpoint in this environment — integration leg skipped")
    import spark.implicits._
    val url = sys.env(chUrlEnv)
    // 1. execute the reference's golden DDL shape (setup.sh:63)
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute("CREATE DATABASE IF NOT EXISTS graft_it")
      conn.createStatement().execute(
        ClickHouseDialect.createTableDdl("graft_it", "users", referenceCols))
    } finally conn.close()
    // 2. stream-shaped apply through the same foreachBatch fn the
    //    pipeline uses, including an at-least-once replay
    val apply = JdbcUpsertSink.upsertBatch(url, "graft_it.users",
      Seq("user_id"), ClickHouseDialect)
    val b1 = Seq((1, "user1", "Bronze"), (2, "user2", "Silver"))
      .toDF("user_id", "username", "account_type")
    val b2 = Seq((1, "user1", "Platinum"))
      .toDF("user_id", "username", "account_type")
    apply(b1, 0L); apply(b2, 1L); apply(b2, 2L)
    // 3. FINAL read-back = merge-complete view: latest row per key
    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement().executeQuery(
        "SELECT user_id, username, account_type FROM graft_it.users FINAL " +
          "ORDER BY user_id")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getInt(1), r.getString(2), r.getString(3))).toList
      assert(got == List((1, "user1", "Platinum"), (2, "user2", "Silver")),
        s"FINAL read-back drifted: $got")
      conn2.createStatement().execute("DROP TABLE graft_it.users")
    } finally conn2.close()
  }
}
