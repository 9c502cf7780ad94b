package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.sources.SchemaEvolution

class SkewAndEvolutionSpec extends SparkSpec {

  test("DDL sweep emits one row per corpus table plus the golden users DDL") {
    val rows = SourceOps.opSchemaDdlTypemap.fn(spark, sf).collect()
    assert(rows.length == Tables.all.length + 1)
    val byTable = rows.map(r => r.getString(1) -> r.getString(2)).toMap
    assert(Tables.all.forall(t => byTable(t).startsWith(s"CREATE TABLE IF NOT EXISTS graft.$t (")))
    assert(byTable("users") ==
      "CREATE TABLE IF NOT EXISTS iman.users (user_id UInt32, username String, " +
        "account_type String, updated_at DateTime64(6), created_at DateTime64(6)) " +
        "ENGINE = ReplacingMergeTree() ORDER BY user_id;")
  }

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.read(spark, sf, "orders")
    val c = Tables.read(spark, sf, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey",
        col("o_orderkey"), buckets = 8)
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(salted.sameElements(plain))
  }

  test("salted join shuffles on (key, salt)") {
    val o = Tables.read(spark, sf, "orders")
    val c = Tables.read(spark, sf, "customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Skew.saltedJoin(o, c, "o_custkey", "c_custkey",
        col("o_orderkey"), buckets = 8).queryExecution.executedPlan.toString()
      assert(p.contains("__graft_salt"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("schema evolution: DDL + conform reproduce auto.evolve semantics") {
    import spark.implicits._
    val v1 = StructType(Seq(
      StructField("user_id", LongType), StructField("username", StringType)))
    val v2 = StructType(Seq(
      StructField("user_id", LongType), StructField("username", StringType),
      StructField("email", StringType), StructField("score", DoubleType)))

    assert(SchemaEvolution.missingColumns(v1, v2).map(_.name) == Seq("email", "score"))
    assert(SchemaEvolution.alterDdl("iman", "users", v1, v2) == Seq(
      "ALTER TABLE iman.users ADD COLUMN IF NOT EXISTS email String;",
      "ALTER TABLE iman.users ADD COLUMN IF NOT EXISTS score Float64;"))
    assert(SchemaEvolution.missingColumns(v2, v1).isEmpty) // additive only

    val evolved = SchemaEvolution.evolve(v1, v2)
    val oldBatch = Seq((1L, "a")).toDF("user_id", "username")
    val newBatch = Seq((2L, "b", "b@x", 0.5)).toDF("user_id", "username", "email", "score")
    val unioned = SchemaEvolution.conform(oldBatch, evolved)
      .unionByName(SchemaEvolution.conform(newBatch, evolved))
      .orderBy("user_id").collect()
    assert(unioned.length == 2)
    assert(unioned.head.isNullAt(2) && unioned.head.isNullAt(3)) // back-filled
    assert(unioned(1).getString(2) == "b@x" && unioned(1).getDouble(3) == 0.5)
  }
}
