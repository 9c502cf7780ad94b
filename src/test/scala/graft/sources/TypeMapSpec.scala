package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden test of the schema-sync path: the rendered DDL for the
  * reference's `iman.users` table must equal the DDL the reference
  * generates (captured at reference `README.md:108`).
  */
class TypeMapSpec extends AnyFunSuite {

  test("users DDL matches the reference's generated DDL (README.md:108)") {
    val ddl = TypeMap.renderDdl("iman", "users", Seq(
      "user_id" -> "integer",
      "username" -> "character varying",
      "account_type" -> "character varying",
      "updated_at" -> "timestamp without time zone",
      "created_at" -> "timestamp without time zone"))
    assert(ddl ==
      "CREATE TABLE IF NOT EXISTS iman.users (user_id UInt32, username String, " +
        "account_type String, updated_at DateTime64(6), created_at DateTime64(6)) " +
        "ENGINE = ReplacingMergeTree() ORDER BY user_id;")
  }

  test("type lattice (setup.sh:40-49) incl. the String fallback") {
    assert(TypeMap.pgToClickHouse("integer") == "UInt32")
    assert(TypeMap.pgToClickHouse("bigint") == "UInt64")
    assert(TypeMap.pgToClickHouse("numeric") == "Decimal(18,2)")
    assert(TypeMap.pgToClickHouse("text") == "String")
    assert(TypeMap.pgToClickHouse("character varying") == "String")
    assert(TypeMap.pgToClickHouse("timestamp without time zone") == "DateTime64(6)")
    assert(TypeMap.pgToClickHouse("uuid") == "UUID")
    assert(TypeMap.pgToClickHouse("money") == "String") // lossy fallback
  }

  test("primary key: user_id when present, else first column (setup.sh:54-59)") {
    assert(TypeMap.primaryKey(Seq("a", "user_id", "b")) == "user_id")
    assert(TypeMap.primaryKey(Seq("a", "b")) == "a")
  }

  test("DDL from a live Spark schema") {
    val st = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("e", ArrayType(FloatType))))
    assert(TypeMap.renderDdlFromSpark("g", "t", st) ==
      "CREATE TABLE IF NOT EXISTS g.t (k Int64, v Float64, e Array(Float32)) " +
        "ENGINE = ReplacingMergeTree() ORDER BY k;")
  }
}
