package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Envelope decode against the literal captured wire message from the
  * reference run log (reference `README.md:127-129`): JsonConverter
  * envelope with embedded schema, int64-µs MicroTimestamp fields.
  */
class CdcEnvelopeSpec extends SparkSpec {

  private val captured =
    """{"schema":{"type":"struct","fields":[
      |{"type":"int32","optional":false,"default":0,"field":"user_id"},
      |{"type":"string","optional":true,"field":"username"},
      |{"type":"string","optional":true,"field":"account_type"},
      |{"type":"int64","optional":true,"name":"io.debezium.time.MicroTimestamp","version":1,"field":"updated_at"},
      |{"type":"int64","optional":true,"name":"io.debezium.time.MicroTimestamp","version":1,"field":"created_at"}],
      |"optional":false,"name":"postgres_cdc.iman.users.Value"},
      |"payload":{"user_id":1,"username":"user1","account_type":"Bronze",
      |"updated_at":1754155842030174,"created_at":1754155842030174}}""".stripMargin
      .replaceAll("\n", "")

  test("unwrapUsers decodes the captured README.md:127 message") {
    import spark.implicits._
    val row = CdcEnvelope.unwrapUsers(Seq(captured).toDF("value"), col("value"))
      .head()
    assert(row.getAs[Int]("user_id") == 1)
    assert(row.getAs[String]("username") == "user1")
    assert(row.getAs[String]("account_type") == "Bronze")
    // 1754155842030174 µs = 2025-08-02T17:30:42.030174 UTC
    val ts = row.getAs[java.sql.Timestamp]("updated_at").toInstant
    assert(ts.toEpochMilli == 1754155842030L)
  }

  test("unwrapTolerant: good decoded, malformed quarantined, tombstones dropped") {
    import spark.implicits._
    val (good, bad) = CdcEnvelope.unwrapTolerant(
      Seq(Some(captured), Some("not json"), None).toDF("value"), col("value"),
      CdcEnvelope.usersPayload, Seq("updated_at", "created_at"))
    assert(good.collect().map(_.getAs[Int]("user_id")).toSeq == Seq(1))
    val q = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.length == 1 && q.head._1 == "not json")
  }

  test("tombstone-shaped / malformed JSON decodes to null payload, not error") {
    import spark.implicits._
    val rows = CdcEnvelope.unwrapUsers(Seq("", "not json").toDF("value"), col("value"))
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("user_id"))))
  }
}
