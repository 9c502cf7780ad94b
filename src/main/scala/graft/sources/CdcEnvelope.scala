package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style CDC envelope decode (SURVEY §1.2 / §2.1).
  *
  * The wire format (reference `README.md:127-129`, produced by the
  * JsonConverter with schemas enabled, `setup.sh:96-99`) is one JSON object
  * per row-change: `{"schema": {...struct descriptor...}, "payload": {col: val}}`
  * with timestamps as int64 microseconds (`io.debezium.time.MicroTimestamp`).
  *
  * Spark mapping: the envelope is a `StructType`; decode is `from_json` (a
  * codegen'd expression — stays inside WholeStageCodegen, no UDF), unwrap is
  * `select("payload.*")` (the `ExtractNewRecordState` SMT of reference
  * `setup.sh:105-107`), and MicroTimestamp columns become TIMESTAMP via
  * `timestamp_micros`.
  */
object CdcEnvelope {

  /** Descriptor of one field inside the envelope's `schema.fields` array. */
  val fieldDescriptor: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("optional", BooleanType),
    StructField("default", StringType),
    StructField("name", StringType),
    StructField("version", IntegerType),
    StructField("field", StringType)))

  /** Full envelope schema for a given payload row schema. */
  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("schema", StructType(Seq(
      StructField("type", StringType),
      StructField("fields", ArrayType(fieldDescriptor)),
      StructField("optional", BooleanType),
      StructField("name", StringType)))),
    StructField("payload", payload)))

  /** Payload schema of the reference's `iman.users` table
    * (`postgres-init/init.sql:5-11`); MicroTimestamp columns arrive as int64.
    */
  val usersPayload: StructType = StructType(Seq(
    StructField("user_id", IntegerType),
    StructField("username", StringType),
    StructField("account_type", StringType),
    StructField("updated_at", LongType),
    StructField("created_at", LongType)))

  /** Decode + flatten a column of envelope JSON strings: `payload.*` with the
    * named int64-µs columns converted to timestamps.
    */
  def unwrap(df: DataFrame, jsonCol: Column, payload: StructType,
             microTsCols: Seq[String] = Seq.empty): DataFrame = {
    val decoded = df.select(from_json(jsonCol, envelopeSchema(payload)).as("env"))
      .select(col("env.payload.*"))
    microTsCols.foldLeft(decoded)((d, c) =>
      d.withColumn(c, timestamp_micros(col(c))))
  }

  /** Convenience: decode reference `iman.users` envelopes. */
  def unwrapUsers(df: DataFrame, jsonCol: Column): DataFrame =
    unwrap(df, jsonCol, usersPayload, Seq("updated_at", "created_at"))
}
