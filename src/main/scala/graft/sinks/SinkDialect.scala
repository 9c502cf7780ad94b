package graft.sinks

import org.apache.spark.sql.types.StructType

import graft.sources.TypeMap

/** Statement-rendering seam for the keyed sink — the dialect axis the
  * reference's topology implies but its offline re-expression had fused
  * into one ANSI path: the reference ships a ClickHouse HTTP sink whose
  * "upsert" is merge-time dedup (ReplacingMergeTree, reference
  * `setup.sh:63,128-137`), while the testable local sink here is an
  * embedded ANSI store (Derby) where the same idempotent contract needs
  * an explicit DELETE-by-key + INSERT transaction.
  *
  * The seam extracts exactly what varies: DDL type rendering (via
  * [[graft.sources.TypeMap]]) and the upsert statement strategy.
  * [[JdbcUpsertSink.upsertBatch]] executes whatever the dialect renders —
  * executor-side mechanics (one connection + prepared statements per
  * partition, JDBC batch API) are dialect-independent.
  */
sealed trait SinkDialect {
  def name: String

  /** Sink-table DDL from (column, postgres-type) pairs. */
  def createTableDdl(schema: String, table: String,
                     cols: Seq[(String, String)]): String

  /** Sink-table DDL from a live Spark schema. */
  def createTableDdlFromSpark(schema: String, table: String,
                              st: StructType): String

  /** Per-row keyed delete preceding the insert — `None` when the engine
    * dedups at merge time and the upsert is INSERT-only.
    */
  def deleteByKeySql(table: String, keyCols: Seq[String]): Option[String]

  /** Parameterized insert for one row of `cols`. */
  def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})"
}

/** Transactional ANSI stores (embedded Derby here; any RDBMS with keyed
  * deletes): idempotence via DELETE-by-key + INSERT inside one
  * transaction per partition, so at-least-once replays converge.
  */
case object AnsiDeleteInsertDialect extends SinkDialect {
  val name = "ansi"

  /** ANSI DDL with the Spark-side lattice inverted to portable SQL types
    * (the DDL the JdbcPipelineSpec tables are created with).
    */
  def createTableDdl(schema: String, table: String,
                     cols: Seq[(String, String)]): String = {
    val defs = cols.map { case (n, t) => s"$n ${pgToAnsi(t)}" }.mkString(", ")
    s"CREATE TABLE $table ($defs, PRIMARY KEY " +
      s"(${TypeMap.primaryKey(cols.map(_._1))}))"
  }

  def createTableDdlFromSpark(schema: String, table: String,
                              st: StructType): String =
    createTableDdl(schema, table,
      st.fields.toSeq.map(f => f.name -> sparkToPg(f.dataType)))

  def deleteByKeySql(table: String, keyCols: Seq[String]): Option[String] =
    Some(s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND "))

  private def pgToAnsi(t: String): String = t match {
    case "integer"                     => "INT"
    case "bigint"                      => "BIGINT"
    case "numeric"                     => "DECIMAL(18,2)"
    case "timestamp without time zone" => "TIMESTAMP"
    case _                             => "VARCHAR(255)"
  }

  private def sparkToPg(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType                     => "integer"
      case LongType                        => "bigint"
      case _: DecimalType                  => "numeric"
      case TimestampType | TimestampNTZType => "timestamp without time zone"
      case _                               => "text"
    }
  }
}

/** The reference's actual sink engine: ClickHouse ReplacingMergeTree
  * (`setup.sh:63` `ENGINE = ReplacingMergeTree() ORDER BY <pk>`; golden
  * DDL at reference `README.md:108`). Upsert strategy is INSERT-only —
  * the engine deduplicates rows sharing the ORDER BY key at background
  * merge time, so a keyed delete is neither needed nor (cheaply)
  * available; at-least-once replays converge to the same merged state,
  * which is exactly the idempotence the ANSI dialect buys with its
  * delete. DDL rendering delegates to the golden-tested
  * [[graft.sources.TypeMap]].
  */
case object ClickHouseDialect extends SinkDialect {
  val name = "clickhouse"

  def createTableDdl(schema: String, table: String,
                     cols: Seq[(String, String)]): String =
    TypeMap.renderDdl(schema, table, cols)

  def createTableDdlFromSpark(schema: String, table: String,
                              st: StructType): String =
    TypeMap.renderDdlFromSpark(schema, table, st)

  def deleteByKeySql(table: String, keyCols: Seq[String]): Option[String] =
    None
}
