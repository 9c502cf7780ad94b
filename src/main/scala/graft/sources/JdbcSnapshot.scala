package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC snapshot source — the production path of the reference's initial
  * snapshot (`snapshot.mode=initial`, reference `setup.sh:92` reads the
  * whole Postgres table before streaming).
  *
  * Scale: a single-connection JDBC read is one task; `partitioned` splits
  * the table into `numPartitions` range predicates on a numeric key so the
  * snapshot parallelizes across executors — the knob that matters when the
  * snapshot is TBs. Predicate/column pruning still push into the remote
  * database through the JDBC source.
  */
object JdbcSnapshot {

  /** Catalog walk over the live connection — the reference's control path
    * literally (`setup.sh:29-34`: `psql -Atc` over
    * `information_schema.tables` discovers the table list the DDL
    * generator then loops over). Rendered through the JDBC-standard
    * `DatabaseMetaData.getTables` so the same call walks Postgres'
    * information_schema, Derby's SYS.SYSTABLES, or any other catalog —
    * one driver-side metadata round-trip, O(#tables), free at any data
    * scale. Returns user TABLE names under `schemaPattern`, sorted for
    * deterministic fan-out order (the reference's `ORDER BY` is implied
    * by psql's default but the fan-out must not depend on catalog
    * iteration order).
    *
    * `schemaPattern` defaults to the connection's CURRENT schema (not
    * `"%"`): on a shared catalog a wildcard would fan out every schema's
    * tables and two same-named tables in different schemas would collide
    * in the unqualified name list. Cross-schema callers use
    * [[discoverSchemaTables]], which keeps the qualifier.
    */
  def discoverTables(url: String, schemaPattern: String = null): Seq[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      // Connection.getSchema is JDBC 4.1 and several real drivers throw
      // SQLFeatureNotSupportedException (or AbstractMethodError from
      // pre-4.1 compilations) instead of returning null — degrade to the
      // wildcard walk rather than failing discovery outright
      val pattern = Option(schemaPattern)
        .orElse(scala.util.Try(Option(conn.getSchema)).toOption.flatten)
        .getOrElse("%")
      val rs = conn.getMetaData.getTables(null, pattern, "%",
        Array("TABLE"))
      val names = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(_.getString("TABLE_NAME"))
        .toVector
      names.sorted
    } finally conn.close()
  }

  /** Catalog walk across ALL schemas matching `schemaPattern`, returning
    * (schema, table) pairs so same-named tables in different schemas
    * stay distinct through the fan-out. Sorted for deterministic order.
    */
  def discoverSchemaTables(url: String,
      schemaPattern: String = "%"): Seq[(String, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, schemaPattern, "%",
        Array("TABLE"))
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString("TABLE_SCHEM"), r.getString("TABLE_NAME")))
        .toVector
        .sorted
    } finally conn.close()
  }

  /** Whole-table snapshot over one connection (small tables / dims). */
  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  /** Range-partitioned snapshot: `numPartitions` parallel readers over
    * `[lower, upper]` of `partitionColumn`.
    */
  def partitioned(spark: SparkSession, url: String, table: String,
                  partitionColumn: String, lower: Long, upper: Long,
                  numPartitions: Int,
                  props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
    props.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }
}
