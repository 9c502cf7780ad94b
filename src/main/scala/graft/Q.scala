package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark implementation plus, when the
  * semantics are deterministically SQL-expressible (SURVEY §2.0 rules), a
  * DuckDB oracle query over the same bare table names.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** A query whose single SQL text is valid in BOTH Spark SQL and DuckDB:
    * runs via spark.sql over temp views, and verbatim as the oracle.
    */
  def sql(name: String, text: String): Q =
    Q(name, (s, d) => { Tables.registerAll(s, d); s.sql(text) }, Some(text))
}
