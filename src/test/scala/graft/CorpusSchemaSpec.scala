package graft

import org.apache.spark.sql.types._

/** Sentinel for driver-side corpus regeneration. Round 16 lost 50 registry
  * queries to a SILENT physical-schema change (`events.ts` INT64 nanos →
  * TIMESTAMP(MICROS)); every cell failed individually with an opaque
  * DATATYPE_MISMATCH and nothing named the root cause. This spec pins the
  * LOGICAL schema of every corpus table as presented by `Tables.read` —
  * the contract the whole registry (SparkEntrySpec pins its size) is
  * written against — so the next regeneration fails ONE test with a
  * message that names the drifted column, old type, and new type.
  *
  * Pinned logical (post-canonicalization) types, not physical parquet
  * types: the physical layer is allowed to drift as long as Tables
  * adapts it (that is the round-17 fix); what must never drift silently
  * is what operators see.
  */
class CorpusSchemaSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Map("event_id" -> LongType,
      "ts" -> LongType, // CANONICAL epoch nanos — Tables.canonicalEventTime
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"driver corpus '$table' presents the pinned logical schema") {
      val got = Tables.read(spark, sf, table).schema
      val gotTypes = got.fields.map(f => f.name -> f.dataType).toMap
      val drift = cols.toSeq.sortBy(_._1).flatMap { case (name, want) =>
        gotTypes.get(name) match {
          case None =>
            Some(s"$table.$name: MISSING (driver corpus regenerated without it?)")
          case Some(t) if t != want =>
            Some(s"$table.$name: expected $want, corpus now presents $t — " +
              "driver testdata regenerated with a new layout; adapt in " +
              "Tables (like canonicalEventTime) rather than per-operator")
          case _ => None
        }
      }
      assert(drift.isEmpty, drift.mkString("\n"))
    }
  }
}
