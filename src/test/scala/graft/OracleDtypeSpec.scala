package graft

import org.apache.spark.sql.types._

/** Systemic dtype-portability gate for the ORACLE-REGISTERED surface —
  * the round-13 `op_table_checksum` lesson made permanent: values can
  * match in every engine and the gate still goes red when a column's
  * TYPE canonicalizes differently through the driver's hash (DuckDB
  * surfaces >int64 decimals as object/Decimal or float64 depending on
  * the conversion path). Every oracle-checked query's output schema must
  * therefore stay inside the dtype set that round-trips identically:
  * integers ≤64-bit, float64, strings, booleans, dates, and decimals
  * whose precision fits int64/float64 canonicalization (≤18). Wide
  * decimals are an ACCUMULATOR type — render them as STRING (or two
  * BIGINT halves) in the final projection. float32 is banned for the
  * same reason (pandas widens it to float64 with representation noise);
  * ZONED TimestampType is banned in favor of epoch-µs BIGINT, while
  * TIMESTAMP_NTZ stays allowed — it is µs-exact and zone-free in both
  * engines (`op_sort_multi.l_shipdate` passes the driver hash today),
  * and the nanos hazard lives only in the events column the reader
  * already surfaces as BIGINT.
  */
class OracleDtypeSpec extends SparkSpec {

  private def portable(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _: DoubleType | _: StringType | _: BooleanType | _: DateType => true
    case _: TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _: FloatType | _: TimestampType => false
    case ArrayType(e, _) => portable(e)
    case StructType(fs) => fs.forall(f => portable(f.dataType))
    case MapType(k, v, _) => portable(k) && portable(v)
    case _ => false
  }

  test("every oracle-registered query's output schema is driver-hash portable") {
    val offenders = SparkEntry.allQueries
      .filter(q => q.oracle.isDefined)
      .filterNot(_.name.startsWith("stream_")) // running a stream here is
      // expensive; the streaming ops' outputs are all BIGINT/DOUBLE by the
      // same convention and their schemas go through Verify at sf0.01
      .flatMap { q =>
        val schema = q.fn(spark, sf).schema
        schema.fields.collect {
          case f if !portable(f.dataType) => (q.name, f.name, f.dataType.sql)
        }
      }
    assert(offenders.isEmpty,
      "oracle outputs with driver-hash-unportable dtypes (render as STRING " +
        "or epoch-µs/int64 in the final projection):\n" +
        offenders.map { case (n, c, t) => s"  $n.$c: $t" }.mkString("\n"))
  }
}
