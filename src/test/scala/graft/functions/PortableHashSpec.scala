package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the cross-engine hash contract directly (the oracle gates prove
  * it end-to-end; this spec localizes a drift to the hash itself):
  * hash60 must equal the integer value of the first 15 md5 hex digits —
  * the exact quantity DuckDB computes as
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)` — and stay inside
  * [0, 2⁶⁰) so the BIGINT parse can never overflow on either engine.
  */
class PortableHashSpec extends SparkSpec {

  test("hash60 equals the md5-prefix reference values") {
    import spark.implicits._
    // reference values computed independently (md5 hex → int base 16)
    val want = Map(
      "hello" -> 419982666956583591L,
      "a#0" -> 973808965948496268L,
      "x" -> 710810379057940483L)
    val got = want.keys.toSeq.toDF("s")
      .select(col("s"), PortableHash.hash60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("hash60 range, determinism, null passthrough, numeric rendering") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("v")
      .select(PortableHash.hash60(col("v")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < (1L << 60)), "outside [0, 2^60)")
    assert(hs.distinct.length == 1000, "collision in 1000 values")
    // numeric input hashes via its string rendering — the same rendering
    // DuckDB's CAST(v AS VARCHAR) produces, so '42' and 42 must agree
    val lit42 = Seq(("42", 42L)).toDF("s", "n")
      .select(PortableHash.hash60(col("s")).as("hs"),
        PortableHash.hash60(col("n")).as("hn")).head()
    assert(lit42.getLong(0) == lit42.getLong(1))
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(PortableHash.hash60(col("s"))).head()
    assert(nul.isNullAt(0), "NULL in must be NULL out")
  }
}
