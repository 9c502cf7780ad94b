package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

/** The native codegen'd cosine expression must equal the primitive kernel
  * bit-for-bit and must NOT appear as a ScalaUDF in the plan.
  */
class CosineSimilaritySpec extends SparkSpec {

  test("graft_cosine equals VectorMath.cosineD bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val a = Array(0.1f, -0.2f, 0.3f, 0.9f)
    val b = Array(0.4f, 0.5f, -0.6f, 0.1f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(expr("graft_cosine(a, b)")).head().getDouble(0)
    assert(got == VectorMath.cosineD(a, b))
  }

  test("expression is native (no ScalaUDF in the plan)") {
    GraftFunctions.register(spark)
    // literal inputs would be constant-folded away (also native behavior) —
    // scan a real table so the expression survives into the physical plan
    val df = graft.Tables.read(spark, sf, "embeddings")
      .selectExpr("graft_cosine(embedding, embedding) AS c")
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("ScalaUDF"), p)
    assert(p.toLowerCase.contains("graft_cosine"), p)
    assert(df.head().getDouble(0) > 0.999) // self-cosine ≈ 1
  }

  test("null inputs yield null") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Option.empty[Array[Float]], Some(Array(1f))))
      .toDF("a", "b").selectExpr("graft_cosine(a, b)")
    assert(df.head().isNullAt(0))
  }

  test("GraftExtensions wires the function injection without error") {
    new graft.GraftExtensions().apply(new SparkSessionExtensions())
  }

  test("splitmix64/fnv1a64 are stable (pinned values)") {
    assert(VectorMath.splitmix64(0L) == -2152535657050944081L)
    assert(VectorMath.fnv1a64("spark") == 4844180546837584714L)
  }
}
