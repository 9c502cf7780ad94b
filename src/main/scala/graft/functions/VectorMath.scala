package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Primitive-loop vector kernels for embedding math.
  *
  * Catalyst's higher-order array functions (`aggregate`/`zip_with`) evaluate
  * a lambda expression tree per element — ~40µs per 64-dim cosine pair,
  * which dominates all-pairs similarity ops. These JVM while-loops are the
  * same computation at ~0.1µs/pair. Summation is left-to-right in double
  * with per-element float→double casts (exact), so results are bit-identical
  * to both the higher-order-function form and the DuckDB oracle's
  * `list_sum(list_transform(...))` — the IEEE reduction order never changes.
  *
  * These are deliberate UDFs (SURVEY §4.2 prefers builtins): fixed-width
  * numeric kernels are the one case where a tight JVM loop beats the
  * codegen'd expression tree, the same trade MLlib's BLAS wrappers make.
  */
object VectorMath {

  def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def normD(a: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  /** cosine(a, b) — NaN-free for zero vectors is NOT guaranteed; corpus
    * vectors are non-zero by construction.
    */
  def cosineD(a: Array[Float], b: Array[Float]): Double =
    dotD(a, b) / (normD(a) * normD(b))

  val cosine: (Column, Column) => Column = {
    val u = udf(cosineD _)
    (a, b) => u(a, b)
  }
}
