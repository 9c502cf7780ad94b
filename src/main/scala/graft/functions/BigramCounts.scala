package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, IntegerType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native map-returning expression: character-bigram → occurrence-count of
  * a string, in one tight JVM pass. Feeding `explode` with this map
  * instead of the positional `transform(sequence(...), i -> substr(...))`
  * array shrinks the language-ID profile build's generator output from
  * one row per CHARACTER POSITION to one row per DISTINCT bigram per
  * document (the per-doc counts then sum per (lang, bigram) exactly as
  * the positional rows would), and replaces a per-position substring
  * allocation with a single counting loop.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "graft_bigram_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    BigramCounts.count(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramCounts.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {

  /** Bigram-count kernel shared by interpreted and generated code. Bigrams
    * are consecutive CODE-POINT pairs — matching `substr(text, i, 2)`
    * positions for ALL inputs (Spark's `substr` counts code points, so a
    * non-BMP character is one position, never a surrogate-pair half).
    * Texts of fewer than two code points emit an empty map (no bigrams
    * exist). Insertion order is first occurrence, though map order is
    * irrelevant to the downstream aggregate.
    */
  def count(text: UTF8String): MapData = {
    val s = text.toString
    val m = new java.util.LinkedHashMap[String, Integer]()
    if (s.length > 0) {
      var prev = 0                              // start index of previous code point
      var cur = s.offsetByCodePoints(0, 1)      // start index of current code point
      while (cur < s.length) {
        val next = cur + Character.charCount(s.codePointAt(cur))
        val bg = s.substring(prev, next)
        val c = m.get(bg)
        m.put(bg, if (c == null) 1 else Integer.valueOf(c.intValue() + 1))
        prev = cur
        cur = next
      }
    }
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue.intValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
