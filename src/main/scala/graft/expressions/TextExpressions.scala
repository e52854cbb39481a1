package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string, as one compiled call per
  * row. The built-in formulation (`transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i, n)))`) dispatches an interpreted lambda
  * per shingle — measured as the dominant cost of the MinHash pipeline.
  * Here the whole tokenize/slice/join/dedup happens inside one eval call
  * (CodegenFallback is fine: the per-ROW overhead is negligible, it was
  * the per-ELEMENT lambda overhead that hurt).
  *
  * Semantics (must stay aligned with the DuckDB oracle CTEs in
  * graft.queries.DataQueries):
  *   tokens  = regex-split on \s+, empty strings dropped
  *   shingle = n consecutive tokens joined with a single space
  *   result  = distinct shingles; fewer than n tokens -> empty array
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val raw = ws.split(s, -1)
    // drop empties (leading separator yields one)
    var m = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(m) = raw(i); m += 1 }
      i += 1
    }
    val count = m - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < count) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        seen.add(sb.toString)
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var p = 0
      while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))
}
