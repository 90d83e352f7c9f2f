package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token n-grams of a document as `array<string>` in one
  * codegen'd pass — documents shorter than `n` tokens yield an empty
  * array.
  *
  * Value-identical to the column-algebra form
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i+1, n)))`
  * (tokens split like Spark's `split(text, "\\s+")`, grams joined with
  * a single space — unambiguous since tokens cannot contain
  * whitespace), but ~an order of magnitude cheaper: higher-order
  * functions evaluate interpreted with per-gram slice + ConcatWs
  * allocations, which dominated the decontamination scan at sf0.1.
  */
case class TokenNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1 (got $n)")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(v: Any): Any =
    TokenNGrams.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.TokenNGrams.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNGrams =
    copy(child = newChild)
}

object TokenNGrams {

  /** Split like Spark's `split(s, "\\s+")` (trailing empties kept),
    * then join each n-token window with one space. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val toks = s.toString.split("\\s+", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
