package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-class Shannon entropy of a document, quantized so it
  * replays engine-for-engine: returns `Σ_c round(n_c · ln(N/n_c) ·
  * 10⁶)` over the distinct characters (integer micro-nats × count;
  * divide by `length(text)` for per-char entropy). Low entropy flags
  * the gibberish [[RepetitionStats]] misses — single-char floods,
  * base64 blobs score HIGH (≈ ln 64 ≈ 4.16 nats/char vs ≈ 2.9 for
  * English), so the two ends of the scale both carry signal for a
  * quality filter.
  *
  * PORTABILITY: each class term is independently rounded to integer
  * micro-nats, then summed as integers — the sum is order-free, so
  * iteration order (here: hash-map order) can never move a bit; the
  * term itself is the IEEE tree `double(n_c) · ln(double(N)/double(
  * n_c)) · 10⁶`, mirrored token-for-token by the `text_entropy`
  * oracle. Characters are Unicode CODE POINTS (a surrogate pair is
  * one symbol), matching DuckDB's per-character split. All terms are
  * ≥ 0, so half-up and half-away-from-zero rounding agree.
  *
  * Row-local, one JVM pass per row, codegen'd — the same reasoning as
  * [[RepetitionStats]]: exploding chars to rows would multiply the
  * row count by the text length before a shuffle. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(v: Any): Any =
    CharEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.CharEntropy.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** One pass: code-point counts, then the per-class quantized terms
    * summed as integers (order-free by construction). Empty string
    * (and single-class strings) score 0. */
  def compute(s: UTF8String): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val counts = new java.util.HashMap[Integer, Integer](Math.max(8, n))
    var i = 0
    while (i < n) { counts.merge(cps(i), 1, _ + _); i += 1 }
    var sum = 0L
    val it = counts.values().iterator()
    val nd = n.toDouble
    while (it.hasNext) {
      val c = it.next().intValue()
      sum += Math.round(c.toDouble * Math.log(nd / c.toDouble) * 1e6)
    }
    sum
  }
}
