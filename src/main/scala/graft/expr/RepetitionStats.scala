package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition statistics of a whitespace-tokenized
  * document (Rae et al. 2021 §A1.1) as ONE codegen'd pass:
  * `struct(dup_token_frac, top_bigram_frac, dup_trigram_frac)`.
  *
  * Exists because the same computation as column algebra
  * (`transform`/`filter`/`aggregate` over gram arrays) runs in Spark's
  * INTERPRETED higher-order-function path — hundreds of boxed
  * expression evals per row, measured 3-14 s for one sf0.1 partition
  * depending on shape. One JVM-loop eval per row is ~30× cheaper and
  * keeps exact string-gram identity (no hashing compromise).
  *
  * Token boundaries replicate Spark's `split(text, "\\s+")` (trailing
  * empties kept) so the DuckDB `string_split_regex` oracle matches
  * value-for-value; fractions are single IEEE divisions of exact ints.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.RepetitionStats.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))

  /** One pass: split like Spark's `split(s, "\\s+")`, then hash-map
    * counting of tokens/bigrams/trigrams. Grams join on a space —
    * unambiguous, since tokens cannot contain whitespace. */
  def compute(s: UTF8String): InternalRow = {
    val toks = s.toString.split("\\s+", -1)
    val n = toks.length
    val tokSet = new java.util.HashSet[String](Math.max(4, n * 2))
    var i = 0
    while (i < n) { tokSet.add(toks(i)); i += 1 }
    val dupTok = if (n > 0) (n - tokSet.size).toDouble / n.toDouble else 0.0

    var topBigram = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      var best = 0
      i = 0
      while (i < n - 1) {
        val c = counts.merge(toks(i) + " " + toks(i + 1), 1, _ + _)
        if (c > best) best = c
        i += 1
      }
      topBigram = best.toDouble / (n - 1).toDouble
    }

    var dupTri = 0.0
    if (n >= 3) {
      val g = n - 2
      val triSet = new java.util.HashSet[String](g * 2)
      i = 0
      while (i < g) {
        triSet.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      dupTri = (g - triSet.size).toDouble / g.toDouble
    }
    InternalRow(dupTok, topBigram, dupTri)
  }
}
