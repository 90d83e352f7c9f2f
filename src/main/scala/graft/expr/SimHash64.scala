package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized document (Charikar 2002,
  * the near-dup fingerprint popularized by Manku et al., WWW'07, for
  * web-scale dedup).
  *
  * Each token is hashed to 64 bits (FNV-1a over its UTF-8 bytes); each
  * bit position accumulates +1/-1 votes across tokens; the sign vector
  * is the fingerprint. Near-duplicate documents differ in few bits, so
  * a 100 TB corpus can be deduped by grouping on band rotations of the
  * fingerprint (see graft.llm.Dedup.simhashNearDup) — one codegen'd
  * pass per document, 8-byte shuffle key, no token explosion.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

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
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.SimHash64.compute($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Single pass over the UTF-8 bytes: token boundaries at ASCII
    * whitespace; per-token FNV-1a hash votes on all 64 bit positions. */
  def compute(bytes: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    var h = FnvOffset
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val isWs = i == bytes.length ||
        bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r'
      if (isWs) {
        if (inTok) { // token ended: vote
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          h = FnvOffset
          inTok = false
        }
      } else {
        h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
        inTok = true
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
