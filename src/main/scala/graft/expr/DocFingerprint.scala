package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic document fingerprint: a polynomial rolling hash
  * (Rabin–Karp family, base 31, wrapping 64-bit arithmetic) over the
  * document's UTF-8 bytes.
  *
  * Used by the text-analysis module for cheap exact-duplicate keys and
  * content-addressed partitioning of a 100 TB corpus: a single codegen'd
  * pass per document, no allocation, shuffle key is 8 bytes instead of
  * the document text. (The dedup pipeline hashes the *fingerprint*, not
  * the text, so the exact-dedup shuffle moves ~16 bytes/row.)
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {

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
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = 31L * $h + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}
