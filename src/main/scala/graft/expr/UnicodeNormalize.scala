package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization to a canonical form (NFC default; NFD, NFKC,
  * NFKD selectable) — the corpus-hygiene step ahead of dedup
  * fingerprints: without it, visually-identical strings with different
  * codepoint sequences (composed `é` vs `e`+U+0301) survive exact
  * dedup as distinct documents.
  *
  * Scale shape: row-local, single pass, codegen'd — with an
  * `isNormalized` fast path so the dominant case of a real corpus
  * (ASCII / already-NFC text) costs one scan and returns the input
  * buffer as-is; only genuinely denormalized rows pay the JDK
  * normalizer's rebuild.
  * Oracle twin: DuckDB's `nfc_normalize` (hash-matched in
  * `text_normalize`).
  */
case class UnicodeNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  private lazy val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType
          if scala.util.Try(Normalizer.Form.valueOf(form)).isSuccess =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of NFC|NFD|NFKC|NFKD, got $form")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) v
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.${normForm.name()}"
      s"""
         |final String $s = $in.toString();
         |if (java.text.Normalizer.isNormalized($s, $f)) {
         |  ${ev.value} = $in;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, $f));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
