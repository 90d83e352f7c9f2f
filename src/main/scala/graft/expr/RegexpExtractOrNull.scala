package graft.expr

import org.apache.spark.sql.catalyst.expressions.{
  EqualTo, Expression, If, Literal, RegExpExtract, RuntimeReplaceable,
  InheritAnalysisRules}
import org.apache.spark.sql.types.StringType

/** Pig-semantics `REGEX_EXTRACT`: returns NULL (not `''`) when the
  * pattern does not match.
  *
  * The reference's data-quality pipeline depends on this distinction:
  * `REGEX_EXTRACT(hcpcs_code, pattern, 1)` yields NULL on invalid codes
  * and the downstream `filter BY x is null` is what isolates them
  * (reference README.md:127-140). Spark's `regexp_extract` returns an
  * empty string on non-match, which would make that filter select
  * nothing — this expression closes the gap.
  *
  * Implemented as a [[RuntimeReplaceable]] rewrite to
  * `if (regexp_extract(s, p, i) = '') null else regexp_extract(...)`,
  * so Catalyst optimizes/codegens it exactly like the built-in — no
  * interpreted-eval penalty, pushdown-friendly.
  */
case class RegexpExtractOrNull(
    subject: Expression,
    regexp: Expression,
    idx: Expression,
    replacement: Expression)
  extends RuntimeReplaceable with InheritAnalysisRules {

  def this(subject: Expression, regexp: Expression, idx: Expression) =
    this(subject, regexp, idx, {
      val extract = RegExpExtract(subject, regexp, idx)
      If(EqualTo(extract, Literal.create("", StringType)),
        Literal.create(null, StringType), extract)
    })

  def this(subject: Expression, regexp: Expression) =
    this(subject, regexp, Literal(1))

  override def prettyName: String = "regexp_extract_or_null"
  override def parameters: Seq[Expression] = Seq(subject, regexp, idx)
  override protected def withNewChildInternal(newChild: Expression): RegexpExtractOrNull =
    copy(replacement = newChild)
}

object RegexpExtractOrNull {
  def apply(subject: Expression, regexp: Expression, idx: Expression): RegexpExtractOrNull =
    new RegexpExtractOrNull(subject, regexp, idx)
}
