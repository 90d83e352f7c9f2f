package graft.expr

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for crawl dedup — the normalization that
  * collapses the dozen spellings of one page BEFORE exact/near-dup
  * machinery runs (a web corpus holds the same document under
  * `HTTP://Host/x?b=2&a=1#top`, `http://host/x?a=1&b=2`, and tracking
  * -parameter variants; URL-level dedup is the cheapest dedup there
  * is):
  *  - scheme and authority lowercase (RFC 3986 §6.2.2.1 case rule)
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - the fragment dropped (never sent to the server)
  *  - query parameters: `utm_*` tracking keys removed
  *    (case-insensitive prefix), the rest SORTED bytewise and
  *    rejoined — parameter order is not page identity; an emptied
  *    query drops its `?`
  *  - the path kept byte-exact (path case IS identity on most
  *    servers — no over-normalization)
  *
  * Non-URL strings (no `://`) pass through unchanged — the expression
  * never throws, so a dirty crawl column maps totally. Row-local,
  * codegen'd; NULL propagates. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(v: Any): Any =
    UrlCanonicalize.canonicalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.UrlCanonicalize.canonicalize($s);")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {

  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd < 0) return u // not a hierarchical URL: unchanged
    val scheme = s.substring(0, schemeEnd).toLowerCase(Locale.ROOT)
    var rest = s.substring(schemeEnd + 3)
    val frag = rest.indexOf('#')
    if (frag >= 0) rest = rest.substring(0, frag)
    val qIdx = rest.indexOf('?')
    val base = if (qIdx >= 0) rest.substring(0, qIdx) else rest
    val rawQuery = if (qIdx >= 0) rest.substring(qIdx + 1) else null
    val slash = base.indexOf('/')
    var auth = (if (slash >= 0) base.substring(0, slash) else base)
      .toLowerCase(Locale.ROOT)
    val path = if (slash >= 0) base.substring(slash) else ""
    if (scheme == "http" && auth.endsWith(":80"))
      auth = auth.substring(0, auth.length - 3)
    else if (scheme == "https" && auth.endsWith(":443"))
      auth = auth.substring(0, auth.length - 4)
    val query =
      if (rawQuery == null) null
      else {
        val kept = rawQuery.split("&", -1).filter { p =>
          p.nonEmpty && !p.toLowerCase(Locale.ROOT).startsWith("utm_")
        }.sorted
        if (kept.isEmpty) null else kept.mkString("&")
      }
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(auth).append(path)
    if (query != null) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }
}
