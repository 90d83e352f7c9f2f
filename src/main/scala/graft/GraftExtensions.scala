package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{CosineSimilarity, DocFingerprint, RegexpExtractOrNull, SimHash64}

/** Spark plugin surface: setting
  * `spark.sql.extensions=graft.GraftExtensions` registers the engine's
  * codegen'd expressions in ANY SparkSession at session build time —
  * the public `SparkSessionExtensions` extension point, so a cluster
  * that only ships the graft jar (no code changes) gets the SQL
  * functions everywhere, including pure-SQL clients over
  * Thrift/Connect.
  *
  * The same builders are also exposed per-session via
  * [[graft.functions.registerAll]] for programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("regexp_extract_or_null"),
      info(classOf[RegexpExtractOrNull], "regexp_extract_or_null"),
      (es: Seq[Expression]) => es match {
        case Seq(s, p)    => new RegexpExtractOrNull(s, p)
        case Seq(s, p, i) => RegexpExtractOrNull(s, p, i)
        case _ => throw new IllegalArgumentException(
          "regexp_extract_or_null(subject, pattern[, idx])")
      }))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity], "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("doc_fingerprint"),
      info(classOf[DocFingerprint], "doc_fingerprint"),
      (es: Seq[Expression]) => DocFingerprint(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    // brute-force Hamming joins → pigeonhole-banded equi-joins
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
  }
}
