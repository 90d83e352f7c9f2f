package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark plugin surface: setting
  * `spark.sql.extensions=graft.GraftExtensions` registers the engine's
  * codegen'd expressions in ANY SparkSession at session build time —
  * the public `SparkSessionExtensions` extension point, so a cluster
  * that only ships the graft jar (no code changes) gets the SQL
  * functions everywhere, including pure-SQL clients over
  * Thrift/Connect.
  *
  * Registrations come from [[graft.functions.sqlBuilders]] — the same
  * list `graft.functions.registerAll` uses, so the plugin and the
  * programmatic path expose an identical surface by construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.sqlBuilders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    // brute-force Hamming joins → pigeonhole-banded equi-joins
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
  }
}
