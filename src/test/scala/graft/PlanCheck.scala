package graft

import org.apache.spark.sql.execution.FormattedMode

/** Scratch main for plan inspection (not a test). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.explainString(FormattedMode)
      println(s"=== $q EXCHANGES=" + "Exchange".r.findAllIn(p).length)
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Scan parquet") || l.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
