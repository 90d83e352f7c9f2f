package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times SparkEntry.benchQueries on
  * $SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Timing forces full materialization through the `noop` sink — a
  * bare `count()` would let Catalyst prune the projections a real
  * consumer pays for. One warm-up query absorbs JVM/codegen/parquet
  * footer warm-up so per-query numbers measure the plan, not the
  * first-call tax.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_agg") // warm-up, untimed

    // steady-state timing: three runs per query, report the MEDIAN.
    // min-of-2 produced a phantom 31% regression in round 4 — under
    // uncontrolled machine load both samples can land high, and a min
    // over two high samples records noise as signal. The median of
    // three is robust to one bad sample in either direction, so
    // back-to-back totals agree within ~10% per query on a loaded box.
    // (The first run still pays codegen + broadcast build; the median
    // discards it whenever the other two agree.)
    def median3(a: Double, b: Double, c: Double): Double =
      math.max(math.min(a, b), math.min(math.max(a, b), c))
    // optional arg: comma-separated name filter (local iteration only;
    // the driver always runs the full list)
    val names = if (args.nonEmpty) {
      val only = args(0).split(",").toSet
      SparkEntry.benchQueries.filter(only.contains)
    } else SparkEntry.benchQueries
    val results = names.map { n =>
      val (a, b, c) = (runOnce(n), runOnce(n), runOnce(n))
      // all three samples to stderr so dispersion is auditable from
      // the log without re-running (the JSON line carries the median)
      System.err.println(
        f"[bench] $n%s samples: $a%.3f $b%.3f $c%.3f -> median ${median3(a, b, c)}%.3f")
      n -> median3(a, b, c)
    }
    val total = results.map(_._2).sum

    // The driver keeps only the last ~2000 characters of output and
    // parses the JSON line out of that window — a full-precision line
    // with every query overflows it and the window cuts the line's
    // head off (unparseable). Emit millisecond precision, and degrade
    // further if the query list ever grows the line past the window.
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def line(dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Stop the session BEFORE printing: the driver parses the JSON
    // line out of the tail of the output, and Spark's shutdown logging
    // (executor/BlockManager teardown) must not land after the line
    // and push it out of the ~2000-char window.
    spark.stop()
    println(Seq(3, 2, 1).map(line).find(_.length <= 1750).getOrElse(line(1)))
  }
}
