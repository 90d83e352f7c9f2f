package graft

import org.apache.spark.sql.functions._
import graft.functions.{kll_merge_agg, kll_quantile, kll_sketch_agg}

class KllSpec extends SparkSpec {
  import spark.implicits._

  test("kll quantiles land within the rank-error contract on uniform data") {
    // 100k uniform values: true rank of the estimate must be within
    // 3 * 1.65% of the target rank (k=200, 99% confidence, tripled)
    val df = spark.range(100000).select(($"id" % 10000).cast("double").as("x"))
    val est = df.agg(kll_sketch_agg($"x").as("sk"))
      .select(kll_quantile($"sk", lit(0.5)).as("p50"),
        kll_quantile($"sk", lit(0.99)).as("p99"))
      .head()
    val (p50, p99) = (est.getDouble(0), est.getDouble(1))
    def trueRank(v: Double): Double =
      df.filter($"x" <= v).count().toDouble / 100000
    assert(math.abs(trueRank(p50) - 0.5) < 0.05, s"p50=$p50 rank=${trueRank(p50)}")
    assert(math.abs(trueRank(p99) - 0.99) < 0.05, s"p99=$p99 rank=${trueRank(p99)}")
  }

  test("partial sketches merged equal one global sketch's accuracy, through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString
    val df = spark.range(50000)
      .select(($"id" % 7).as("g"), ($"id" % 1000).cast("double").as("x"))
    df.groupBy($"g").agg(kll_sketch_agg($"x").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val p50 = spark.read.parquet(dir)
      .agg(kll_merge_agg($"sk").as("sk"))
      .select(kll_quantile($"sk", lit(0.5))).head().getDouble(0)
    val rank = df.filter($"x" <= p50).count().toDouble / 50000
    assert(math.abs(rank - 0.5) < 0.05, s"merged p50=$p50 rank=$rank")
  }

  test("incremental append: merging an old persisted sketch with a new batch's") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kll_incr").toString
    val old = spark.range(20000).select($"id".cast("double").as("x"))
    val fresh = spark.range(20000, 40000).select($"id".cast("double").as("x"))
    old.agg(kll_sketch_agg($"x").as("sk")).write.parquet(s"$dir/b0")
    fresh.agg(kll_sketch_agg($"x").as("sk")).write.parquet(s"$dir/b1")
    // refresh = merge of the two persisted sketches, no rescan of `old`
    val p50 = spark.read.parquet(s"$dir/b0", s"$dir/b1")
      .agg(kll_merge_agg($"sk").as("sk"))
      .select(kll_quantile($"sk", lit(0.5))).head().getDouble(0)
    assert(math.abs(p50 - 20000.0) < 40000 * 0.05, s"p50=$p50")
  }

  test("empty sketch yields NULL quantile; nulls are skipped") {
    val r = spark.range(10)
      .select(when(lit(false), $"id".cast("double")).as("x"))
      .agg(kll_sketch_agg($"x").as("sk"))
      .select(kll_quantile($"sk", lit(0.5)).as("q")).head()
    assert(r.isNullAt(0))
  }

  test("bucketBySketch matches a driver-side inclusive-rank ladder (exact regime)") {
    // 3 keys x 120 rows, k=200 > group size => the sketch holds every
    // value and kll_quantile is the exact inclusive-rank quantile
    // (smallest v with rank >= p) — labels must match bit-for-bit.
    val rows = for (g <- 0 until 3; i <- 0 until 120)
      yield (g.toLong, i.toLong, ((i * 37 + g * 11) % 50).toDouble)
    val df = rows.toDF("g", "i", "v")
    val got = operators.Percentiles.bucketBySketch(df, "g", $"v", outCols = Seq("i"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2))).toMap
    val ps = operators.Percentiles.defaultPs
    val labels = ps.map(p => ((p * 100).round).toString)
    for (g <- 0 until 3) {
      val vs = rows.filter(_._1 == g).map(_._3).sorted
      val bounds = ps.map { p =>
        vs(math.max(0, math.ceil(p * vs.length).toInt - 1)) // smallest v with incl. rank >= p
      }
      rows.filter(_._1 == g).foreach { case (_, i, v) =>
        val want = bounds.indexWhere(v <= _) match {
          case -1 => "99+"
          case j => labels(j)
        }
        assert(got((g.toLong, i)) == want, s"g=$g i=$i v=$v")
      }
    }
  }

  test("kll functions registered for SQL; non-double input rejected at analysis") {
    graft.functions.registerAll(spark)
    val q = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5d) AS p50 FROM (
        |  SELECT kll_sketch_agg(CAST(id AS DOUBLE), 200) AS sk
        |  FROM range(1000) GROUP BY id % 4)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(q - 500.0) < 100, s"sql p50=$q")
    val e = intercept[Exception] {
      spark.sql("SELECT kll_sketch_agg(c) FROM VALUES ('a') AS t(c)").collect()
    }
    assert(e.getMessage.contains("double"), e.getMessage)
  }
}
