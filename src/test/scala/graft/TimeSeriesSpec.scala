package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def t(hour: Int, minute: Int = 0) = new Timestamp(
    java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli
      + (hour * 60L + minute) * 60000L)

  // key "a": hours 0, 0, 3 (gap at 1, 2); key "b": hour 5 only
  private val obs = Seq(
    ("a", t(0, 10), 1.0), ("a", t(0, 50), 2.0), ("a", t(3, 5), 10.0),
    ("b", t(5, 30), 7.0)).toDF("k", "ts", "v")

  test("resample: contiguous hourly grid per key, gaps NULL, in-bucket aggs exact") {
    val got = TimeSeries.resample(obs, "k", "ts", 3600L,
        Seq(count(lit(1)).cast("bigint").as("n"), sum($"v").as("s")))
      .orderBy($"k", $"bucket_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(3), // k, bucket_ts
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    // key a: 4 buckets (0..3), key b: 1 bucket
    assert(got.map(_._1).toSeq == Seq("a", "a", "a", "a", "b"))
    assert(got.map(_._2).toSeq == Seq(t(0), t(1), t(2), t(3), t(5)))
    assert(got.map(_._3).toSeq == Seq(2L, -1L, -1L, 1L, 1L))
    assert(got(0)._4 == 3.0 && got(3)._4 == 10.0 && got(4)._4 == 7.0)
  }

  test("fillForward carries last non-null per key; leading nulls stay null") {
    val df = Seq(("a", 1, Option(5.0)), ("a", 2, None), ("a", 3, None),
      ("a", 4, Option(9.0)), ("b", 1, None), ("b", 2, Option(1.0)))
      .toDF("k", "o", "v")
    val got = TimeSeries.fillForward(df, "k", "o", Seq("v"))
      .orderBy($"k", $"o").collect()
      .map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    assert(got(0) == 5.0 && got(1) == 5.0 && got(2) == 5.0 && got(3) == 9.0)
    assert(got(4).isNaN && got(5) == 1.0) // b's leading gap stays null
  }

  test("resample + fillForward compose: gap buckets inherit the prior value") {
    val res = TimeSeries.resample(obs, "k", "ts", 3600L,
      Seq(sum($"v").as("s")))
    val filled = TimeSeries.fillForward(res, "k", "bucket_ts", Seq("s"))
      .filter($"k" === "a").orderBy($"bucket_ts")
      .select($"s").collect().map(_.getDouble(0))
    assert(filled.toSeq == Seq(3.0, 3.0, 3.0, 10.0))
  }

  test("interpolateLinear: interior gaps take the straight line, edges flat, all-null stays null") {
    val df = Seq(
      ("a", t(0), Option(10.0)), ("a", t(1), None), ("a", t(2), None),
      ("a", t(3), Option(40.0)),                  // gap of 2 -> 20, 30
      ("a", t(4), Option(0.0)),
      ("b", t(0), None), ("b", t(1), Option(5.0)), ("b", t(2), None),
      ("c", t(0), None))                          // no observations at all
      .toDF("k", "ts", "v")
    val got = TimeSeries.interpolateLinear(df, "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(got == Set(
      ("a", t(0), Some(10.0)), ("a", t(1), Some(20.0)),
      ("a", t(2), Some(30.0)), ("a", t(3), Some(40.0)),
      ("a", t(4), Some(0.0)),
      ("b", t(0), Some(5.0)),  // leading edge: flat from the next obs
      ("b", t(1), Some(5.0)), ("b", t(2), Some(5.0)), // trailing flat
      ("c", t(0), None)), got.toString)
  }

  test("a key spanning more than maxStepsPerKey buckets fails loudly") {
    val wide = Seq(("a", t(0), 1.0), ("a", t(5000), 2.0)).toDF("k", "ts", "v")
    val ex = intercept[Exception] {
      TimeSeries.resample(wide, "k", "ts", 3600L,
        Seq(count(lit(1)).as("n")), maxStepsPerKey = 10).count()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("TimeSeries.resample")), ex.toString)
  }

  test("zscoreAnomalies: spike flagged, steady series clean, cold start abstains") {
    // key A: 10 steady points then a spike; key B: constant (zero
    // variance — never anomalous); first minPoints rows must abstain
    val rows =
      (1 to 10).map(i => ("A", i.toLong, 100.0 + (i % 2))) ++
        Seq(("A", 11L, 500.0)) ++
        (1 to 8).map(i => ("B", i.toLong, 42.0))
    val df = rows.toDF("k", "t", "v")
    val out = graft.operators.TimeSeries.zscoreAnomalies(
        df, "k", "t", "v", windowSize = 5, threshold = 3.0, minPoints = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getBoolean(r.fieldIndex("is_anomaly")),
          r.getLong(r.fieldIndex("n_baseline")))).toMap
    assert(out(("A", 11L))._1, "spike must be flagged")
    (4 to 10).foreach(i =>
      assert(!out(("A", i.toLong))._1, s"steady A@$i flagged"))
    (1 to 8).foreach(i =>
      assert(!out(("B", i.toLong))._1, s"zero-variance B@$i flagged"))
    // cold start: trailing window has < minPoints rows -> abstain
    (1 to 3).foreach { i =>
      assert(out(("A", i.toLong))._2 < 3 && !out(("A", i.toLong))._1)
    }
  }

  test("seasonalityProfile: complete grid, conservation, integer load factors, unit guard") {
    import org.apache.spark.sql.functions.col
    // 12 events at hour 9, 6 at hour 21, nothing else: total 18
    val rows = (Seq.fill(12)("2024-03-01 09:15:00") ++
      Seq.fill(6)("2024-03-01 21:40:00"))
      .map(java.sql.Timestamp.valueOf)
    val df = rows.map(Tuple1(_)).toDF("ts")
    val got = TimeSeries.seasonalityProfile(df, col("ts"), "hour")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.size == 24)                      // grid complete
    assert(got(9L) == ((12L, 12L * 24 * 1000000L / 18L)))
    assert(got(21L) == ((6L, 6L * 24 * 1000000L / 18L)))
    assert(got(3L) == ((0L, 0L)))               // silent bucket explicit
    assert(got.values.map(_._1).sum == 18L)     // conservation
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalityProfile(df, col("ts"), "fortnight")
    }
    // dow grid is 1..7 (Spark convention)
    val dow = TimeSeries.seasonalityProfile(df, col("ts"), "dow")
      .collect().map(_.getLong(0))
    assert(dow.toSeq == (1L to 7L))
  }

  test("cusum: prefix form equals the textbook recurrence; alarms; per-key isolation") {
    val vals = Seq(3.0, 3.2, 2.9, 3.1, 4.5, 4.8, 5.1, 4.9, 3.0, 1.0, 0.8)
    val rows = vals.zipWithIndex.map { case (v, i) => ("k1", t(i), v) } ++
      Seq(("k2", t(0), 100.0)) // a second key must not bleed in
    val (target, slack, thr) = (3000000L, 200000L, 1500000L)
    val got = TimeSeries.cusum(rows.toDF("k", "ts", "v"), "k", "ts", "v",
        target, slack, thr)
      .filter($"k" === "k1").orderBy($"ts")
      .collect().map(r => (r.getAs[Long]("cusum_pos_micros"),
        r.getAs[Long]("cusum_neg_micros"), r.getAs[Boolean]("alarm")))
    // reference: the sequential max(0, s + y) recurrence
    var sp = 0L; var sm = 0L
    val want = vals.map { v =>
      val m = math.round(v * 1e6)
      sp = math.max(0L, sp + (m - target - slack))
      sm = math.max(0L, sm + (target - m - slack))
      (sp, sm, sp > thr || sm > thr)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the sustained +1.5..2 shift must alarm on the positive side
    assert(got.exists(_._3))
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(rows.toDF("k", "ts", "v"), "k", "ts", "v",
        target, -1L, thr)
    }
  }

  test("holtForecast: hand-folded recurrence, horizon line, negative-trend truncation parity") {
    val df = Seq(("k", 1L, 10000000L), ("k", 2L, 12000000L),
      ("k", 3L, 14000000L)).toDF("key", "o", "x")
    val got = TimeSeries.holtForecast(df, "key", "o", "x",
        alphaPpm = 500000L, betaPpm = 500000L, horizon = 2)
      .collect().map(r => (r.getLong(4), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    // l1=10e6,b=0; x=12e6 -> l=11e6,b=5e5; x=14e6 -> l=12.75e6,b=1.125e6
    assert(got.toSeq == Seq(
      (1L, 3L, 12750000L, 1125000L, 13875000L),
      (2L, 3L, 12750000L, 1125000L, 15000000L)), got.toSeq.toString)
    // declining series: trend goes negative; Java / truncates toward
    // zero exactly like DuckDB // — pin the truncation direction
    val dec = Seq(("k", 1L, 1000001L), ("k", 2L, 0L)).toDF("key", "o", "x")
    val d = TimeSeries.holtForecast(dec, "key", "o", "x",
        alphaPpm = 500000L, betaPpm = 500000L, horizon = 1)
      .collect().head
    // l2 = (0 + 500000*1000001)/1e6 = 500000 (trunc); b = 500000*(500000-1000001)/1e6
    //    = -250000500000/1e6 -> trunc toward zero = -250000
    assert(d.getLong(2) == 500000L && d.getLong(3) == -250000L, d.toString)
    intercept[IllegalArgumentException] {
      TimeSeries.holtForecast(df, "key", "o", "x", alphaPpm = 2000000L)
    }
  }

  test("autocorrelation: closed form on a known series; constant series NULL; lag beyond n empty") {
    // x = 1,2,3,4,5,4,3,2 has known positive acf at lag 1, negative at 4
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 4L, 3L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("o", "x")
    val got = TimeSeries.autocorrelation(df, $"o", $"x", 9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    val n = xs.size; val s = xs.sum
    def acf(l: Int): Long = {
      val num = (0 until n - l)
        .map(i => (n * xs(i) - s).toDouble * (n * xs(i + l) - s)).sum
      val den = xs.map(x => (n * x - s).toDouble * (n * x - s)).sum
      math.round(num / den * 1e6)
    }
    (1 to 7).foreach { l =>
      assert(got(l.toLong) == (((n - l).toLong, Some(acf(l)))), s"lag $l")
    }
    assert(got(1L)._2.get >= 500000L)  // strong short-range memory
    assert(got(4L)._2.get < 0L)        // the turn shows as anti-correlation
    // lags with no pairs are absent (8, 9 over an 8-point series)
    assert(!got.contains(8L) && !got.contains(9L))
    // constant series: zero denominator -> NULL, not a phantom
    val const = Seq.tabulate(5)(i => (i, 7L)).toDF("o", "x")
    val c = TimeSeries.autocorrelation(const, $"o", $"x", 2).collect()
    assert(c.forall(_.isNullAt(2)))
  }

  test("pacf: lag 1 = acf, lag 2 closed form off the quantized acf, constant series empty") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 4L, 3L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("o", "x")
    val acf = TimeSeries.autocorrelation(df, $"o", $"x", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = TimeSeries.pacf(df, $"o", $"x", 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == 4)
    // Durbin-Levinson base: phi_11 = r1 (the quantized acf value)
    val r1 = acf(1L).toDouble / 1e6
    val r2 = acf(2L).toDouble / 1e6
    assert(got(1L) == Some(math.round(r1 * 1e6)))
    // order 2 closed form: (r2 - r1^2) / (1 - r1^2)
    assert(got(2L) ==
      Some(math.round((r2 - r1 * r1) / (1.0 - r1 * r1) * 1e6)))
    // lag 3 exists and is finite (full recursion ran)
    assert(got(3L).isDefined && got(4L).isDefined)
    val const = Seq.tabulate(6)(i => (i, 7L)).toDF("o", "x")
    assert(TimeSeries.pacf(const, $"o", $"x", 3).count() == 0L)
  }

  test("holtForecastInterval: hand error multisets at alpha=1, rank radius, small samples refuse") {
    // alpha = 1e6, beta = 0: level tracks the last value, so the
    // rolling errors are |x_t - x_{t+h}|: h=1 -> {1,4,2}, h=2 -> {3,2}
    val xs = Seq(10L, 12L, 11L, 15L, 13L)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
      .toDF("k", "o", "x")
    val got = TimeSeries.holtForecastInterval(df, "k", "o", "x",
      alphaPpm = 1000000L, betaPpm = 0L, horizon = 2, minTrain = 2,
      coverPpm = 500000L).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // h=1: sorted {1,2,4}, k = ceil(4*0.5) = 2 -> radius 2, f = 13
    assert(got(1L) == ((3L, 13L, 2L, 11L, 15L)))
    // h=2: sorted {2,3}, k = ceil(3*0.5) = 2 -> radius 3
    assert(got(2L) == ((2L, 13L, 3L, 10L, 16L)))
    // 90% coverage needs more errors than exist -> no row lies
    assert(TimeSeries.holtForecastInterval(df, "k", "o", "x",
      alphaPpm = 1000000L, betaPpm = 0L, horizon = 2, minTrain = 2,
      coverPpm = 900000L).count() == 0L)
  }

  test("theilSen: outlier-immune slope, negative-trend truncation, per-key isolation, guard") {
    // g: clean slope 10/step with one wild outlier the median ignores
    // (OLS would report ~320/step); h: exact negative trend
    val df = Seq(
      ("g", 0L, 0L), ("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 1000L),
      ("h", 10L, 100L), ("h", 11L, 90L), ("h", 12L, 80L))
      .toDF("k", "x", "y")
    val got = TimeSeries.theilSen(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // g slopes (micros): [1e7,1e7,1e7,333333333,495000000,980000000]
    // -> disc median 1e7; residuals [0,0,0,97e7] -> disc median 0
    assert(got("g") == ((4L, 10000000L, 0L)), got.toString)
    // h: x centers to [0,1,2]; slope -1e7 exactly (truncating division
    // agrees on negatives), level at series start 100e6
    assert(got("h") == ((3L, -10000000L, 100000000L)), got.toString)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.theilSen(df, Seq("k"), col("x"), col("y"),
        maxGroupPoints = 3L)
    }
    assert(e.getMessage.contains("cap 3"), e.getMessage)
  }

  test("holtWintersForecast: hand-folded seasonal recurrence; short series emit nothing") {
    // period 2, alpha=beta=gamma=0.5, series 10,20,14,26 (micros)
    // init: l=15, b=0, s=[-5,5]
    // t=2 (x=14, slot 0): l=17, b=1, s0=-4
    // t=3 (x=26, slot 1): l=(10.5+9)->19 (trunc), b=1 (1.5 trunc), s1=6
    // forecasts: h=1 slot 0: 19+1-4=16; h=2 slot 1: 19+2+6=27
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 14L),
      ("g", 4L, 26L), ("short", 1L, 5L), ("short", 2L, 6L))
      .toDF("k", "o", "x")
    val got = TimeSeries.holtWintersForecast(df, "k", "o", "x",
        period = 2, alphaPpm = 500000L, betaPpm = 500000L,
        gammaPpm = 500000L, horizon = 2)
      .collect().map(r => (r.getString(0), r.getLong(4)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))))
      .toMap
    assert(got(("g", 1L)) == ((4L, 19L, 1L, 16L)), got.toString)
    assert(got(("g", 2L)) == ((4L, 19L, 1L, 27L)), got.toString)
    // exactly period obs: no fold step possible, no output
    assert(!got.keySet.exists(_._1 == "short"), got.toString)
    intercept[IllegalArgumentException] {
      TimeSeries.holtWintersForecast(df, "k", "o", "x", period = 1)
    }
  }

  test("kendallTau: hand-classified pairs, tie corrections, all-tied axis NULL") {
    val df = Seq(
      // g: C=3, D=3 -> tau 0
      ("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L), ("g", 4L, 5L),
      // h: one x-tie, one y-tie, C=1 -> tau_b = 1/sqrt(2*2) = 0.5
      ("h", 1L, 5L), ("h", 1L, 6L), ("h", 2L, 6L),
      // i: perfect concordance -> 1
      ("i", 1L, 1L), ("i", 2L, 4L), ("i", 3L, 9L),
      // j: constant y -> undefined
      ("j", 1L, 7L), ("j", 2L, 7L))
      .toDF("k", "x", "y")
    val got = TimeSeries.kendallTau(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got("g") == ((4L, 3L, 3L, Some(0L))), got.toString)
    assert(got("h") == ((3L, 1L, 0L, Some(500000L))), got.toString)
    assert(got("i") == ((3L, 3L, 0L, Some(1000000L))), got.toString)
    assert(got("j")._4.isEmpty, got.toString)
    intercept[IllegalArgumentException] {
      TimeSeries.kendallTau(df, Seq("k"), col("x"), col("y"),
        maxGroupPoints = 2L)
    }
  }

  test("holtBacktest: hand-folded origins, exact MAEs and MASE; short series emit nothing") {
    // alpha=0.5, beta=0: l folds as (x + l)/2 with truncation; every
    // origin >= 2 forecasts flat l for h=1,2 against a rising line
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 40L), ("a", 5L, 50L),
      ("b", 1L, 5L), ("b", 2L, 5L)) // 2 obs < minTrain+1 -> no origin
      .toDF("k", "o", "x")
    val got = TimeSeries.holtBacktest(rows, "k", "o", "x",
        alphaPpm = 500000L, betaPpm = 0L, horizon = 2, minTrain = 2)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    // hand fold: states l=15,22,31 at origins t=2,3,4; errors
    // ef = 15,25,18,28,19 (sum 105), en = 10,20,10,20,10 (sum 70)
    assert(r.getString(0) == "a" && r.getLong(1) == 5L)
    assert(r.getLong(2) == 21L && r.getLong(3) == 14L)
    assert(r.getLong(4) == 1500000L)
  }

  test("decompose: pure line is all trend; square-wave seasonality lands in the slot medians") {
    // pure line y = 100 + 10x: slope 10e6, intercept 100e6, zero
    // seasonal and residual everywhere
    val line = (0L to 7L).map(x => ("a", x, x % 2, 100L + 10L * x))
      .toDF("k", "x", "slot", "v")
    val gl = TimeSeries.decompose(line, "k", col("x"), col("slot"), "v")
      .orderBy(col("x")).collect()
    assert(gl.length == 8)
    gl.foreach { r =>
      assert(r.getLong(4) == r.getLong(3), "trend == value on a line")
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
    }
    // square wave y = 105/95 alternating: slope's disc-median is 0,
    // intercept disc-median 95e6 -> trend 95; slot medians 10 / 0
    val sq = (0L to 7L).map(x =>
      ("a", x, x % 2, if (x % 2 == 0) 105L else 95L))
      .toDF("k", "x", "slot", "v")
    val gs = TimeSeries.decompose(sq, "k", col("x"), col("slot"), "v")
      .orderBy(col("x")).collect()
    gs.foreach { r =>
      assert(r.getLong(4) == 95L, "trend")
      assert(r.getLong(5) == (if (r.getLong(2) == 0L) 10L else 0L),
        "seasonal")
      assert(r.getLong(6) == 0L, "residual")
    }
  }

  test("robustAnomalies: spike on a square wave flags alone; clean cycle stays silent") {
    // square wave 105/95 with one +50 spike at x=10 (a peak slot):
    // trend 95, seasonal (10, 0), residuals all 0 except 50 at x=10;
    // zero MAD -> any nonzero deviation flags (documented direction)
    val rows = (0L to 15L).map { x =>
      val base = if (x % 2 == 0) 105L else 95L
      ("a", x, x % 2, if (x == 10L) base + 50L else base)
    }.toDF("k", "x", "slot", "v")
    val got = TimeSeries.robustAnomalies(rows, "k", col("x"),
      col("slot"), "v").collect()
    assert(got.length == 1, got.mkString(", "))
    val r = got(0)
    assert(r.getLong(1) == 10L && r.getLong(6) == 50L &&
      r.getLong(7) == 0L, r.toString)
    // the clean wave alone: nothing flags
    val clean = (0L to 15L).map(x =>
      ("a", x, x % 2, if (x % 2 == 0) 105L else 95L))
      .toDF("k", "x", "slot", "v")
    assert(TimeSeries.robustAnomalies(clean, "k", col("x"), col("slot"),
      "v").count() == 0L)
  }

  test("changepoint: clean level shift localized exactly; means; single-obs key empty") {
    // key "a": 4 obs at 10, then 4 at 20 — the split is after t=4:
    // C_t = |8*S_t - t*S_8| peaks at t=4 (|8*40 - 4*120| = 160)
    val df = (Seq.fill(4)(10L) ++ Seq.fill(4)(20L)).zipWithIndex
      .map { case (v, i) => ("a", i.toLong + 1L, v * 1000000L) }
      .++(Seq(("b", 1L, 5000000L))) // single obs: no interior split
      .toDF("k", "o", "x")
    val got = TimeSeries.changepoint(df, "k", "o", "x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 1) // key b emits nothing
    val (k, n, split, at, stat, pre, post) = got(0)
    assert(k == "a" && n == 8L && split == 4L && at == 4L)
    // stat = C_max div n = (8*40 - 4*120 = 160 in value units) -> micros
    assert(stat == 160L * 1000000L / 8L)
    assert(pre == 10000000L && post == 20000000L)
  }

  test("changepoint: argmax tie-break takes the earliest t; negative means truncate like the oracle") {
    // symmetric V shape: ties in C_t resolve to the smaller t
    val df = Seq(("a", 1L, -3000000L), ("a", 2L, 1000000L),
      ("a", 3L, -3000000L)).toDF("k", "o", "x")
    val got = TimeSeries.changepoint(df, "k", "o", "x").collect()
    assert(got.length == 1)
    val r = got(0)
    // S = [-3, -2, -5]; C_t = |3*S_t - t*(-5)|: t=1 -> |-9+5|=4,
    // t=2 -> |-6+10|=4 — tie, earliest wins
    assert(r.getLong(2) == 1L, r.toString)
    // mean_pre = -3e6 div 1 (negative dividend truncates toward zero
    // on both engines)
    assert(r.getLong(5) == -3000000L)
  }

  test("changepoints: two staircase shifts found in statistic order; constant tail stops; guard") {
    // 0,0,0,0, 1,1,1,1, 3,3,3,3 (micros x 1e6): round 1 splits at
    // t=8 (the bigger 1->3 shift, C=80e6 on the full series), round
    // 2 at t=4 inside the left segment (C=16e6 over n=8), round 3
    // finds only zero-statistic splits (constant segments) and stops
    val xs = Seq.fill(4)(0L) ++ Seq.fill(4)(1000000L) ++
      Seq.fill(4)(3000000L)
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i.toLong + 1L, v) }
      .toDF("k", "o", "x")
    val got = TimeSeries.changepoints(df, "k", "o", "x",
        maxChangepoints = 3, minSegment = 2)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.length == 2, got.mkString(";"))
    // rank 1: full series n=12, S_8=4e6, S_12=16e6, C=|12*4-8*16|e6
    assert(got(0) == ((1L, 8L, 12L, 80000000L / 12L, 500000L, 3000000L)))
    // rank 2: left segment n=8, split at local t=4 (global 4)
    assert(got(1) == ((2L, 4L, 8L, 16000000L / 8L, 0L, 1000000L)))
    // single-round reproduces changepoint's pick on the same data
    val single = TimeSeries.changepoint(df, "k", "o", "x")
      .collect().head
    assert(single.getLong(2) == 8L)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.changepoints(df, "k", "o", "x", maxChangepoints = 0)
    }
    assert(e.getMessage.contains("[1, 16]"))
  }

  test("arForecast: period-3 cycle loads phi3, forecasts repeat the cycle; guards") {
    // A strict period-3 series (10,20,30 repeating, 30 points): the
    // lag-3 autocorrelation dominates, so the Yule-Walker AR(3) puts
    // its weight on phi3 and the forecast continues the cycle phase.
    val xs = (0 until 30).map(i => Seq(10L, 20L, 30L)(i % 3))
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("o", "x")
    val got = TimeSeries.arForecast(df, $"o", $"x", p = 3,
      horizon = 6, lbLags = 6).collect()
    assert(got.length == 6)
    // For a zero-mean period-3 cycle, y_t = y_{t-3} and
    // y_t = -y_{t-1} - y_{t-2} are BOTH exact AR representations —
    // the Yule-Walker system is near-singular and may pick any mix —
    // so pin the FORECAST, not the coefficients: whatever phi the fit
    // chose must continue the 10,20,30 cycle (x_31=10, x_32=20, ...)
    // to within fit/truncation error.
    assert(got.map(_.getLong(4)).distinct.length == 1) // constants repeat
    val f = got.map(r => r.getLong(0) -> r.getLong(5)).toMap
    val cyc = Map(1L -> 10000000L, 2L -> 20000000L, 3L -> 30000000L,
      4L -> 10000000L, 5L -> 20000000L, 6L -> 30000000L)
    cyc.foreach { case (h, v) =>
      assert(math.abs(f(h) - v) < 3000000L,
        s"step $h forecast ${f(h)} not near cycle value $v")
    }
    // deterministic: a second run reproduces identical rows
    val again = TimeSeries.arForecast(df, $"o", $"x", p = 3,
      horizon = 6, lbLags = 6).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // loud guards: too-short series; lbLags <= p
    val short = (1 to 8).map(i => (i.toLong, 10L)).toDF("o", "x")
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.arForecast(short, $"o", $"x", p = 3, lbLags = 12)
    }
    assert(e1.getMessage.contains("need more than"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.arForecast(df, $"o", $"x", p = 3, lbLags = 3)
    }
    assert(e2.getMessage.contains("lbLags"))
  }

  test("croston: hand-folded size/interval states, SBA truncation, guards") {
    // key a: demands z=10@o=1, z=20@o=3, z=40@o=4 at alpha=0.5
    //   seed: zs=10e6; i=2: q=2 -> qs=2e6, zs=(.5*20e6+.5*10e6)=15e6
    //   i=3: q=1 -> qs=(.5*1e6+.5*2e6)=1.5e6, zs=(.5*40e6+.5*15e6)=27.5e6
    //   rate = 27.5e12 // 1.5e6 = 18333333 (trunc)
    //   sba  = 18333333 * 750000 // 1e6 = 13749999 (trunc .75)
    // key b: one demand -> emits nothing; zero demand rows ignored
    val df = Seq(("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 20L),
      ("a", 4L, 40L), ("b", 9L, 5L)).toDF("k", "o", "z")
    val got = TimeSeries.croston(df, "k", "o", "z", alphaPpm = 500000L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getLong(1) == 3L)
    assert(r.getLong(2) == 27500000L && r.getLong(3) == 1500000L)
    assert(r.getLong(4) == 18333333L && r.getLong(5) == 13749999L)
    // guards: negative demand; duplicate order (q = 0); oversize z
    val neg = Seq(("a", 1L, 5L), ("a", 2L, -3L)).toDF("k", "o", "z")
    val e1 = intercept[org.apache.spark.SparkException] {
      TimeSeries.croston(neg, "k", "o", "z").collect()
    }
    assert(e1.getMessage.contains("non-negative"))
    val dup = Seq(("a", 1L, 5L), ("a", 1L, 7L)).toDF("k", "o", "z")
    val e2 = intercept[org.apache.spark.SparkException] {
      TimeSeries.croston(dup, "k", "o", "z").collect()
    }
    assert(e2.getMessage.contains("strictly increasing"))
    val big = Seq(("a", 1L, 5L), ("a", 2L, 10000000L)).toDF("k", "o", "z")
    val e3 = intercept[org.apache.spark.SparkException] {
      TimeSeries.croston(big, "k", "o", "z").collect()
    }
    assert(e3.getMessage.contains("overflow-safe"))
  }

  test("ewmVolatility: hand-folded variance at lambda=0.5, seed row, guard") {
    // x = 10, 13, 7: ret 0/3/-6; v = 0, 4.5e6, 20.25e6 micro;
    // sigma = 0, round(sqrt(4.5)*1e6)=2121320, sqrt(20.25)=4.5 exact
    val df = Seq(("a", 1L, 10L), ("a", 2L, 13L), ("a", 3L, 7L),
      ("b", 1L, 99L)).toDF("k", "o", "x")
    val got = TimeSeries.ewmVolatility(df, "k", "o", "x",
        lambdaPpm = 500000L)
      .orderBy($"k", $"o").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("a", 1L, 10L, 0L, 0L, 0L),
      ("a", 2L, 13L, 3L, 4500000L, 2121320L),
      ("a", 3L, 7L, -6L, 20250000L, 4500000L),
      ("b", 1L, 99L, 0L, 0L, 0L))) // single-row key: seed only
    // overflow guard: |delta| beyond 3000 refuses loudly
    val wild = Seq(("a", 1L, 0L), ("a", 2L, 5000L)).toDF("k", "o", "x")
    val e = intercept[org.apache.spark.SparkException] {
      TimeSeries.ewmVolatility(wild, "k", "o", "x").collect()
    }
    assert(e.getMessage.contains("overflow-safe"))
  }

  test("kalmanLocalLevel: hand-folded gain/level/variance, negative innovation, guards") {
    // Q = R = 1e6, series 0, 1e6, 1e6:
    //  t1 seed: l=0, p=R=1e6, e=0, g=0
    //  t2: pp=2e6, g=2e12//3e6=666666, e=1e6,
    //      l=666666*1e6//1e6=666666, p=2e6*333334//1e6=666668
    //  t3: pp=1666668, g=1666668e6//2666668=625000, e=333334,
    //      l=666666+625000*333334//1e6=666666+208333=874999,
    //      p=1666668*375000//1e6=625000
    val df = Seq(("a", 1L, 0L), ("a", 2L, 1000000L), ("a", 3L, 1000000L))
      .toDF("k", "o", "x")
    val got = TimeSeries.kalmanLocalLevel(df, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1000000L),
      (2L, 1000000L, 666666L, 666666L, 666668L),
      (3L, 333334L, 625000L, 874999L, 625000L)), got.toSeq.toString)
    // negative innovation truncates toward zero like DuckDB //
    val dec = Seq(("a", 1L, 1000000L), ("a", 2L, 0L)).toDF("k", "o", "x")
    val d = TimeSeries.kalmanLocalLevel(dec, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L).collect()(1)
    assert(d.getLong(3) == -1000000L && d.getLong(5) == 333334L, d.toString)
    // gain settles: on a long series the variance reaches its steady
    // state (p stops moving), and the gain with it
    val long = (1 to 40).map(i => ("a", i.toLong, 0L)).toDF("k", "o", "x")
    val ps = TimeSeries.kalmanLocalLevel(long, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L)
      .collect().map(_.getLong(6))
    assert(math.abs(ps(39) - ps(38)) <= 1L, ps.takeRight(5).mkString(","))
    assert(ps(39) < 1000000L && ps(39) > 500000L, ps.last.toString)
    // guards: non-positive variances; overflow-safe Q+R bound;
    // oversize innovation refuses loudly
    intercept[IllegalArgumentException] {
      TimeSeries.kalmanLocalLevel(df, "k", "o", "x", qMicros = 0L)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.kalmanLocalLevel(df, "k", "o", "x",
        qMicros = 5000000000000L, rMicros = 5000000000000L)
    }
    val wild = Seq(("a", 1L, 0L), ("a", 2L, 9000000000001L))
      .toDF("k", "o", "x")
    val e = intercept[org.apache.spark.SparkException] {
      TimeSeries.kalmanLocalLevel(wild, "k", "o", "x").collect()
    }
    assert(e.getMessage.contains("overflow-safe"))
  }

  test("kalmanLocalLevelGaps: predict-only steps grow variance, next gain larger, guards") {
    // Q = R = 1e6; observations at o = 0 and o = 2 with a gap at 1:
    //  o=0 seed: l=0, p=1e6
    //  o=1 gap:  l=0, p=2e6, NULL x/innovation/gain
    //  o=2: pp=3e6, gain=3e12//4e6=750000 (vs 666666 without the gap
    //       — the gap honestly raised the gain), e=1e6, l=750000,
    //       p=3e6*250000//1e6=750000
    val df = Seq(("a", 0L, 0L), ("a", 2L, 1000000L)).toDF("k", "o", "x")
    val got = TimeSeries.kalmanLocalLevelGaps(df, "k", "o", "x",
        step = 1L, qMicros = 1000000L, rMicros = 1000000L).collect()
    assert(got.length == 3)
    val gap = got(1)
    assert(gap.isNullAt(2) && !gap.getBoolean(3) && gap.isNullAt(4) &&
      gap.isNullAt(5) && gap.getLong(6) == 0L && gap.getLong(7) == 2000000L,
      gap.toString)
    val upd = got(2)
    assert(upd.getBoolean(3) && upd.getLong(5) == 750000L &&
      upd.getLong(6) == 750000L && upd.getLong(7) == 750000L, upd.toString)
    // a gapless grid reproduces the plain filter exactly
    val dense = Seq(("a", 1L, 0L), ("a", 2L, 1000000L), ("a", 3L, 1000000L))
      .toDF("k", "o", "x")
    val viaGaps = TimeSeries.kalmanLocalLevelGaps(dense, "k", "o", "x",
        step = 1L, qMicros = 1000000L, rMicros = 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    val viaFilter = TimeSeries.kalmanLocalLevel(dense, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(viaGaps.toSeq == viaFilter.toSeq)
    // guards: off-grid order; duplicate order
    val off = Seq(("a", 0L, 1L), ("a", 3L, 2L)).toDF("k", "o", "x")
    val e1 = intercept[org.apache.spark.SparkException] {
      TimeSeries.kalmanLocalLevelGaps(off, "k", "o", "x", step = 2L,
        qMicros = 1000000L, rMicros = 1000000L).collect()
    }
    assert(e1.getMessage.contains("off the 2-grid"), e1.getMessage)
    val dup = Seq(("a", 0L, 1L), ("a", 0L, 2L)).toDF("k", "o", "x")
    val e2 = intercept[org.apache.spark.SparkException] {
      TimeSeries.kalmanLocalLevelGaps(dup, "k", "o", "x", step = 1L,
        qMicros = 1000000L, rMicros = 1000000L).collect()
    }
    assert(e2.getMessage.contains("duplicate order"), e2.getMessage)
    // the observed step AFTER a gap adds one more Q on top of the
    // gap-grown p: q=4.5e12/r=1e6 passes the entry guard and the gap
    // step (p = 1e6+4.5e12 < 9e12), but the update's pp = p+q breaks
    // 9e12 — must throw loudly, not overflow pp*1e6 silently
    val nearMax = Seq(("a", 0L, 0L), ("a", 2L, 1L)).toDF("k", "o", "x")
    val e3 = intercept[org.apache.spark.SparkException] {
      TimeSeries.kalmanLocalLevelGaps(nearMax, "k", "o", "x", step = 1L,
        qMicros = 4500000000000L, rMicros = 1000000L).collect()
    }
    assert(e3.getMessage.contains("predicted variance"), e3.getMessage)
  }

  test("kalmanSmooth: forward pass == filter, hand-folded backward pass, last step untouched") {
    // same Q = R = 1e6 series as the filter test: filtered
    // l = (0, 666666, 874999), p = (1e6, 666668, 625000); backward:
    //  t3: c=0, sm=874999 (no later evidence)
    //  t2: c = 666668e6//1666668 = 400000,
    //      sm = 666666 + 400000*(874999-666666)//1e6 = 749999
    //  t1: c = 1e6*1e6//2e6 = 500000, sm = 0 + 500000*749999//1e6 = 374999
    val df = Seq(("a", 1L, 0L), ("a", 2L, 1000000L), ("a", 3L, 1000000L))
      .toDF("k", "o", "x")
    val got = TimeSeries.kalmanSmooth(df, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 0L, 500000L, 374999L),
      (2L, 666666L, 400000L, 749999L),
      (3L, 874999L, 0L, 874999L)), got.toSeq.toString)
    // a single-observation key is its own smooth
    val one = Seq(("b", 1L, 42L)).toDF("k", "o", "x")
    val o1 = TimeSeries.kalmanSmooth(one, "k", "o", "x",
      qMicros = 1000000L, rMicros = 1000000L).collect().head
    assert(o1.getLong(3) == 42L && o1.getLong(5) == 42L)
    intercept[IllegalArgumentException] {
      TimeSeries.kalmanSmooth(df, "k", "o", "x", rMicros = 0L)
    }
    // the backward smoothing delta is bounded by the SPREAD of
    // filtered levels, not by any single innovation: this series keeps
    // every innovation at exactly 9e12 (legal — the forward guard is
    // strict >) yet drifts the levels so far that sm(t+1) − ls(0)
    // breaks 9e12 on the backward pass — must throw loudly there
    val drift = Seq(0L, 9000000000000L, 14999994000000L,
        20624994000000L, 26196417000000L, 31760046000000L)
      .zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "o", "x")
    val eDrift = intercept[org.apache.spark.SparkException] {
      TimeSeries.kalmanSmooth(drift, "k", "o", "x",
        qMicros = 1000000L, rMicros = 1000000L).collect()
    }
    assert(eDrift.getMessage.contains("smoothing delta"),
      eDrift.getMessage)
  }

  test("arimaForecast: diff fit matches arForecast on the diffs; integration is exact cumsum") {
    // levels are the running sum of the period-3 cycle, so the DIFF
    // series is exactly the arForecast test's series — the ARIMA fit
    // must reproduce that AR fit on diffs, and the level forecasts
    // must be 1e6*x_n + the running sum of the diff forecasts.
    val diffs = (0 until 30).map(i => Seq(10L, 20L, 30L)(i % 3))
    val levels = diffs.scanLeft(100L)(_ + _) // 31 levels, x_1 = 100
    val df = levels.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("o", "x")
    val got = TimeSeries.arimaForecast(df, $"o", $"x", p = 3,
      horizon = 6, lbLags = 6).collect()
    assert(got.length == 6)
    val ar = TimeSeries.arForecast(
        diffs.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
          .toDF("o", "x"), $"o", $"x", p = 3, horizon = 6, lbLags = 6)
      .collect()
    // phi, diff forecast, and Ljung-Box all match the AR-on-diffs fit
    (got zip ar).foreach { case (g, a) =>
      assert(g.getLong(0) == a.getLong(0)) // step
      assert(g.getLong(2) == a.getLong(2) && g.getLong(3) == a.getLong(3)
        && g.getLong(4) == a.getLong(4)) // phi1..3
      assert(g.getLong(5) == a.getLong(5),
        s"diff forecast ${g.getLong(5)} != AR ${a.getLong(5)}")
      assert(g.getLong(7) == a.getLong(6)) // lb_q
    }
    // n_obs counts LEVELS; integration: forecast = 1e6*x_31 + cumsum
    assert(got.head.getLong(1) == 31L)
    var cum = levels.last * 1000000L
    got.foreach { g =>
      cum += g.getLong(5)
      assert(g.getLong(6) == cum, s"step ${g.getLong(0)}: ${g.getLong(6)} != $cum")
    }
    // guards: an empty / all-NULL series refuses with the friendly
    // message (not an NPE on the NULL max_by), and a last level past
    // 9e12 refuses before the 10⁶·xₙ integration base can overflow
    val empty = Seq.empty[(Long, java.lang.Long)].toDF("o", "x")
    val eEmpty = intercept[IllegalArgumentException] {
      TimeSeries.arimaForecast(empty, $"o", $"x", p = 3, horizon = 2)
    }
    assert(eEmpty.getMessage.contains("at least 1 non-NULL level"),
      eEmpty.getMessage)
    val big = (1 to 12).map(i => (i.toLong, 9000000000001L + i))
      .toDF("o", "x")
    val eBig = intercept[IllegalArgumentException] {
      TimeSeries.arimaForecast(big, $"o", $"x", p = 3, horizon = 2)
    }
    assert(eBig.getMessage.contains("overflow-safe"), eBig.getMessage)
  }

  test("maCrossover: hand signals both directions, flat series silent, guards") {
    // fast=2/slow=3 over [10,10,10, 1,1, 100,100]:
    //  i3: d = 20*3 - 30*2 = 0 (sign 0 — no regime established yet)
    //  i4: d = 11*3 - 21*2 = -9, NO preceding nonzero sign -> silent
    //    (a tie carries no regime to cross from)
    //  i5: d = -18 (no change of sign)
    //  i6: d = 101*3 - 102*2 = 99, last nonzero -1 -> GOLDEN
    //  i7: d = 198 (no signal)
    val df = Seq(10L, 10L, 10L, 1L, 1L, 100L, 100L).zipWithIndex
      .map { case (v, i) => (i.toLong + 1L, v) }.toDF("o", "x")
    val got = TimeSeries.maCrossover(df, $"o", $"x", fast = 2, slow = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (6L, "golden", 50500L, 34000L)), got.mkString(";"))
    // a flat series never signals (d = 0 everywhere is not a cross)
    val flat = (1 to 10).map(i => (i.toLong, 7L)).toDF("o", "x")
    assert(TimeSeries.maCrossover(flat, $"o", $"x", fast = 2, slow = 3)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      TimeSeries.maCrossover(df, $"o", $"x", fast = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.maCrossover(df, $"o", $"x", fast = 6, slow = 6)
    }
  }

  test("maCrossover: a zero TOUCH without a true cross stays silent") {
    // fast=1/slow=2: x = [2,4, 3,3, 4, 1,3, 2] gives d (=x_i*2 - (x_{i-1}+x_i))
    //  = x_i - x_{i-1}: +2, -1, 0, +1, -3, +2, -1 at i2..i8.
    //  i3: -1 after +2 -> death; i4: 0 (touch); i5: +1 with last
    //  nonzero -1 -> golden (the -,0,+ true cross); i6: -3 -> death;
    //  i7: +2 -> golden; i8: -1 -> death. Crucially a +,0,+ sequence
    //  (build one: x=[1,2,2,3]: d=+1,0,+1) must NOT fire on the
    //  second +.
    val touch = Seq(1L, 2L, 2L, 3L).zipWithIndex
      .map { case (v, i) => (i.toLong + 1L, v) }.toDF("o", "x")
    assert(TimeSeries.maCrossover(touch, $"o", $"x", fast = 1, slow = 2)
      .collect().isEmpty)
    // and -,0,+ DOES fire exactly once, at the +
    val cross = Seq(3L, 2L, 2L, 3L).zipWithIndex
      .map { case (v, i) => (i.toLong + 1L, v) }.toDF("o", "x")
    val gotC = TimeSeries.maCrossover(cross, $"o", $"x", fast = 1, slow = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(gotC.toSeq == Seq((4L, "golden")), gotC.mkString(";"))
  }

  test("maCrossoverByKey: per-key signals equal the single-series op per key") {
    val a = Seq(10L, 10L, 10L, 1L, 1L, 100L, 100L)
    val b = Seq(100L, 100L, 100L, 1L, 1L, 1L, 1L)
    val fleet = (a.zipWithIndex.map { case (v, i) =>
        ("a", i.toLong + 1L, v) } ++
      b.zipWithIndex.map { case (v, i) => ("b", i.toLong + 1L, v) })
      .toDF("k", "o", "x")
    val got = TimeSeries.maCrossoverByKey(fleet, $"k", $"o", $"x",
        fast = 2, slow = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    def single(vs: Seq[Long]) = TimeSeries.maCrossover(
        vs.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
          .toDF("o", "x"), $"o", $"x", fast = 2, slow = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = single(a).map(t => ("a", t._1, t._2, t._3, t._4)) ++
      single(b).map(t => ("b", t._1, t._2, t._3, t._4))
    assert(got.toSeq == want.toSeq, got.mkString(";"))
    assert(got.nonEmpty)
  }

  test("runsTestByKey: per-key verdicts equal runsTest per key; all-tie key surfaces with NULL z") {
    val alt = Seq(3L, 9L, 1L, 9L, 1L)
    val tr = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val fleet = (alt.zipWithIndex.map { case (v, i) =>
        ("alt", i.toLong + 1L, v) } ++
      tr.zipWithIndex.map { case (v, i) => ("tr", i.toLong + 1L, v) } ++
      Seq(("cst", 1L, 7L), ("cst", 2L, 7L), ("cst", 3L, 7L)))
      .toDF("k", "o", "x")
    val got = TimeSeries.runsTestByKey(fleet, $"k", $"o", $"x")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
    def single(vs: Seq[Long]) = {
      val r = TimeSeries.runsTest(
        vs.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
          .toDF("o", "x"), $"o", $"x").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
    }
    assert(got("alt") == single(alt), got("alt").toString)
    assert(got("tr") == single(tr), got("tr").toString)
    // every value ties the median: zero marks, NULL z — the key
    // surfaces instead of vanishing
    assert(got("cst") == ((0L, 0L, 0L, None)), got("cst").toString)
    assert(got.size == 3)
  }

  test("runsTest: alternation and trend closed forms, median ties drop, degenerates NULL") {
    // [3, 9, 1, 9, 1]: lower median 3 drops itself; marks up/dn/up/dn
    // -> R=4, n1=n2=2, mu=3, sigma^2=2/3, z = 1/sqrt(2/3)
    val alt = Seq((1L, 3L), (2L, 9L), (3L, 1L), (4L, 9L), (5L, 1L))
      .toDF("o", "x")
    val a = TimeSeries.runsTest(alt, $"o", $"x").collect().head
    assert((a.getLong(0), a.getLong(1), a.getLong(2)) == ((2L, 2L, 4L)),
      a.toString)
    val zAlt = (4.0 - (2.0 * 2 * 2 / 4.0 + 1.0)) /
      math.sqrt(2.0 * 2 * 2 * (2.0 * 2 * 2 - 2 - 2) / (4.0 * 4.0 * 3.0))
    assert(a.getLong(3) == math.round(zAlt * 1e6), a.toString)
    assert(!a.getBoolean(4))
    // a two-level trend: 1..5 then 20..24 — median 5 drops, ONE run
    // below then one above -> R=2, strongly non-random
    val tr = (Seq(1L, 2L, 3L, 4L, 5L) ++ Seq(20L, 21L, 22L, 23L, 24L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("o", "x")
    val t = TimeSeries.runsTest(tr, $"o", $"x").collect().head
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((5L, 4L, 2L)),
      t.toString)
    val zTr = (2.0 - (2.0 * 5 * 4 / 9.0 + 1.0)) /
      math.sqrt(2.0 * 5 * 4 * (2.0 * 5 * 4 - 5 - 4) / (9.0 * 9.0 * 8.0))
    assert(t.getLong(3) == math.round(zTr * 1e6), t.toString)
    assert(t.getBoolean(4)) // |z| = 2.49 > 1.96
    // constant series: everything ties the median -> NULL verdict
    val cst = (1 to 6).map(i => (i.toLong, 7L)).toDF("o", "x")
    val c = TimeSeries.runsTest(cst, $"o", $"x").collect().head
    assert(c.getLong(0) == 0L && c.getLong(1) == 0L &&
      c.getLong(2) == 0L && c.isNullAt(3) && c.isNullAt(4), c.toString)
    // one-sided split (all but the median above it): NULL z too
    val oneSided = Seq((1L, 1L), (2L, 5L), (3L, 6L)).toDF("o", "x")
    val os = TimeSeries.runsTest(oneSided, $"o", $"x").collect().head
    assert(os.isNullAt(3), os.toString)
  }

  test("sarimaForecast: seasonal-diff fit matches arForecast; slot integration exact; guards") {
    // levels are seeded (100, 200, 300, 400) then x_i = x_{i-4} + d,
    // d cycling 10/20/30 — so the PERIOD-4 seasonal diffs are exactly
    // the arForecast test's period-3 cycle, and each forecast step h
    // integrates onto slot base x_{30+((h-1)%4)+1} plus the cumulative
    // diff forecasts of its own slot (steps 5, 6 reuse slots 1, 2)
    val d = (0 until 30).map(i => Seq(10L, 20L, 30L)(i % 3))
    val seeds = Seq(100L, 200L, 300L, 400L)
    val levels = (0 until 30).foldLeft(seeds)((acc, j) =>
      acc :+ (acc(j) + d(j))) // x_{j+5} = x_{j+1} + d_j (1-based)
    assert(levels.size == 34)
    val df = levels.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("o", "x")
    val got = TimeSeries.sarimaForecast(df, $"o", $"x", period = 4,
      p = 3, horizon = 6, lbLags = 6).collect()
    assert(got.length == 6)
    val ar = TimeSeries.arForecast(
        d.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
          .toDF("o", "x"), $"o", $"x", p = 3, horizon = 6, lbLags = 6)
      .collect()
    (got zip ar).foreach { case (g, a) =>
      assert(g.getLong(0) == a.getLong(0)) // step
      assert(g.getLong(2) == a.getLong(2) && g.getLong(3) == a.getLong(3)
        && g.getLong(4) == a.getLong(4)) // phi1..3 of the diff fit
      assert(g.getLong(5) == a.getLong(5),
        s"diff forecast ${g.getLong(5)} != AR ${a.getLong(5)}")
      assert(g.getLong(7) == a.getLong(6)) // lb_q
    }
    assert(got.head.getLong(1) == 34L) // n_obs counts LEVELS
    // integration: slot-partitioned exact cumulative addition
    val dHat = got.map(g => g.getLong(0) -> g.getLong(5)).toMap
    got.foreach { g =>
      val h = g.getLong(0)
      val slot = ((h - 1) % 4 + 1).toInt
      val base = levels(30 + slot - 1) * 1000000L
      val cum = (1L to h).filter(j => (j - 1) % 4 + 1 == slot)
        .map(dHat).sum
      assert(g.getLong(6) == base + cum,
        s"step $h: ${g.getLong(6)} != ${base + cum}")
    }
    // guards: period bound; series not longer than the period; a
    // seasonal base level past the 9e12 integration bound
    intercept[IllegalArgumentException] {
      TimeSeries.sarimaForecast(df, $"o", $"x", period = 1)
    }
    val short = (1 to 4).map(i => (i.toLong, i * 10L)).toDF("o", "x")
    val eShort = intercept[IllegalArgumentException] {
      TimeSeries.sarimaForecast(short, $"o", $"x", period = 4)
    }
    assert(eShort.getMessage.contains("seasonally difference"),
      eShort.getMessage)
    val big = levels.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1L, v + 9000000000001L) }.toDF("o", "x")
    val eBig = intercept[IllegalArgumentException] {
      TimeSeries.sarimaForecast(big, $"o", $"x", period = 4)
    }
    assert(eBig.getMessage.contains("overflow-safe"), eBig.getMessage)
  }

  test("modelSelect: seasonal integrated series picks sarima; counts and ratios consistent") {
    // the sarimaForecast fixture: levels repeat a period-4 seasonal
    // walk whose seasonal diffs are a clean period-3 cycle — the
    // seasonal-diff AR(3) fit is near-perfect while levels and first
    // diffs are not, so sarima must win the three-way pick
    val d = (0 until 30).map(i => Seq(10L, 20L, 30L)(i % 3))
    val seeds = Seq(100L, 200L, 300L, 400L)
    val levels = (0 until 30).foldLeft(seeds)((acc, j) =>
      acc :+ (acc(j) + d(j)))
    val df = levels.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("o", "x")
    val r = TimeSeries.modelSelect(df, $"o", $"x", p = 3, period = 4)
      .collect().head
    assert(r.getLong(0) == 34L && r.getLong(1) == 33L &&
      r.getLong(2) == 30L && r.getLong(3) == 3L && r.getLong(4) == 4L,
      r.toString)
    val (maeAr, maeArima, maeSarima) =
      (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(maeSarima < maeAr && maeSarima < maeArima, r.toString)
    assert(r.getString(10) == "sarima", r.toString)
    // ratios are the exact truncating divisions of the reported MAEs
    assert(r.getLong(8) ==
      (BigInt(maeArima) * 1000000 / maeAr).toLong, r.toString)
    assert(r.getLong(9) ==
      (BigInt(maeSarima) * 1000000 / maeAr).toLong, r.toString)
    intercept[IllegalArgumentException] {
      TimeSeries.modelSelect(df, $"o", $"x", p = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.modelSelect(df, $"o", $"x", period = 1)
    }
  }

  test("arimaVsAr: differencing wins on an integrated cycle; ratio exactly consistent") {
    // levels = running sum of the period-3 cycle: the DIFF series is
    // the pure cycle (AR(3) nails it), the level series trends (AR
    // regresses against the trend) — differencing must win, and the
    // reported ratio must be exactly mae_arima*1e6 div mae_ar
    val diffs = (0 until 30).map(i => Seq(10L, 20L, 30L)(i % 3))
    val levels = diffs.scanLeft(100L)(_ + _)
    val df = levels.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("o", "x")
    val r = TimeSeries.arimaVsAr(df, $"o", $"x", p = 3).collect().head
    assert(r.getLong(0) == 31L && r.getLong(1) == 30L && r.getLong(2) == 3L)
    val (maeAr, maeArima, mase) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(maeAr > 0L && maeArima > 0L)
    assert(mase == (BigInt(maeArima) * 1000000 / maeAr).toLong)
    assert(maeArima < maeAr && r.getBoolean(6),
      s"differencing must win on the integrated cycle: $maeArima vs $maeAr")
    intercept[IllegalArgumentException] {
      TimeSeries.arimaVsAr(df, $"o", $"x", p = 0)
    }
  }

  test("grangerLag1: lead-lag asymmetry, double-entry F, degenerate NULLs, short empty") {
    // y follows x with one period of lag plus i%2 noise — the x->y F
    // must dominate y->x; cross-check the winning F against an
    // independent BigInt/double reimplementation of the formula.
    val n = 40
    val xs = (0 until n).map(i => ((i * 7) % 5 + 1).toLong)
    val ys = (0 until n).map(i =>
      if (i == 0) 3L else xs(i - 1) * 3 + (i % 2))
    val df = xs.indices.map(i => (i.toLong, xs(i), ys(i)))
      .toDF("o", "x", "y")
    val got = TimeSeries.grangerLag1(df, "o", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toMap
    assert(got.keySet == Set("x_to_y", "y_to_x"))
    val fxy = got("x_to_y")._2
    val fyx = got("y_to_x")._2
    assert(got("x_to_y")._1 == (n - 1).toLong)
    assert(fxy > fyx, s"expected x->y ($fxy) to dominate y->x ($fyx)")
    assert(fxy > 10000000L, s"x->y F should be large, got $fxy")
    // double-entry: recompute F(x->y) from raw moments independently
    val rows = (1 until n).map(i => (ys(i), ys(i - 1), xs(i - 1)))
    val nn = BigInt(rows.size)
    def s(f: ((Long, Long, Long)) => Long) = BigInt(rows.map(f).sum)
    val (syt, sy1, sx1) = (s(_._1), s(_._2), s(_._3))
    val ctt = nn * s(r => r._1 * r._1) - syt * syt
    val ct1 = nn * s(r => r._1 * r._2) - syt * sy1
    val ct2 = nn * s(r => r._1 * r._3) - syt * sx1
    val c11 = nn * s(r => r._2 * r._2) - sy1 * sy1
    val c22 = nn * s(r => r._3 * r._3) - sx1 * sx1
    val c12 = nn * s(r => r._2 * r._3) - sy1 * sx1
    val det = c11 * c22 - c12 * c12
    val p = ctt * c11 - ct1 * ct1
    val q = ctt * det - (ct1 * ct1 * c22 - 2 * ct1 * ct2 * c12 +
      ct2 * ct2 * c11)
    val rssR = p.toDouble / c11.toDouble
    val rssF = q.toDouble / det.toDouble
    val expect = math.round(
      (nn.toLong - 3).toDouble * (rssR - rssF) / rssF * 1e6)
    assert(fxy == expect, s"engine $fxy vs double-entry $expect")
    // degenerate: constant series -> C11 = 0 -> NULL both directions
    val const = (0 until 20).map(i => (i.toLong, 5L, (i % 3).toLong))
      .toDF("o", "x", "y")
    val cg = TimeSeries.grangerLag1(const, "o", "x", "y").collect()
    assert(cg.length == 2 && cg.forall(_.isNullAt(2)))
    // short series (under 10 lagged rows) emits nothing
    val short = (0 until 9).map(i => (i.toLong, i.toLong, (i * 2).toLong))
      .toDF("o", "x", "y")
    assert(TimeSeries.grangerLag1(short, "o", "x", "y").count() == 0L)
  }

  test("modelSelectByKey: regimes select differently, MAEs equal the single-series member, ineligible keys drop") {
    val n = 120
    val rows = (1 to n).flatMap { i =>
      val il = i.toLong
      Seq(
        ("noise", il, (il * il * 761L + il * 37L) % 1000L),
        ("trend", il, il * 100L + (il / 2L) * 37L % 25L),
        ("season", il, (il % 12L) * 200L +
          (il * il * 761L + il * 37L) % 50L),
        ("flat", il, 5L),         // constant: zero variance, drops
        ("short", il, il))        // cut to 5 rows below: < 4 lag-3 pairs
    }
    val df = rows.toDF("k", "i", "x")
      .filter($"k" =!= "short" || $"i" <= 5)
    val got = TimeSeries.modelSelectByKey(df, $"k", $"i", $"x",
      maxPeriod = 24)
    val byKey = got.collect().map(r => r.getString(0) -> r).toMap
    assert(byKey.keySet == Set("noise", "trend", "season"), byKey.keySet)
    assert(byKey("noise").getAs[String]("best_model") == "ar",
      byKey("noise").toString)
    assert(byKey("trend").getAs[String]("best_model") == "arima",
      byKey("trend").toString)
    assert(byKey("season").getAs[String]("best_model") == "sarima",
      byKey("season").toString)
    // the measured dominant period of the 12-cycle is a multiple of 12
    val per = byKey("season").getAs[Long]("period")
    assert(per % 12L == 0L, s"period $per")
    // EXACT agreement with the graded single-series member at the
    // measured period — same quantized acf, same Durbin–Levinson
    // order, same integer residual algebra
    val one = df.filter($"k" === "season")
    val single = TimeSeries.modelSelect(one, $"i", $"x", p = 3,
      period = per.toInt).head()
    Seq("mae_ar_micros", "mae_arima_micros", "mae_sarima_micros",
        "mase_arima_ppm", "mase_sarima_ppm").foreach { c =>
      assert(single.getAs[Long](c) == byKey("season").getAs[Long](c),
        s"$c: single=${single.getAs[Long](c)} " +
          s"keyed=${byKey("season").getAs[Long](c)}")
    }
    assert(single.getAs[String]("best_model") ==
      byKey("season").getAs[String]("best_model"))
    // the overflow pre-flight refuses loudly
    val big = Seq(("k", 1L, 4000000000L), ("k", 2L, 4000000000L),
      ("k", 3L, 4000000000L)).toDF("k", "i", "x")
      .crossJoin(spark.range(40).select())
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.modelSelectByKey(big, $"k", $"i", $"x")
    }
    assert(ex.getMessage.contains("7e10"), ex.getMessage)
  }
}
