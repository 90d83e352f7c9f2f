package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular event times onto a
  * fixed grid (gap rows included) and carry observations forward —
  * the missing half of the temporal toolkit next to as-of joins
  * ([[AsOf]]) and interval joins ([[IntervalJoin]]). Irregular →
  * regular is what turns an event log into model-ready series
  * (features at fixed cadence, dashboards with explicit gaps).
  *
  * Scale: per-key min/max is one partial-aggregated pass; the grid
  * explodes one row per (key, step) — the OUTPUT size, nothing
  * quadratic; the value join is an equi-join on (key, bucket); the
  * forward fill is one window shuffle on the key. No driver-side
  * state, no global sort. Grid cardinality is the caller's contract:
  * a key spanning years at 1-second steps is a deliberate 10⁷-row
  * series, so [[resample]] guards with `maxStepsPerKey` (fail loudly,
  * like IntervalJoin's fan-out cap).
  */
object TimeSeries {

  /** Forward fill: replace NULLs in `valueCols` with the key's most
    * recent non-null value in `orderCol` order. One window, one
    * shuffle on `keyCol`. */
  def fillForward(df: DataFrame, keyCol: String, orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Linear interpolation: replace NULLs in `valueCol` with the
    * straight-line value between the key's PREVIOUS and NEXT non-null
    * observations in `orderCol` order (the gap-filling a sensor /
    * metrics series wants when carry-forward would bias downstream
    * aggregates). Boundary semantics: a NULL before the first or
    * after the last observation has only one neighbor — it takes that
    * neighbor's value (flat extrapolation; stays NULL only if the key
    * has no observations at all).
    *
    * Scale: two window passes over one `keyCol` shuffle (previous
    * non-null value+position, next non-null value+position), then a
    * row-local lerp — deterministic IEEE arithmetic, so the DuckDB
    * oracle replays it bit-exactly (`ts_interpolate`). `orderCol`
    * must be numeric or timestamp (cast to long internally for the
    * position axis). */
  def interpolateLinear(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val pos = col(orderCol).cast("timestamp").cast("long")
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(pos)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(pos)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val vPrev = last(col(valueCol), ignoreNulls = true).over(wPrev)
    val pPrev = last(when(col(valueCol).isNotNull, pos),
      ignoreNulls = true).over(wPrev)
    val vNext = first(col(valueCol), ignoreNulls = true).over(wNext)
    val pNext = first(when(col(valueCol).isNotNull, pos),
      ignoreNulls = true).over(wNext)
    val lerp = vPrev + (vNext - vPrev) *
      ((pos - pPrev).cast("double") / (pNext - pPrev).cast("double"))
    df.withColumn(s"${valueCol}_interp",
      when(col(valueCol).isNotNull, col(valueCol).cast("double"))
        .when(vPrev.isNotNull && vNext.isNotNull && pNext =!= pPrev, lerp)
        .when(vPrev.isNotNull, vPrev.cast("double"))
        .otherwise(vNext.cast("double")))
  }

  /** Resample each key's series onto a fixed `stepSeconds` grid from
    * its first to its last observation: one row per (key, bucket),
    * `aggs` evaluated over the observations inside each bucket, gap
    * buckets present with NULL aggregates (forward-fill afterwards
    * with [[fillForward]] if carry-forward semantics are wanted).
    * `bucket_ts` is the grid instant (bucket start, UTC epoch
    * arithmetic — same convention as IntervalJoin's buckets).
    *
    * `aggs` are standard aggregate Columns evaluated per (key,
    * bucket), e.g. `avg($"value").as("v")` — alias every agg. */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      stepSeconds: Long, aggs: Seq[Column],
      maxStepsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0 (got $stepSeconds)")
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    val sec = col(tsCol).cast("timestamp").cast("long")
    val b = floor(sec / stepSeconds).cast("long")
    // observations aggregated into their bucket
    val perBucket = df.withColumn("__b", b)
      .groupBy(col(keyCol), col("__b"))
      .agg(aggs.head, aggs.tail: _*)
    // per-key grid, gap buckets included; loud failure on absurd grids
    val spans = df.withColumn("__b", b)
      .groupBy(col(keyCol))
      .agg(min(col("__b")).as("__b0"), max(col("__b")).as("__b1"))
    val guarded = when(col("__b1") - col("__b0") >= lit(maxStepsPerKey),
        raise_error(concat(
          lit(s"TimeSeries.resample: a key spans >= $maxStepsPerKey steps of " +
            s"${stepSeconds}s — raise stepSeconds or split the series (key="),
          col(keyCol).cast("string"), lit(")"))))
      .otherwise(col("__b1"))
    val grid = spans
      .withColumn("__b", explode(sequence(col("__b0"), guarded)))
      .select(col(keyCol), col("__b"))
    grid.join(perBucket, Seq(keyCol, "__b"), "left")
      .withColumn("bucket_ts",
        (col("__b") * stepSeconds).cast("timestamp"))
      .drop("__b")
  }

  /** Rolling z-score anomaly tagging: for each row, mean/stddev over
    * the TRAILING `windowSize`-row frame per key (current row
    * excluded — an anomaly must not dilute its own baseline), flag
    * |x - μ| > `threshold`·σ. Rows whose trailing window has fewer
    * than `minPoints` observations or zero variance report
    * `is_anomaly = false` (no baseline, no verdict — a cold start
    * never pages anyone).
    *
    * One keyed shuffle + sort (the window); everything else is
    * row-local. ROWS framing (not RANGE) keeps the frame O(1) per row
    * regardless of event clustering, so a hot key costs
    * windowSize adds per row, not a quadratic re-scan. */
  def zscoreAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSize: Int = 20, threshold: Double = 3.0,
      minPoints: Int = 5): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2 (got $windowSize)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(valueCol))
      .rowsBetween(-windowSize, -1)
    val mu = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    val np = count(col(valueCol)).over(w)
    df.withColumn("baseline_mean", mu)
      .withColumn("baseline_std", sd)
      .withColumn("n_baseline", np)
      .withColumn("is_anomaly",
        when(col("n_baseline") < minPoints, lit(false))
          .when(col("baseline_std").isNull || col("baseline_std") <= 0,
            lit(false))
          .otherwise(
            abs(col(valueCol) - col("baseline_mean")) >
              col("baseline_std") * threshold))
  }

  /** Seasonality profile — per calendar-bucket load factors (the
    * capacity-planning / alerting-baseline table: "is 3am traffic
    * really 0.2× average?"): bucket every event by hour-of-day,
    * day-of-week or month, report exact counts and `load_ppm` =
    * `n · nBuckets · 10⁶ div total` (10⁶ = exactly average load; the
    * complete grid includes silent buckets — a missing 4am row reads
    * as no-data, a 0-count row reads as dead air). Integer-exact
    * throughout. DOW uses SPARK's convention (1 = Sunday) — an oracle
    * must adapt its own (DuckDB counts 0 = Sunday). One row-scale
    * hash-agg to the grid. */
  def seasonalityProfile(df: DataFrame, tsExpr: Column,
      unit: String = "hour"): DataFrame = {
    val (bucketExpr, lo, n) = unit match {
      case "hour" => (hour(tsExpr), 0L, 24L)
      case "dow" => (dayofweek(tsExpr), 1L, 7L)
      case "month" => (month(tsExpr), 1L, 12L)
      case other => throw new IllegalArgumentException(
        s"unit must be hour|dow|month (got $other)")
    }
    val counts = df.select(bucketExpr.cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(lo, lo + n)
      .select(col("id").as("bucket"))
    val total = counts.agg(sum(col("n")).as("__t"))
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(total)) // 1-row total
      .select(col("bucket"), col("n").cast("bigint").as("n"),
        expr(s"CAST(n AS DECIMAL(38,0)) * $n * 1000000 div __t")
          .cast("long").as("load_ppm"))
      .orderBy(col("bucket"))
  }
}
