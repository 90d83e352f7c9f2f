package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular-ML feature encoders (the step between curation and
  * training that the events/orders pipelines feed). North-star
  * addition; the reference's feature work stops at percentile
  * bucketing (README.md:236-261 — see [[Percentiles]]).
  */
object Features {

  /** K-fold OUT-OF-FOLD target encoding — the mean-target categorical
    * encoder with the leakage control that makes it valid: a row's
    * encoding is the (smoothed) mean of the target over OTHER folds'
    * rows of its category, so no row's own target leaks into its own
    * feature (the classic target-encoding failure mode: a
    * high-cardinality category memorizes its labels and the model
    * "learns" the training targets).
    *
    * `enc = (cat_sum - fold_sum + smoothing · global_mean)
    *        / (cat_n - fold_n + smoothing)`,
    * falling back to the global mean when the out-of-fold slice is
    * empty (single-fold categories) and always when the denominator
    * is zero. With `smoothing > 0` rare categories shrink toward the
    * global mean (additive/m-estimate smoothing).
    *
    * ENGINE-PORTABILITY CONTRACT: `targetExpr` must be integral
    * (cast your metric to cents/micros first) and `foldExpr` a pure
    * integer function of the row (e.g. `pmod(id, k)`) — then every
    * sum/count is an exact integer, the encoding is one IEEE
    * division tree over exact integers, and an oracle replays it
    * value-for-value. A double target would make the fold sums
    * order-dependent.
    *
    * Scale shape: one (key, fold) hash-agg — k·|categories| rows —
    * re-aggregated to per-key totals, then two UNHINTED joins back to
    * the rows and a 1-row global broadcast. The joins are deliberately
    * unhinted (the [[Percentiles.bucketByJoin]] posture): target
    * encoding's motivating regime is HIGH-cardinality categoricals,
    * where a forced `broadcast(byKeyFold)` of k·|categories| rows
    * would OOM the driver exactly when the operator matters most —
    * Catalyst's size estimate (plus AQE at runtime) broadcasts while
    * the dimension is small and degrades to sort-merge past the
    * threshold, where the fact table shuffles once per join key. */
  def targetEncodeOof(df: DataFrame, keyCol: String, foldExpr: Column,
      targetExpr: Column, smoothing: Long = 0L): DataFrame = {
    require(smoothing >= 0L, s"smoothing must be >= 0 (got $smoothing)")
    val withCols = df.withColumn("__t", targetExpr.cast("long"))
      .withColumn("__f", foldExpr.cast("int"))
    val byKeyFold = withCols.groupBy(col(keyCol), col("__f"))
      .agg(sum(col("__t")).as("__fs"), count(lit(1)).as("__fn"))
    val byKey = byKeyFold.groupBy(col(keyCol))
      .agg(sum(col("__fs")).as("__ks"), sum(col("__fn")).as("__kn"))
    val global = withCols.agg(sum(col("__t")).as("__gs"),
      count(lit(1)).as("__gn"))
    val gMean = col("__gs").cast("double") / col("__gn").cast("double")
    val denom = col("__kn") - col("__fn") + lit(smoothing)
    val enc = when(denom > 0L,
      ((col("__ks") - col("__fs")).cast("double") +
        lit(smoothing).cast("double") * gMean) / denom.cast("double"))
      .otherwise(gMean)
    withCols
      .join(byKeyFold, Seq(keyCol, "__f"))
      .join(byKey, Seq(keyCol))
      .crossJoin(broadcast(global)) // 1-row corpus total
      .withColumn("target_enc", enc)
      .drop("__t", "__f", "__fs", "__fn", "__ks", "__kn", "__gs", "__gn")
  }

  /** Per-group OLS regression — slope/intercept of y on x for EVERY
    * group in one aggregate pass (per-entity trends: price drift per
    * segment, usage slope per cohort; a driver-side model fit per
    * group would be the anti-pattern). Same integral contract and
    * DECIMAL moment discipline as [[cuped]]: x and y must be integral
    * (days, cents), the five moments are exact integers, and slope
    * (one IEEE division) feeds intercept UNROUNDED
    * (`(Σy − slope·Σx)/n` — round only at the edges), so both
    * micro-quantized outputs replay. Zero-variance groups (constant
    * x) are excluded — no slope exists. Returns
    * (group, n, slope_micros, intercept_micros). */
  def groupRegression(df: DataFrame, groupCol: String, xExpr: Column,
      yExpr: Column): DataFrame = {
    val withCols = df.select(col(groupCol),
        xExpr.cast("long").as("__x"), yExpr.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val m = withCols.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"),
      sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"))
    val varNum = (col("__n").cast("decimal(38,0)") * col("__sxx") -
      col("__sx") * col("__sx"))
    val covNum = (col("__n").cast("decimal(38,0)") * col("__sxy") -
      col("__sx") * col("__sy"))
    m.filter(varNum > 0)
      .withColumn("__slope", covNum.cast("double") / varNum.cast("double"))
      .select(col(groupCol), col("__n").cast("bigint").as("n"),
        round(col("__slope") * 1e6).cast("long").as("slope_micros"),
        round((col("__sy").cast("double") -
          col("__slope") * col("__sx").cast("double")) /
          col("__n").cast("double") * 1e6).cast("long")
          .as("intercept_micros"))
  }

  /** Post-stratified treatment-effect estimate — the variance
    * reduction that needs NO pre-period (CUPED's requirement): when
    * a categorical covariate (country, platform, user tier) predicts
    * the metric, reweighting per-arm stratum means by the POOLED
    * stratum shares removes the noise from accidental stratum
    * imbalance between arms: `est_arm = Σ_s w_s·m̄_{s,arm}` with
    * `w_s = n_s/n`. Reported next to the naive difference — on a
    * perfectly balanced assignment the two agree, and the gap IS the
    * imbalance correction.
    *
    * Exactness: per-(stratum, arm) exact integer (n, Σy); stratum
    * means quantize by truncating division; the weighted combination
    * `Σ n_s·m̄_s div n` stays integer (weights applied as counts, ONE
    * final division — no float shares). Strata missing an arm drop
    * from BOTH estimates (no mean exists to reweight; the naive
    * estimate is restated over the same covered strata so the
    * comparison is apples-to-apples). Returns one row.
    *
    * Scale: one row-scale hash-agg to (stratum, arm) cells; stratum-
    * scale arithmetic after. Nothing else shuffles. */
  def postStratifiedDiff(df: DataFrame, stratumExpr: Column,
      treatmentExpr: Column, metricExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(stratumExpr.as("__s"), treatmentExpr.as("__t"),
        metricExpr.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(col("__t"), col("__y")).otherwise(0L).cast(dec))
          .as("__st"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(!col("__t"), col("__y")).otherwise(0L).cast(dec))
          .as("__sc"))
      .filter(col("__nt") > 0L && col("__nc") > 0L)
    cells
      .agg(sum(col("__nt") + col("__nc")).as("n"),
        sum(col("__nt")).as("__tn"), sum(col("__nc")).as("__cn"),
        sum(col("__st")).as("__ts"), sum(col("__sc")).as("__cs"),
        sum((col("__nt") + col("__nc")).cast(dec) *
          expr("__st * 1000000 div __nt")).as("__wt"),
        sum((col("__nt") + col("__nc")).cast(dec) *
          expr("__sc * 1000000 div __nc")).as("__wc"))
      .filter(col("n") > 0L)
      .select(col("n").cast("bigint").as("n"),
        expr("CAST(__ts * 1000000 div __tn AS BIGINT)")
          .as("naive_t_micros"),
        expr("CAST(__cs * 1000000 div __cn AS BIGINT)")
          .as("naive_c_micros"),
        expr("CAST(__ts * 1000000 div __tn - __cs * 1000000 div __cn " +
          "AS BIGINT)").as("naive_diff_micros"),
        expr("CAST(__wt div n AS BIGINT)").as("poststrat_t_micros"),
        expr("CAST(__wc div n AS BIGINT)").as("poststrat_c_micros"),
        expr("CAST(__wt div n - __wc div n AS BIGINT)")
          .as("poststrat_diff_micros"))
  }

  /** Split-conformal prediction intervals per group — the
    * distribution-free calibration step for ANY point predictor
    * (OLS, isotonic, a black-box model): on a held-out CALIBRATION
    * split, take the `k = ⌈(n_cal+1)(1−α)⌉`-th smallest absolute
    * residual as the interval radius; then `ŷ ± radius` covers the
    * truth with probability ≥ 1−α on exchangeable data — a GUARANTEE,
    * not a hope (Vovk; Lei et al. 2018). The test split's empirical
    * coverage is reported next to it as the sanity check.
    *
    * Exactness: residuals are exact longs; `k` is an integer ceiling
    * (`((n_cal+1)·(10⁶−α) + 10⁶−1) div 10⁶`); the radius is the k-th
    * ORDER STATISTIC (row_number over (residual, tie) — the value at
    * rank k is a multiset property, tie order cannot change it);
    * coverage is one truncating ppm division. Groups where
    * k > n_cal emit nothing (the finite-sample guarantee needs an
    * infinite interval there — a result row would lie).
    *
    * Scale: one row-scale pass computes residuals and splits; the
    * rank window partitions by GROUP (high-cardinality groups
    * parallelize; per-group calibration rows must fit a partition —
    * the percentile-family contract); everything after is
    * group-scale. Returns (keys..., n_cal, n_test, k, radius,
    * coverage_ppm). */
  def conformalInterval(df: DataFrame, keyCols: Seq[String],
      yExpr: Column, yhatExpr: Column, calibExpr: Column,
      alphaMicros: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(alphaMicros > 0L && alphaMicros < 1000000L,
      s"alphaMicros must be in (0, 1e6) (got $alphaMicros)")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keyCols.map(col) ++ Seq(
        abs(yExpr.cast("long") - yhatExpr.cast("long")).as("__r"),
        calibExpr.as("__cal")): _*)
      .filter(col("__r").isNotNull && col("__cal").isNotNull)
    val sizes = base.groupBy(keyCols.map(col): _*)
      .agg(sum(when(col("__cal"), 1L).otherwise(0L)).as("n_cal"),
        sum(when(!col("__cal"), 1L).otherwise(0L)).as("n_test"))
      .withColumn("k_cal", expr(
        s"((n_cal + 1) * ${1000000L - alphaMicros} + 999999) " +
          "div 1000000"))
      .filter(col("k_cal") <= col("n_cal") && col("n_test") > 0L)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__r"))
    val radius = base.filter(col("__cal"))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .join(sizes, keyCols)
      .filter(col("__rank") === col("k_cal"))
      .select(keyCols.map(col) ++ Seq(col("n_cal"), col("n_test"),
        col("k_cal"), col("__r").as("radius")): _*)
    base.filter(!col("__cal"))
      .join(radius, keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(first(col("n_cal")).cast("bigint").as("n_cal"),
        first(col("n_test")).cast("bigint").as("n_test"),
        first(col("k_cal")).cast("bigint").as("k_cal"),
        first(col("radius")).cast("bigint").as("radius"),
        sum(when(col("__r") <= col("radius"), 1L).otherwise(0L))
          .as("__cov"))
      .select(keyCols.map(col) ++ Seq(col("n_cal"), col("n_test"),
        col("k_cal"), col("radius"),
        expr("CAST(__cov AS DECIMAL(38,0)) * 1000000 div n_test")
          .cast("bigint").as("coverage_ppm")): _*)
  }

  /** Two-proportion z-test + sample-ratio-mismatch check — the A/B
    * readout that pairs with [[cuped]] (CUPED shrinks the variance;
    * this tests the binary metric): pooled-variance z for
    * `p_t − p_c`, plus the SRM statistic `(n_t − n_c)²/(n_t + n_c)`
    * (χ², 1 dof against a 50/50 split — the assignment-health check
    * every experimentation platform runs BEFORE reading the metric;
    * > ~3.84 ⇒ the split itself is broken and the z-test is moot).
    *
    * Exactness: four exact integer counts → micro-quantized results
    * through mirrored IEEE trees (one sqrt, engine-identical); the
    * SRM numerator widens to DECIMAL before squaring via the split
    * `(d/√n)·(d/√n)`-free form `(d·d)/n` kept in DECIMAL (d² ≤ n² —
    * no overflow below 10¹⁹ rows per arm). Degenerate inputs (an
    * empty arm, or pooled p ∈ {0, 1} — zero variance) return empty.
    * Scale: ONE aggregate over the unit table; nothing shuffles. */
  def twoProportionZTest(df: DataFrame, treatmentExpr: Column,
      successExpr: Column): DataFrame = {
    val c = df.select(treatmentExpr.as("__t"), successExpr.as("__s"))
      .filter(col("__t").isNotNull && col("__s").isNotNull)
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t") && col("__s"), 1L).otherwise(0L)).as("s_t"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("__t") && col("__s"), 1L).otherwise(0L)).as("s_c"))
    val pt = col("s_t").cast("double") / col("n_t").cast("double")
    val pc = col("s_c").cast("double") / col("n_c").cast("double")
    val pp = (col("s_t") + col("s_c")).cast("double") /
      (col("n_t") + col("n_c")).cast("double")
    val z = (pt - pc) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_t").cast("double") +
        lit(1.0) / col("n_c").cast("double")))
    val d = (col("n_t") - col("n_c")).cast("decimal(38,0)")
    c.filter(col("n_t") > 0L && col("n_c") > 0L &&
        col("s_t") + col("s_c") > 0L &&
        col("s_t") + col("s_c") < col("n_t") + col("n_c"))
      .select(col("n_t").cast("bigint").as("n_t"),
        col("s_t").cast("bigint").as("s_t"),
        col("n_c").cast("bigint").as("n_c"),
        col("s_c").cast("bigint").as("s_c"),
        round(z * 1e6).cast("long").as("z_micros"),
        round((d * d).cast("double") /
          (col("n_t") + col("n_c")).cast("double") * 1e6)
          .cast("long").as("srm_chi2_micros"))
  }

  /** Welch's unequal-variance t-test — the continuous-metric A/B
    * readout next to [[twoProportionZTest]]'s binary one (Welch, not
    * Student: arm variances are never equal in practice and the
    * pooled test silently miscalibrates): per-arm exact integer
    * moments (the [[cuped]] integral contract — cents in, nothing
    * accumulates as a double), then mean, sample variance
    * `(n·SS − S²)/(n·(n−1))`, the t statistic and the
    * Welch–Satterthwaite degrees of freedom through one mirrored
    * IEEE tree each, micro-quantized. Returns one row (n_t, n_c,
    * mean_t_micros, mean_c_micros, t_micros, df_micros); degenerate
    * inputs (an arm with < 2 units, or both variances zero) return
    * empty. ONE aggregate pass; nothing shuffles. */
  def welchTTest(df: DataFrame, treatmentExpr: Column,
      metricExpr: Column): DataFrame = {
    val c = df.select(treatmentExpr.as("__t"),
        metricExpr.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        // cast INSIDE the sum: a long accumulator would overflow at
        // petabyte row counts before the cast ever ran
        sum(when(col("__t"), col("__y")).otherwise(0L)
          .cast("decimal(38,0)")).as("__st"),
        sum(when(col("__t"),
          col("__y").cast("decimal(38,0)") * col("__y")).otherwise(
          lit(0).cast("decimal(38,0)"))).as("__sst"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)
          .cast("decimal(38,0)")).as("__sc"),
        sum(when(!col("__t"),
          col("__y").cast("decimal(38,0)") * col("__y")).otherwise(
          lit(0).cast("decimal(38,0)"))).as("__ssc"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def variance(n: Column, s: Column, ss: Column) =
      (n.cast("decimal(38,0)") * ss - s * s).cast("double") /
        (n.cast("decimal(38,0)") * (n - 1)).cast("double")
    val vt = variance(col("n_t"), col("__st"), col("__sst"))
    val vc = variance(col("n_c"), col("__sc"), col("__ssc"))
    val se2t = vt / col("n_t").cast("double")
    val se2c = vc / col("n_c").cast("double")
    val t = (mean(col("__st"), col("n_t")) - mean(col("__sc"), col("n_c"))) /
      sqrt(se2t + se2c)
    val dfW = (se2t + se2c) * (se2t + se2c) /
      (se2t * se2t / (col("n_t").cast("double") - 1.0) +
        se2c * se2c / (col("n_c").cast("double") - 1.0))
    c.filter(col("n_t") > 1L && col("n_c") > 1L)
      .withColumn("__se2", se2t + se2c)
      .filter(col("__se2") > 0.0)
      .select(col("n_t").cast("bigint").as("n_t"),
        col("n_c").cast("bigint").as("n_c"),
        round(mean(col("__st"), col("n_t")) * 1e6).cast("long")
          .as("mean_t_micros"),
        round(mean(col("__sc"), col("n_c")) * 1e6).cast("long")
          .as("mean_c_micros"),
        round(t * 1e6).cast("long").as("t_micros"),
        round(dfW * 1e6).cast("long").as("df_micros"))
  }

  /** Power analysis / minimum-detectable-effect table — the question
    * that comes BEFORE every test in the kit (z, t, CUPED, DiD,
    * jackknife, sequential): is this experiment even big enough?
    * From the unit-level baseline metric, for each target relative
    * effect `e` (ppm of the baseline mean): the required per-arm
    * sample size `n_req = ⌈2σ²(z_{α/2}+z_β)²/δ²⌉` with `δ = e·mean`,
    * and the minimum detectable effect at the CURRENT size
    * `mde = (z_{α/2}+z_β)·√(2σ²/n)` — both at the standard
    * α = 0.05 two-sided, power = 0.80 (z constants 1.959964 and
    * 0.841621, shared literals both engines fold identically).
    *
    * Exactness: n/Σy/Σy² are exact integers (DECIMAL before summing);
    * mean, σ² and the closed forms are ONE mirrored IEEE tree;
    * outputs micro-quantize (`ceil` for n_req — a fractional unit
    * rounds UP, you cannot run 0.4 of a user). Zero-variance or
    * zero-mean baselines emit nothing (no effect is detectable or
    * the relative grid is undefined), not NaN.
    *
    * Scale: ONE aggregate over the unit table, cross-joined with the
    * effect grid (a handful of literal rows). Nothing shuffles. */
  def powerAnalysis(df: DataFrame, metricExpr: Column,
      effectsPpm: Seq[Long]): DataFrame = {
    require(effectsPpm.nonEmpty && effectsPpm.forall(_ > 0),
      s"effectsPpm must be non-empty positive (got $effectsPpm)")
    val dec = "decimal(38,0)"
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(metricExpr.cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast(dec)).as("__s"),
        sum(col("__y").cast(dec) * col("__y")).as("__ss"))
      .filter(col("n") > 1L)
    val m = col("__s").cast("double") / col("n").cast("double")
    val v = (col("n").cast(dec) * col("__ss") - col("__s") * col("__s"))
      .cast("double") /
      (col("n").cast(dec) * (col("n") - 1)).cast("double")
    val z = lit(1.959964) + lit(0.841621)
    val delta = col("__m") * col("effect_ppm").cast("double") / lit(1e6)
    base.withColumn("__m", m).withColumn("__v", v)
      .filter(col("__v") > 0.0 && col("__m") =!= 0.0)
      .crossJoin(effectsPpm.toDF("effect_ppm"))
      .select(col("effect_ppm"),
        col("n").cast("bigint").as("n_current"),
        round(col("__m") * 1e6).cast("long").as("mean_micros"),
        round(sqrt(col("__v")) * 1e6).cast("long").as("sd_micros"),
        ceil(lit(2.0) * col("__v") * (z * z) / (delta * delta))
          .cast("bigint").as("n_required"),
        round(z * sqrt(lit(2.0) * col("__v") / col("n").cast("double"))
          * 1e6).cast("long").as("mde_micros"))
  }

  /** Always-valid sequential inference — the mixture sequential
    * probability ratio test (mSPRT, Robbins 1970; Johari et al. 2017
    * "Peeking at A/B tests") over a LOOK SCHEDULE: the fixed-horizon
    * z/t tests ([[twoProportionZ]]/[[welchTTest]]) are only valid at
    * ONE pre-registered n, but every real dashboard is peeked at
    * daily — the mSPRT's always-valid p-value can be monitored
    * continuously and still caps the type-I error at α. Per look k
    * (cumulative through that look), with mean difference `d` and
    * its Welch variance `v`, the normal-mixture likelihood ratio is
    * `Λ = sqrt(v/(v+τ²))·exp(d²τ²/(2v(v+τ²)))`; the always-valid
    * p-value is the RUNNING MIN of `min(1, 1/Λ)` — once rejected,
    * always rejected (the decision is monotone by construction).
    *
    * Exactness: per-look counts/sums/square-sums are exact integers
    * (DECIMAL before summing, the [[welchTTest]] discipline) folded
    * by ONE cumulative window; `1/Λ` is a single mirrored IEEE tree
    * on those integers (`sqrt((v+τ²)/v)·exp(−d²τ²/(2v(v+τ²)))` —
    * written reciprocal-free), p quantizes to micros and the running
    * min + rejection threshold compare as LONGS — the verdict
    * sequence is a pure function of the integer look aggregates.
    * `tau` is the mixture sd in METRIC UNITS (a plain literal both
    * engines embed verbatim). Looks where either arm has < 2
    * observations, or the variance is 0, emit nothing (no test is
    * defined yet); the running min starts at the first testable look.
    *
    * Scale: one row-scale hash-agg to per-look cells — the only
    * row-scale pass; the cumulative window runs over the LOOK
    * schedule (tens of rows — a look table is not row-scale data,
    * and the loud `maxLooks` pre-flight refuses one that is).
    * Returns one row per testable look: (look, n_a, n_b, d_micros,
    * p_micros, p_av_micros, rejected). */
  def sequentialMsprt(df: DataFrame, lookExpr: Column,
      treatmentExpr: Column, metricExpr: Column, tau: Double,
      alphaMicros: Long = 50000L, maxLooks: Long = 100000L): DataFrame = {
    require(tau > 0.0, s"tau must be > 0 (got $tau)")
    require(alphaMicros > 0L && alphaMicros <= 1000000L,
      s"alphaMicros must be in (0, 1e6] (got $alphaMicros)")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    def cell(p: Column, suffix: String): Seq[Column] = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"__n$suffix"),
      sum(when(p, col("__y")).otherwise(0L).cast(dec)).as(s"__s$suffix"),
      sum(when(p, col("__y").cast(dec) * col("__y"))
        .otherwise(lit(0).cast(dec))).as(s"__ss$suffix"))
    val cells = cell(col("__t"), "a") ++ cell(!col("__t"), "b")
    val byLookFull = df.select(lookExpr.as("look"),
        treatmentExpr.as("__t"), metricExpr.cast("long").as("__y"))
      .filter(col("look").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("look"))
      .agg(cells.head, cells.tail: _*)
    val nLooks = byLookFull.count()
    require(nLooks <= maxLooks,
      s"schedule holds $nLooks looks (cap $maxLooks) — a look table " +
        "this large is row-scale data, not a monitoring schedule; " +
        "coarsen lookExpr")
    val w = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byLookFull
      .withColumn("n_a", sum(col("__na")).over(w))
      .withColumn("__csa", sum(col("__sa")).over(w))
      .withColumn("__cssa", sum(col("__ssa")).over(w))
      .withColumn("n_b", sum(col("__nb")).over(w))
      .withColumn("__csb", sum(col("__sb")).over(w))
      .withColumn("__cssb", sum(col("__ssb")).over(w))
      .filter(col("n_a") > 1L && col("n_b") > 1L)
    def variance(n: Column, s: Column, ss: Column) =
      (n.cast(dec) * ss - s * s).cast("double") /
        (n.cast(dec) * (n - 1)).cast("double")
    val vA = variance(col("n_a"), col("__csa"), col("__cssa"))
    val vB = variance(col("n_b"), col("__csb"), col("__cssb"))
    val v = vA / col("n_a").cast("double") + vB / col("n_b").cast("double")
    val d = col("__csa").cast("double") / col("n_a").cast("double") -
      col("__csb").cast("double") / col("n_b").cast("double")
    val t2 = lit(tau * tau)
    val lamInv = sqrt((col("__v") + t2) / col("__v")) *
      exp(-(col("__d") * col("__d") * t2) /
        (lit(2.0) * col("__v") * (col("__v") + t2)))
    val wMin = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum.withColumn("__v", v).withColumn("__d", d)
      .filter(col("__v") > 0.0)
      .withColumn("p_micros",
        round(least(lit(1.0), lamInv) * 1e6).cast("long"))
      .withColumn("p_av_micros", min(col("p_micros")).over(wMin))
      .select(col("look"), col("n_a").cast("bigint").as("n_a"),
        col("n_b").cast("bigint").as("n_b"),
        round(col("__d") * 1e6).cast("long").as("d_micros"),
        col("p_micros"), col("p_av_micros"),
        (col("p_av_micros") <= alphaMicros).as("rejected"))
  }

  /** Difference-in-differences estimator — the quasi-experimental
    * readout when assignment wasn't randomized but a PRE period
    * exists: `DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)`
    * nets out both the stable group gap and the common time shock,
    * leaving the treatment effect under the parallel-trends
    * assumption (the launch-readout workhorse for staged rollouts,
    * holdout regions, policy changes).
    *
    * Exactness: one aggregate computes all four cells' exact integer
    * (n, Σy, Σy²); each cell mean quantizes by truncating division
    * `Σy·10⁶ div n` (metric long-cast, non-negative by contract) and
    * `did_micros` is their exact integer combination; the inferential
    * tail (per-cell sample variance, `se = √Σ varᵢ/nᵢ`,
    * `t = DiD/se`) is one mirrored IEEE tree, micro-quantized.
    * Returns one row (four ns, four cell means, did_micros,
    * se_micros, t_micros); any cell with < 2 rows or a zero SE
    * returns empty (no inference is possible), not NaN.
    *
    * Scale: ONE aggregate over the unit table; nothing shuffles. */
  def didEstimate(df: DataFrame, treatedExpr: Column, postExpr: Column,
      metricExpr: Column): DataFrame = {
    val base = df.select(treatedExpr.as("__t"), postExpr.as("__p"),
        metricExpr.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__p").isNotNull &&
        col("__y").isNotNull)
    def cell(name: String, t: Boolean, p: Boolean): Seq[Column] = {
      val in = col("__t") === t && col("__p") === p
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$name"),
        // promote BEFORE aggregating (matching the __ss path): a
        // LongType sum can silently wrap under non-ANSI where the
        // oracle's HUGEINT sum does not.
        sum(when(in, col("__y").cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as(s"__s_$name"),
        sum(when(in, col("__y").cast("decimal(38,0)") * col("__y"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as(s"__ss_$name"))
    }
    val aggs = cell("t1", t = true, p = true) ++
      cell("t0", t = true, p = false) ++
      cell("c1", t = false, p = true) ++
      cell("c0", t = false, p = false)
    val c = base.agg(aggs.head, aggs.tail: _*)
    def meanMic(n: String) =
      expr(s"__s_$n * 1000000 div nullif(n_$n, 0)")
    def m(n: String) =
      col(s"__s_$n").cast("double") / col(s"n_$n").cast("double")
    def v(n: String) =
      (col(s"n_$n").cast("decimal(38,0)") * col(s"__ss_$n") -
        col(s"__s_$n") * col(s"__s_$n")).cast("double") /
        (col(s"n_$n").cast("decimal(38,0)") * (col(s"n_$n") - 1))
          .cast("double")
    val se = sqrt(v("t1") / col("n_t1").cast("double") +
      v("t0") / col("n_t0").cast("double") +
      v("c1") / col("n_c1").cast("double") +
      v("c0") / col("n_c0").cast("double"))
    val didD = (m("t1") - m("t0")) - (m("c1") - m("c0"))
    c.filter(col("n_t1") > 1L && col("n_t0") > 1L &&
        col("n_c1") > 1L && col("n_c0") > 1L)
      .withColumn("__se", se)
      .filter(col("__se") > 0.0)
      .select(col("n_t1").cast("bigint").as("n_t1"),
        col("n_t0").cast("bigint").as("n_t0"),
        col("n_c1").cast("bigint").as("n_c1"),
        col("n_c0").cast("bigint").as("n_c0"),
        meanMic("t1").as("mean_t1_micros"),
        meanMic("t0").as("mean_t0_micros"),
        meanMic("c1").as("mean_c1_micros"),
        meanMic("c0").as("mean_c0_micros"),
        (meanMic("t1") - meanMic("t0") - meanMic("c1") + meanMic("c0"))
          .as("did_micros"),
        round(col("__se") * 1e6).cast("long").as("se_micros"),
        round(didD / col("__se") * 1e6).cast("long").as("t_micros"))
  }

  /** Delete-one-bucket jackknife confidence interval for a RATIO
    * metric `Σ numerator / Σ denominator` with CLUSTERED units — the
    * inference the z/t tests can't give: revenue-per-event style
    * ratios have correlated rows within a user, so the naive SE is
    * wrong; bucketing units and recomputing the ratio with each
    * bucket deleted estimates the sampling variance without any
    * per-row independence assumption (the standard experimentation-
    * platform CI, and the deterministic sibling of the Poisson
    * bootstrap — same leave-out algebra, no RNG).
    *
    * Exactness — integer until the one sqrt: bucket `g = unit mod B`
    * (pmod, non-negative); per-bucket exact integer sums; each
    * leave-one-out ratio quantizes by TRUNCATING division
    * `(S−s_g)·10⁶ div (N−n_g)` (all non-negative, both engines
    * truncate); the jackknife variance is the cross-multiplied
    * integer `V = (B−1)·(B·Σr² − (Σr)²)` in DECIMAL(38,0) —
    * non-negative by Cauchy–Schwarz — and `se = sqrt(V)/B` is the
    * single double step (sqrt agrees on identical inputs). CI =
    * ratio ± 1959964·se div 10⁶ (z₀.₉₇₅ in micros, integer). Returns
    * one row (n_buckets, num_total, den_total, ratio_micros,
    * se_micros, ci_lo_micros, ci_hi_micros); fewer than 2 usable
    * buckets returns empty (no variance is estimable), not NaN.
    *
    * Scale: one row-scale hash-agg to B buckets, a 1-row broadcast
    * total, bucket-scale leave-out arithmetic — the corpus is read
    * once and nothing row-scale shuffles; B bounds every later stage
    * regardless of input size. */
  def jackknifeRatioCI(df: DataFrame, unitExpr: Column,
      numerExpr: Column, denomExpr: Column,
      nBuckets: Int = 50): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100000,
      s"nBuckets must be in [2, 100000] (got $nBuckets)")
    val b = df.select(
        pmod(unitExpr.cast("long"), lit(nBuckets.toLong)).as("g"),
        numerExpr.cast("long").as("__x"),
        denomExpr.cast("long").as("__d"))
      .groupBy(col("g"))
      .agg(sum(col("__x")).as("s"), sum(col("__d")).as("n"))
    val t = b.agg(sum(col("s")).cast("decimal(38,0)").as("__ss"),
      sum(col("n")).cast("decimal(38,0)").as("__nn"))
    val r = b.crossJoin(broadcast(t)) // 1-row totals
      .select(expr(
        "(__ss - s) * 1000000 div nullif(__nn - n, 0)").as("r"))
    val a = r.filter(col("r").isNotNull)
      .agg(count(lit(1)).as("nb"),
        sum(col("r").cast("decimal(38,0)")).as("sr"),
        sum(col("r").cast("decimal(38,0)") *
          col("r").cast("decimal(38,0)")).as("srr"))
    val v = ((col("nb") - 1L).cast("decimal(38,0)") *
      (col("nb").cast("decimal(38,0)") * col("srr") -
        col("sr") * col("sr")))
    val se = round(sqrt(v.cast("double")) /
      col("nb").cast("double")).cast("long")
    a.crossJoin(broadcast(t))
      .filter(col("nb") >= 2L && col("__nn") > 0)
      .withColumn("ratio_micros",
        expr("__ss * 1000000 div nullif(__nn, 0)"))
      .withColumn("se_micros", se)
      .withColumn("__half",
        expr("CAST(1959964 AS DECIMAL(38,0)) * se_micros div 1000000"))
      .select(col("nb").cast("bigint").as("n_buckets"),
        col("__ss").cast("bigint").as("num_total"),
        col("__nn").cast("bigint").as("den_total"),
        col("ratio_micros"), col("se_micros"),
        (col("ratio_micros") - col("__half")).as("ci_lo_micros"),
        (col("ratio_micros") + col("__half")).as("ci_hi_micros"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM'13 —
    * *Improving the Sensitivity of Online Controlled Experiments*):
    * adjust each unit's metric by its pre-experiment covariate,
    * `y_adj = y - θ · (x - x̄)` with `θ = cov(x, y) / var(x)` — the
    * regression adjustment that removes the covariate-explained
    * variance from an A/B metric (the workhorse of every large
    * experimentation platform; typical sensitivity gains 30-50% when
    * x is the same metric pre-period). The adjusted mean is unchanged
    * (E[y_adj] = E[y]); only the variance shrinks.
    *
    * θ from exact integer moments: with the same integral contract
    * as [[targetEncodeOof]] (cast metrics to cents first), Sx, Sy,
    * Sxy, Sxx and n are exact integers and
    * `θ = (n·Sxy - Sx·Sy) / (n·Sxx - Sx²)` is one division of
    * DECIMAL-widened products — an oracle replays θ and every
    * adjusted value bit-for-bit. Zero-variance covariates get θ = 0
    * (no adjustment), not a NaN. Adds (`theta`, `y_adj`).
    *
    * Scale: ONE aggregate over the unit table (5 exact sums → 1-row
    * broadcast) + a row-local projection; nothing shuffles. */
  def cuped(df: DataFrame, metricExpr: Column,
      covariateExpr: Column): DataFrame = {
    val withCols = df.withColumn("__y", metricExpr.cast("long"))
      .withColumn("__x", covariateExpr.cast("long"))
    val moments = withCols.agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum((col("__x").cast("decimal(38,0)") * col("__y"))).as("__sxy"),
      sum((col("__x").cast("decimal(38,0)") * col("__x"))).as("__sxx"))
    val varNum = (col("__n").cast("decimal(38,0)") * col("__sxx") -
      col("__sx") * col("__sx"))
    val covNum = (col("__n").cast("decimal(38,0)") * col("__sxy") -
      col("__sx") * col("__sy"))
    val theta = when(varNum > 0,
      covNum.cast("double") / varNum.cast("double")).otherwise(0.0)
    val xBar = col("__sx").cast("double") / col("__n").cast("double")
    withCols.crossJoin(broadcast(moments)) // 1-row moment vector
      .withColumn("theta", theta)
      .withColumn("y_adj", col("__y").cast("double") -
        col("theta") * (col("__x").cast("double") - xBar))
      .drop("__x", "__y", "__n", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** Two-covariate [[cuped]] — regression adjustment with a PAIR of
    * pre-period covariates (pre-period spend AND pre-period
    * activity): one covariate leaves correlated variance on the
    * table that the second removes, and running cuped twice
    * sequentially is NOT the joint answer (the covariates correlate
    * with each other). θ = (XᵀX)⁻¹Xᵀy on centered covariates,
    * solved by Cramer's rule on the 2×2.
    *
    * Replay discipline: the centered moments multiply through by n —
    * `A₁₁ = n·Σx₁² − (Σx₁)²` etc. are DECIMAL-exact integers (the
    * cuped convention); the determinant and both θ's are mirrored
    * IEEE trees over casts of those exact integers (the A·A products
    * can pass 38 digits, so the algebra deliberately moves to DOUBLE
    * at the cast edge — deterministic on both engines); a singular
    * or collinear Gram matrix (det ≤ 0) falls back to θ = (0, 0) —
    * no adjustment is a statement, not an error. Appends (theta1,
    * theta2, y_adj) to every row:
    * `y_adj = y − θ₁(x₁−x̄₁) − θ₂(x₂−x̄₂)`, left-associated.
    *
    * Scale: one map-side-combined moment aggregate broadcast back —
    * the cuped shape, nine sums instead of four. */
  def cupedMulti(df: DataFrame, metricExpr: Column,
      cov1Expr: Column, cov2Expr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val withCols = df.withColumn("__y", metricExpr.cast("long"))
      .withColumn("__x1", cov1Expr.cast("long"))
      .withColumn("__x2", cov2Expr.cast("long"))
    val m = withCols.agg(
      count(lit(1)).as("__n"),
      sum(col("__x1").cast(dec)).as("__s1"),
      sum(col("__x2").cast(dec)).as("__s2"),
      sum(col("__y").cast(dec)).as("__sy"),
      sum(col("__x1").cast(dec) * col("__x1")).as("__s11"),
      sum(col("__x2").cast(dec) * col("__x2")).as("__s22"),
      sum(col("__x1").cast(dec) * col("__x2")).as("__s12"),
      sum(col("__x1").cast(dec) * col("__y")).as("__s1y"),
      sum(col("__x2").cast(dec) * col("__y")).as("__s2y"))
    val nD = col("__n").cast(dec)
    val a11 = (nD * col("__s11") - col("__s1") * col("__s1"))
      .cast("double")
    val a22 = (nD * col("__s22") - col("__s2") * col("__s2"))
      .cast("double")
    val a12 = (nD * col("__s12") - col("__s1") * col("__s2"))
      .cast("double")
    val b1 = (nD * col("__s1y") - col("__s1") * col("__sy"))
      .cast("double")
    val b2 = (nD * col("__s2y") - col("__s2") * col("__sy"))
      .cast("double")
    val det = a11 * a22 - a12 * a12
    val t1 = when(det > 0.0, (b1 * a22 - b2 * a12) / det).otherwise(0.0)
    val t2 = when(det > 0.0, (b2 * a11 - b1 * a12) / det).otherwise(0.0)
    val xb1 = col("__s1").cast("double") / col("__n").cast("double")
    val xb2 = col("__s2").cast("double") / col("__n").cast("double")
    withCols.crossJoin(broadcast(m)) // 1-row moment vector
      .withColumn("theta1", t1)
      .withColumn("theta2", t2)
      .withColumn("y_adj",
        col("__y").cast("double") -
          col("theta1") * (col("__x1").cast("double") - xb1) -
          col("theta2") * (col("__x2").cast("double") - xb2))
      .drop("__x1", "__x2", "__y", "__n", "__s1", "__s2", "__sy",
        "__s11", "__s22", "__s12", "__s1y", "__s2y")
  }

  /** Exponentially time-decayed activity score — the recency-weighted
    * engagement feature (each event's score = its value plus the
    * half-life-decayed score so far: `S = v + 2^(−Δt/halfLife)·S_prev`)
    * that a plain windowed sum can't express (the decay factor depends
    * on the per-step gap). Emits one row per event with the score
    * AFTER folding that event, in exact micro-units at the output
    * edge.
    *
    * Replay discipline: the fold is the IEEE tree
    * `v + exp(−(Δseconds·ln2/halfLife))·S` evaluated in (ts, event_id)
    * order with ln 2 as the LITERAL 0.6931471805599453 — a recursive
    * CTE mirroring the same token order reproduces every double
    * bit-for-bit (`exp` agrees between engines on identical inputs —
    * the feat_target_encode convention). The fold ORDER uses the
    * FULL-PRECISION timestamp (epoch micros) — timestamps carry
    * microseconds, and an oracle's `ORDER BY ts` is sub-second-aware,
    * so ordering by truncated seconds would silently diverge when two
    * same-key events share a second; only the decay DELTA truncates
    * to whole seconds (the documented `Δseconds` contract). One key
    * shuffle + per-group ordered fold (genuine sequential recurrence,
    * the EWMA posture: group = one user's bounded history). */
  def decayedScore(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String,
      halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds > 0,
      s"halfLifeSeconds must be > 0 (got $halfLifeSeconds)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("tm"),
        col(tsCol).cast("timestamp").cast("long").as("t"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val evs = it.toSeq.sortBy(r => (r._2, r._4))
        var s = 0.0
        var prevT = 0L
        var first = true
        evs.iterator.map { case (_, _, t, id, v) =>
          s = if (first) { first = false; v }
            else v + math.exp(-((t - prevT).toDouble *
              0.6931471805599453 / halfLifeSeconds)) * s
          prevT = t
          (k, id, math.round(s * 1e6))
        }
      }
      .toDF(keyCol, idCol, "score_micros")
  }

  /** Isotonic (PAVA) calibration — fit the best monotone
    * non-decreasing step function from an integer score to a
    * non-negative label mean (probability calibration for ranking
    * scores, dose-response monotone fits): pool-adjacent-violators
    * over the per-score aggregates, one output row per pooled block
    * with (`score_lo`, `score_hi`, `n`, `sum_labels`,
    * `mean_ppm` = sum·10⁶ div n).
    *
    * Exactness: the input first reduces to DISTINCT-SCORE aggregates
    * (one row-scale hash-agg — the only row-scale pass), and every
    * pooling decision is the cross-multiplied integer comparison
    * `pos_prev·n_cur > pos_cur·n_prev` — no doubles anywhere, so the
    * fit is a pure function of the counts; PAVA's result is the
    * unique isotonic L2 fit regardless of merge order. No SQL engine
    * replays the pooling loop, hence gate-plus-raw grading
    * (`feat_isotonic_gate`: block means strictly increasing, exact
    * conservation of n and Σlabels, block cover of the score range).
    *
    * Scale: per-group fold over its distinct scores
    * (`maxDistinctScores` pre-flight, loud — integer scores are
    * bucketed by contract; a million-point calibration curve is a
    * different problem). */
  def isotonicCalibrate(df: DataFrame, groupCol: String,
      scoreExpr: Column, labelExpr: Column,
      maxDistinctScores: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = df.select(col(groupCol).cast("string").as("g"),
        scoreExpr.cast("long").as("s"), labelExpr.cast("long").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val worst = agg.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect()
    val worstN = if (worst.isEmpty || worst.head.isNullAt(0)) 0L
      else worst.head.getLong(0)
    require(worstN <= maxDistinctScores,
      s"a group holds $worstN distinct scores (cap $maxDistinctScores) " +
        "— bucket the score first; a calibration curve is score-scale " +
        "by contract")
    agg.as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        final case class Blk(lo: Long, hi: Long, n: Long, pos: Long)
        val pts = it.toSeq.sortBy(_._2)
        val stack = scala.collection.mutable.ArrayBuffer.empty[Blk]
        pts.foreach { case (_, s, n, pos) =>
          var cur = Blk(s, s, n, pos)
          // violation: previous mean > current mean, cross-multiplied
          // (BigInt: petabyte-scale counts would overflow a long
          // product; the loop is score-scale so the cost is nil)
          while (stack.nonEmpty &&
            BigInt(stack.last.pos) * cur.n > BigInt(cur.pos) * stack.last.n) {
            val p = stack.remove(stack.length - 1)
            cur = Blk(p.lo, cur.hi, p.n + cur.n, p.pos + cur.pos)
          }
          stack += cur
        }
        stack.iterator.zipWithIndex.map { case (b, i) =>
          (g, i.toLong, b.lo, b.hi, b.n, b.pos,
            (BigInt(b.pos) * 1000000L / b.n).toLong)
        }
      }
      .toDF(groupCol, "block", "score_lo", "score_hi", "n",
        "sum_labels", "mean_ppm")
      .orderBy(col(groupCol), col("block"))
  }

  /** One-way ANOVA F — the parametric k-group mean comparison next
    * to [[graft.operators.OrderedStats.kruskalWallis]] (ranks test
    * stochastic dominance; this tests MEANS, the quantity a revenue
    * decision is actually about): does at least one of k groups have
    * a different mean? `F = (SSB/(k−1)) / (SSW/(N−k))`.
    *
    * Exactness: one pass accumulates exact DECIMAL moments
    * (n_g, Σx, Σx²) per group; the between/within sums of squares
    * are milli-scaled exact integers via the per-group truncating
    * division `A = Σ_g (1000·S_g²) div n_g` (order-free sum — the
    * kruskalWallis device), `SSB_milli = A − (1000·S²) div N`,
    * `SSW_milli = 1000·ΣΣx² − A`; F is ONE IEEE division of exact
    * integers, micro-quantized. The upper-tail p uses the Paulson
    * (1942) normal approximation
    * `z = ((1 − 2/(9d₂))·∛F − (1 − 2/(9d₁))) /
    * √((2/(9d₂))·∛F² + 2/(9d₁))` — cube roots as `exp(ln/3)`, the
    * mirrored tree both engines replay bit-for-bit, through the
    * shared [[Quality.pValueTwoSidedZ]] polynomial. Truncation can
    * leave SSB_milli ≤ 0 when the group means coincide — that
    * reports F = 0, p = 1 (the correct verdict, not an error).
    * Degenerate inputs (k < 2, N ≤ k, or zero within-group variance)
    * return empty. Returns one row
    * (n, n_groups, f_micros, p_micros).
    *
    * Scale: the moments are one map-side-combined hash-agg to k
    * rows; everything after is group-scale. DECIMAL(38) bounds the
    * exact path at `1000·S_g² < 10³⁸` (|x| ≤ 10⁹ cents and
    * n_g ≲ 10⁸ — a significance test's sample, not a corpus). */
  def anovaF(df: DataFrame, groupExpr: Column, valueExpr: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val perGroup = df.select(groupExpr.cast("string").as("g"),
        valueExpr.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("__ng"),
        sum(col("x").cast(dec)).as("__sg"),
        sum(col("x").cast(dec) * col("x")).as("__qg"))
    // Quality.decimalDivTrunc, NOT SQL `div`: these quotients
    // (1000·Σx² scale) overflow a long at modest group sizes and
    // IntegralDivide wraps silently there
    val agg = perGroup
      .select(col("__ng"), col("__sg"), col("__qg"),
        Quality.decimalDivTrunc(
          col("__sg") * col("__sg") * lit(1000),
          col("__ng").cast(dec)).as("__ag"))
      .agg(sum(col("__ng")).as("__n"), count(lit(1)).as("__k"),
        sum(col("__sg")).as("__s"), sum(col("__qg")).as("__q"),
        sum(col("__ag")).as("__a"))
      .filter(col("__k") >= 2L && col("__n") > col("__k"))
      .withColumn("__ssb", col("__a") - Quality.decimalDivTrunc(
        col("__s") * col("__s") * lit(1000), col("__n").cast(dec)))
      .withColumn("__ssw", expr("__q * 1000 - __a"))
      .filter(col("__ssw") > 0)
    val d1 = (col("__k") - 1L).cast("double")
    val d2 = (col("__n") - col("__k")).cast("double")
    val f = when(col("__ssb") > 0,
        (col("__ssb").cast("double") * d2) /
          (col("__ssw").cast("double") * d1))
      .otherwise(lit(0.0))
    val cbrtF = exp(log(f) / lit(3.0))
    val zp = ((lit(1.0) - lit(2.0) / (lit(9.0) * d2)) * cbrtF -
      (lit(1.0) - lit(2.0) / (lit(9.0) * d1))) /
      sqrt((lit(2.0) / (lit(9.0) * d2)) * cbrtF * cbrtF +
        lit(2.0) / (lit(9.0) * d1))
    val p2 = Quality.pValueTwoSidedZ(zp)
    agg.withColumn("__f", f)
      .withColumn("__p",
        when(col("__f") <= 0.0, lit(1.0))
          .when(zp >= 0.0, p2 / 2.0)
          .otherwise(lit(1.0) - p2 / 2.0))
      .select(col("__n").cast("bigint").as("n"),
        col("__k").cast("bigint").as("n_groups"),
        round(col("__f") * 1e6).cast("long").as("f_micros"),
        round(col("__p") * 1e6).cast("long").as("p_micros"))
  }

  /** Calibration reliability table + expected calibration error —
    * the probability-quality reading next to [[isotonicCalibrate]]
    * (isotonic FIXES miscalibration; this MEASURES it): bin the
    * predicted probability into `bins` equal-width bins and compare,
    * per bin, the mean predicted probability against the observed
    * positive rate. A model can have perfect AUC and still lie about
    * its probabilities — this is the table that says so, and
    * `ece_micros = Σ_b n_b·|obs_b − pred_b| / N` (the standard
    * expected calibration error) is its one-number summary, repeated
    * on every row so a single scan reads both.
    *
    * Exactness: predictions arrive as integer MICROS (the caller
    * quantizes — a probability pipeline that can't state its scores
    * to 10⁻⁶ has bigger problems); bins are the integer division
    * `min(p_micros·bins div 10⁶, bins−1)`; per-bin means are
    * truncating ppm divisions of exact sums; the ECE folds the
    * per-bin integer micros with one final truncating division by N.
    * Out-of-range predictions (outside [0, 10⁶]) are refused loudly —
    * they are bugs, not data. Returns per-bin rows
    * (bin, n, mean_pred_micros, frac_pos_micros, gap_micros,
    * ece_micros); empty bins are absent.
    *
    * Scale: one row-scale hash-agg to ≤ bins rows; the ECE window
    * runs over the bin grid, never the row stream. */
  def calibrationTable(df: DataFrame, predMicrosExpr: Column,
      labelExpr: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000,
      s"bins must be in [2, 10000] (got $bins)")
    val base = df.select(predMicrosExpr.cast("long").as("__p"),
        labelExpr.as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .withColumn("__p",
        when(col("__p") < 0L || col("__p") > 1000000L,
          raise_error(concat(lit("calibrationTable: prediction " +
            "outside [0, 1e6] micros — quantize upstream (value="),
            col("__p").cast("string"), lit(")"))))
        .otherwise(col("__p")))
      .withColumn("bin",
        least(expr(s"__p * $bins div 1000000"), lit(bins - 1L))
          .cast("int"))
    val perBin = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p").cast("decimal(38,0)")).as("__sp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
      .withColumn("mean_pred_micros",
        expr("CAST(__sp div n AS BIGINT)"))
      .withColumn("frac_pos_micros",
        expr("CAST(__pos AS DECIMAL(38,0)) * 1000000 div n")
          .cast("long"))
      .withColumn("gap_micros",
        col("frac_pos_micros") - col("mean_pred_micros"))
    // bin-grid window (<= bins rows), never the row stream
    perBin
      .withColumn("ece_micros", expr(
        "CAST(sum(CAST(n AS DECIMAL(38,0)) * abs(gap_micros)) OVER () " +
          "div sum(CAST(n AS DECIMAL(38,0))) OVER () AS BIGINT)"))
      .select(col("bin"), col("n").cast("bigint").as("n"),
        col("mean_pred_micros"), col("frac_pos_micros"),
        col("gap_micros"), col("ece_micros"))
      .orderBy(col("bin"))
  }

  /** Brier score with the Murphy reliability/resolution/uncertainty
    * decomposition — the one-number probability-quality summary next
    * to [[calibrationTable]]'s per-bin view: `BS = mean (p − y)²`
    * (exact, unbinned), and on the BINNED forecast the classic
    * `REL − RES + UNC` reading — REL (calibration error to drive to
    * 0), RES (sharpness to drive UP), UNC (the base-rate floor no
    * model can beat). The decomposition is computed on bin means, as
    * Murphy (1973) defines it; it reproduces `bs_micros` exactly
    * only when forecasts within a bin are identical — the
    * within-bin spread is the (documented) gap, not an error.
    *
    * Exactness: NO doubles anywhere — `(p − y·10⁶)²` per row is an
    * exact integer summed per bin in DECIMAL; bin means are
    * truncating micro divisions; each component is one final
    * truncating division by `N·10⁶`. Out-of-range predictions are
    * refused loudly. Returns one row (n, bs_micros,
    * reliability_micros, resolution_micros, uncertainty_micros);
    * empty input returns empty.
    *
    * Scale: one row-scale hash-agg to ≤ bins rows; everything after
    * is bin-grid-scale. */
  def brierDecomposition(df: DataFrame, predMicrosExpr: Column,
      labelExpr: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000,
      s"bins must be in [2, 10000] (got $bins)")
    val dec = "decimal(38,0)"
    val base = df.select(predMicrosExpr.cast("long").as("__p"),
        labelExpr.as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .withColumn("__p",
        when(col("__p") < 0L || col("__p") > 1000000L,
          raise_error(concat(lit("brierDecomposition: prediction " +
            "outside [0, 1e6] micros — quantize upstream (value="),
            col("__p").cast("string"), lit(")"))))
        .otherwise(col("__p")))
      .withColumn("__bin",
        least(expr(s"__p * $bins div 1000000"), lit(bins - 1L)))
      .withColumn("__e",
        col("__p") - when(col("__y"), 1000000L).otherwise(0L))
    val perBin = base.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__p").cast(dec)).as("__sp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(col("__e").cast(dec) * col("__e")).as("__sq"))
      .withColumn("__conf", expr("CAST(__sp div __nb AS BIGINT)"))
      .withColumn("__acc",
        expr("CAST(CAST(__pos AS DECIMAL(38,0)) * 1000000 div __nb" +
          " AS BIGINT)"))
    val tot = perBin.agg(sum(col("__nb")).as("__n"),
      sum(col("__pos")).as("__tpos"))
    perBin.crossJoin(broadcast(tot)) // 1-row totals over the bin grid
      .withColumn("__base",
        expr("CAST(CAST(__tpos AS DECIMAL(38,0)) * 1000000 div __n" +
          " AS BIGINT)"))
      .groupBy(col("__n"), col("__base"))
      .agg(sum(col("__sq")).as("__bs"),
        sum(col("__nb").cast(dec) * (col("__conf") - col("__acc")) *
          (col("__conf") - col("__acc"))).as("__rel"),
        sum(col("__nb").cast(dec) * (col("__acc") - col("__base")) *
          (col("__acc") - col("__base"))).as("__res"))
      .select(col("__n").cast("bigint").as("n"),
        expr("CAST(__bs div (CAST(__n AS DECIMAL(38,0)) * 1000000)" +
          " AS BIGINT)").as("bs_micros"),
        expr("CAST(__rel div (CAST(__n AS DECIMAL(38,0)) * 1000000)" +
          " AS BIGINT)").as("reliability_micros"),
        expr("CAST(__res div (CAST(__n AS DECIMAL(38,0)) * 1000000)" +
          " AS BIGINT)").as("resolution_micros"),
        expr("CAST((CAST(__base AS DECIMAL(38,0)) * (1000000 - __base))" +
          " div 1000000 AS BIGINT)").as("uncertainty_micros"))
  }

  /** McNemar's test on PAIRED binary outcomes — the within-subject
    * A/B readout ([[twoProportionZTest]] compares two independent
    * groups; this compares the SAME units under two conditions,
    * where only the DISCORDANT pairs carry information): with
    * `b` = yes→no and `c` = no→yes counts, the continuity-corrected
    * `χ² = (max(|b−c|−1, 0))² / (b+c)` against χ²₁.
    *
    * Exactness: b and c are exact integers from one hash-agg;
    * `chi2_micros` is the cross-multiplied truncating division
    * `((|b−c|−1)²·10⁶) div (b+c)` (clamped at 0 when the discordants
    * balance — the correction must not manufacture signal from
    * b = c); the p-value is the mirrored tree
    * `p = pValueTwoSidedZ(√χ²)` (the χ²₁ upper tail IS the two-sided
    * normal tail of its square root). No discordant pairs → empty
    * (the test is undefined, not "p = 1"). Returns one row
    * (n_pairs, b, c, chi2_micros, p_micros).
    *
    * Scale: one map-side-combined aggregate over the pair stream —
    * nothing after is row-scale. */
  def mcNemar(df: DataFrame, yesAExpr: Column, yesBExpr: Column)
      : DataFrame = {
    val agg = df.select(yesAExpr.cast("boolean").as("__a"),
        yesBExpr.cast("boolean").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("c"))
      .filter(col("b") + col("c") > 0L)
      .withColumn("__num", greatest(abs(col("b") - col("c")) - 1L,
        lit(0L)))
    val chi2 = (col("__num") * col("__num")).cast("double") /
      (col("b") + col("c")).cast("double")
    agg.withColumn("__chi2", chi2)
      .select(col("n_pairs").cast("bigint").as("n_pairs"),
        col("b").cast("bigint").as("b"), col("c").cast("bigint").as("c"),
        expr("CAST((CAST(__num AS DECIMAL(38,0)) * __num * 1000000)" +
          " div (b + c) AS BIGINT)").as("chi2_micros"),
        round(Quality.pValueTwoSidedZ(sqrt(col("__chi2"))) * 1e6)
          .cast("long").as("p_micros"))
  }

  /** Cochran–Mantel–Haenszel test — the STRATIFIED 2×2 association
    * test next to [[postStratifiedDiff]] (post-stratification
    * adjusts the estimate; CMH tests the common association while a
    * confounder is held fixed per stratum — the Simpson's-paradox
    * guard): per stratum, compare the treated-positive cell `a`
    * against its hypergeometric expectation `E = n₁m₁/n` and
    * variance `V = n₁n₀m₁m₀/(n²(n−1))`, then
    * `z = (Σa − ΣE)/√ΣV` (CMH χ² = z², 1 dof).
    *
    * Exactness: the four margins per stratum are exact integers from
    * one hash-agg; E and V are the pico-scaled truncating divisions
    * `(n₁·m₁·10¹²) div n` and
    * `(n₁·n₀·m₁·m₀·10¹²) div (n²·(n−1))` — exact DECIMAL integers
    * via [[Quality.decimalDivTrunc]], order-free sums (the
    * [[Survival.logRank]] algebra on strata instead of event
    * times); z is ONE mirrored IEEE tree through the shared
    * polynomial. Single-subject strata contribute nothing to V by
    * definition; zero total variance → empty. Returns one row
    * (n, n_strata, a_total, e_total_micros, z_micros, p_micros).
    *
    * Scale: one row-scale hash-agg to the strata table; everything
    * after is strata-scale. */
  def cmhTest(df: DataFrame, stratumExpr: Column, treatExpr: Column,
      outcomeExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val perStratum = df.select(stratumExpr.cast("string").as("__s"),
        treatExpr.cast("boolean").as("__t"),
        outcomeExpr.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("n"))
    val terms = perStratum
      .select(col("a"), col("n"),
        Quality.decimalDivTrunc(
          col("n1").cast(dec) * col("m1") * lit(1000000000000L),
          col("n").cast(dec)).as("__e"),
        when(col("n") > 1L, Quality.decimalDivTrunc(
          col("n1").cast(dec) * (col("n") - col("n1")) * col("m1") *
            (col("n") - col("m1")) * lit(1000000000000L),
          col("n").cast(dec) * col("n") * (col("n") - 1L)))
          .otherwise(lit(0).cast(dec)).as("__v"))
    val agg = terms.agg(sum(col("n")).as("__n"),
        count(lit(1)).as("__k"), sum(col("a")).as("__a"),
        sum(col("__e")).as("__ep"), sum(col("__v")).as("__vp"))
      .filter(col("__vp") > 0)
    val z = (col("__a").cast(dec) * lit(1000000000000L) - col("__ep"))
      .cast("double") / (lit(1e6) * sqrt(col("__vp").cast("double")))
    agg.withColumn("__z", z)
      .select(col("__n").cast("bigint").as("n"),
        col("__k").cast("bigint").as("n_strata"),
        col("__a").cast("bigint").as("a_total"),
        expr("CAST(__ep div 1000000 AS BIGINT)").as("e_total_micros"),
        round(col("__z") * 1e6).cast("long").as("z_micros"),
        round(Quality.pValueTwoSidedZ(col("__z")) * 1e6).cast("long")
          .as("p_micros"))
  }

  /** Delta-method test for RATIO metrics (revenue per session,
    * clicks per view) — the closed form next to [[jackknifeRatioCI]]'s
    * resampling answer: a ratio of sums is NOT a mean of ratios, and
    * naive per-unit averaging biases both the estimate and its
    * variance; the delta method linearizes `R = Σx/Σy` around the
    * means, `Var(R) ≈ (σ²_x − 2Rσ_xy + R²σ²_y)/(n·ȳ²)`, and the two
    * arms compare on `z = (R_t − R_c)/√(se²_t + se²_c)`.
    *
    * Exactness: per arm the six moments (n, Σx, Σy, Σx², Σy², Σxy)
    * are exact DECIMAL integers in ONE aggregate; every downstream
    * quantity is a mirrored IEEE tree through the shared
    * [[Quality.pValueTwoSidedZ]] polynomial. Degenerate inputs (an
    * arm with n < 2 or Σy = 0, or zero combined variance) return
    * empty. Returns one row (n_t, n_c, ratio_t_micros,
    * ratio_c_micros, z_micros, p_micros).
    *
    * Scale: ONE map-side-combined aggregate over the unit table. */
  def deltaMethodRatio(df: DataFrame, treatmentExpr: Column,
      numExpr: Column, denExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    def side(p: String, t: Column) = Seq(
      sum(when(t, 1L).otherwise(0L)).as(s"n_$p"),
      sum(when(t, col("__x")).otherwise(0L).cast(dec)).as(s"__sx_$p"),
      sum(when(t, col("__y")).otherwise(0L).cast(dec)).as(s"__sy_$p"),
      sum(when(t, col("__x").cast(dec) * col("__x"))
        .otherwise(lit(0).cast(dec))).as(s"__qx_$p"),
      sum(when(t, col("__y").cast(dec) * col("__y"))
        .otherwise(lit(0).cast(dec))).as(s"__qy_$p"),
      sum(when(t, col("__x").cast(dec) * col("__y"))
        .otherwise(lit(0).cast(dec))).as(s"__xy_$p"))
    val base = df.select(treatmentExpr.as("__t"),
        numExpr.cast("long").as("__x"), denExpr.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val aggs = side("t", col("__t")) ++ side("c", !col("__t"))
    val m = base.agg(aggs.head, aggs.tail: _*)
    def se2(p: String): Column = {
      val n = col(s"n_$p").cast("double")
      val r = col(s"__sx_$p").cast("double") /
        col(s"__sy_$p").cast("double")
      val nn = col(s"n_$p").cast(dec)
      val vx = (nn * col(s"__qx_$p") - col(s"__sx_$p") * col(s"__sx_$p"))
        .cast("double") / (nn * (col(s"n_$p") - 1L)).cast("double")
      val vy = (nn * col(s"__qy_$p") - col(s"__sy_$p") * col(s"__sy_$p"))
        .cast("double") / (nn * (col(s"n_$p") - 1L)).cast("double")
      val cxy = (nn * col(s"__xy_$p") - col(s"__sx_$p") * col(s"__sy_$p"))
        .cast("double") / (nn * (col(s"n_$p") - 1L)).cast("double")
      val ybar = col(s"__sy_$p").cast("double") / n
      (vx - lit(2.0) * r * cxy + r * r * vy) / (n * ybar * ybar)
    }
    def ratio(p: String) = col(s"__sx_$p").cast("double") /
      col(s"__sy_$p").cast("double")
    val z = (ratio("t") - ratio("c")) / sqrt(se2("t") + se2("c"))
    m.filter(col("n_t") > 1L && col("n_c") > 1L &&
        col("__sy_t") =!= 0 && col("__sy_c") =!= 0)
      .withColumn("__se2", se2("t") + se2("c"))
      .filter(col("__se2") > 0.0)
      .withColumn("__z", z)
      .select(col("n_t").cast("bigint").as("n_t"),
        col("n_c").cast("bigint").as("n_c"),
        round(ratio("t") * 1e6).cast("long").as("ratio_t_micros"),
        round(ratio("c") * 1e6).cast("long").as("ratio_c_micros"),
        round(col("__z") * 1e6).cast("long").as("z_micros"),
        round(Quality.pValueTwoSidedZ(col("__z")) * 1e6).cast("long")
          .as("p_micros"))
  }

  /** TOST equivalence test (two one-sided tests) — the question
    * [[welchTTest]] cannot answer: "are these arms the SAME, up to a
    * margin we don't care about?" (failing to reject a difference is
    * NOT evidence of equivalence; TOST rejects both "worse than −δ"
    * and "better than +δ", so a pass is a positive statement — the
    * test behind ship-if-not-worse decisions and A/A checks):
    * `t_L = (Δ + δ)/se`, `t_U = (δ − Δ)/se` on the Welch standard
    * error, `p = max` of the two one-sided tails; equivalent iff
    * p < α.
    *
    * Exactness: per-arm exact DECIMAL moments (the welch contract);
    * Δ, se, both t's and both one-sided tails are mirrored IEEE
    * trees through the shared [[Quality.pValueTwoSidedZ]] polynomial
    * (large-sample normal read, the rank tests' stance); the verdict
    * compares the unrounded p against α — both engines branch on
    * identical doubles. Degenerate arms (n < 2 or zero combined
    * variance) return empty. Returns one row (n_t, n_c, diff_micros,
    * t_lower_micros, t_upper_micros, p_micros, equivalent).
    *
    * Scale: ONE map-side-combined aggregate; nothing shuffles. */
  def tostEquivalence(df: DataFrame, treatmentExpr: Column,
      metricExpr: Column, margin: Long,
      alphaMicros: Long = 50000L): DataFrame = {
    require(margin > 0L, s"margin must be > 0 (got $margin)")
    require(alphaMicros > 0L && alphaMicros < 1000000L,
      s"alphaMicros must be in (0, 1e6) (got $alphaMicros)")
    val dec = "decimal(38,0)"
    val c = df.select(treatmentExpr.as("__t"),
        metricExpr.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t"), col("__y")).otherwise(0L).cast(dec))
          .as("__st"),
        sum(when(col("__t"), col("__y").cast(dec) * col("__y"))
          .otherwise(lit(0).cast(dec))).as("__sst"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("__t"), col("__y")).otherwise(0L).cast(dec))
          .as("__sc"),
        sum(when(!col("__t"), col("__y").cast(dec) * col("__y"))
          .otherwise(lit(0).cast(dec))).as("__ssc"))
    def variance(n: Column, s: Column, ss: Column) =
      (n.cast(dec) * ss - s * s).cast("double") /
        (n.cast(dec) * (n - 1)).cast("double")
    val se2 = variance(col("n_t"), col("__st"), col("__sst")) /
      col("n_t").cast("double") +
      variance(col("n_c"), col("__sc"), col("__ssc")) /
        col("n_c").cast("double")
    val diff = col("__st").cast("double") / col("n_t").cast("double") -
      col("__sc").cast("double") / col("n_c").cast("double")
    val d = lit(margin.toDouble)
    val tL = (diff + d) / sqrt(col("__se2"))
    val tU = (d - diff) / sqrt(col("__se2"))
    def upperTail(t: Column) =
      when(t >= 0.0, Quality.pValueTwoSidedZ(t) / 2.0)
        .otherwise(lit(1.0) - Quality.pValueTwoSidedZ(t) / 2.0)
    c.filter(col("n_t") > 1L && col("n_c") > 1L)
      .withColumn("__se2", se2)
      .filter(col("__se2") > 0.0)
      .withColumn("__p", greatest(upperTail(tL), upperTail(tU)))
      .select(col("n_t").cast("bigint").as("n_t"),
        col("n_c").cast("bigint").as("n_c"),
        round(diff * 1e6).cast("long").as("diff_micros"),
        round(tL * 1e6).cast("long").as("t_lower_micros"),
        round(tU * 1e6).cast("long").as("t_upper_micros"),
        round(col("__p") * 1e6).cast("long").as("p_micros"),
        (col("__p") < lit(alphaMicros.toDouble / 1e6)).as("equivalent"))
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial, method of
    * moments) — the small-segment stabilizer every per-segment rate
    * dashboard needs (a 3-of-7 segment "beats" a 3000-of-10000 one
    * on the raw rate; shrinkage pulls thin evidence toward the
    * prior, leaving rich evidence alone): fit the prior strength
    * `K = m(1−m)/v − 1` from the moments of the segment rates, then
    * `shrunk_i = (s_i + K·m)/(n_i + K)`.
    *
    * Exactness: segment rates quantize FIRST to exact integer ppm
    * (`(s·10⁶) div n`), so the across-segment moments are exact
    * integer sums (order-free); m, v, K and each posterior are ONE
    * mirrored IEEE tree from exact integers, micro-quantized on
    * output. Degenerate priors (k < 2, zero across-segment variance,
    * or K ≤ 0 — rates more dispersed than any beta-binomial) emit
    * the RAW rate as the shrunk rate with a NULL prior strength:
    * no-shrinkage is a statement, not an error. Returns one row per
    * segment: (segment, n, successes, raw_ppm, shrunk_ppm,
    * prior_strength_micros).
    *
    * Scale: one row-scale hash-agg to k segment rows; the prior fit
    * is a 1-row broadcast. */
  def ebShrinkRates(df: DataFrame, segmentExpr: Column,
      successExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val seg = df.select(segmentExpr.cast("string").as("segment"),
        successExpr.cast("boolean").as("__y"))
      .filter(col("segment").isNotNull && col("__y").isNotNull)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("successes"))
      .withColumn("raw_ppm",
        expr("CAST(successes AS DECIMAL(38,0)) * 1000000 div n")
          .cast("long"))
    val prior = seg.agg(count(lit(1)).as("__k"),
      sum(col("raw_ppm").cast(dec)).as("__sp"),
      sum(col("raw_ppm").cast(dec) * col("raw_ppm")).as("__qp"))
    val kD = col("__k").cast("double")
    val m = col("__sp").cast("double") / kD / lit(1e6)
    val vNum = (col("__k").cast(dec) * col("__qp") -
      col("__sp") * col("__sp"))
    val v = vNum.cast("double") /
      (col("__k").cast(dec) * (col("__k") - 1L)).cast("double") / lit(1e12)
    val kPrior = m * (lit(1.0) - m) / v - lit(1.0)
    val shrunk = (col("successes").cast("double") +
      col("__kp") * col("__m")) /
      (col("n").cast("double") + col("__kp"))
    seg.crossJoin(broadcast(prior)) // 1-row prior moments
      .withColumn("__m", m)
      .withColumn("__kp",
        when(col("__k") >= 2L && vNum > 0, kPrior))
      .select(col("segment"), col("n").cast("bigint").as("n"),
        col("successes").cast("bigint").as("successes"),
        col("raw_ppm"),
        when(col("__kp").isNotNull && col("__kp") > 0.0,
            round(shrunk * 1e6).cast("long"))
          .otherwise(col("raw_ppm")).as("shrunk_ppm"),
        when(col("__kp").isNotNull && col("__kp") > 0.0,
            round(col("__kp") * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("prior_strength_micros"))
      .orderBy(col("segment"))
  }

  /** Logistic regression by fixed-schedule gradient descent with
    * INTEGER weight state — the hash-graded member of the ML family
    * (TF-IDF/W2V/PCA grade through gates because their float
    * pipelines don't replay; this one does): a single-feature
    * bias+slope model trained for exactly `iters` full-batch steps,
    * weights held in integer MICROS and updated by truncating
    * division, so the entire training trajectory is a pure function
    * of the data — a second engine unrolls the same steps and lands
    * on the same weights bit for bit. The point is not to beat a
    * solver; it is a REPLAYABLE baseline classifier (calibration,
    * drift baselines, sanity checks) the correctness harness can
    * hash.
    *
    * Per step: `g₀ = Σ round((σ(z) − y)·10⁶)`,
    * `g₁ = Σ round((σ(z) − y)·x·10⁶)` (per-row micro-quantized —
    * order-free integer sums; `σ` is one mirrored exp tree with
    * `z = (w₀ + w₁x)/10⁶`), then
    * `w ← w − (lrPpm·g) div (n·10⁶)` in driver LONG arithmetic
    * (Java `/` and DuckDB `//` both truncate toward zero).
    * SIDE-EFFECTING: `iters` aggregate jobs run at construction.
    * Returns one row (n, w0_micros, w1_micros, n_correct,
    * accuracy_ppm) — accuracy at the z ≥ 0 decision rule. Empty
    * input returns empty.
    *
    * Scale: each step is ONE map-side-combined aggregate over the
    * (localCheckpointed) feature table; nothing shuffles wide. */
  def logisticGd(df: DataFrame, xExpr: Column, yExpr: Column,
      iters: Int = 5, lrPpm: Long = 500000L): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1, 100] (got $iters)")
    require(lrPpm > 0L, s"lrPpm must be > 0 (got $lrPpm)")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(xExpr.cast("double").as("x"),
        yExpr.cast("boolean").as("y"))
      .filter(col("x").isNotNull && !isnan(col("x")) &&
        col("y").isNotNull)
      .localCheckpoint(true) // iters + 1 consumers
    val nRow = base.count()
    if (nRow == 0L) {
      Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("n", "w0_micros", "w1_micros", "n_correct",
          "accuracy_ppm")
    } else {
      var w0 = 0L; var w1 = 0L
      val yD = when(col("y"), lit(1.0)).otherwise(lit(0.0))
      for (_ <- 1 to iters) {
        val z = (lit(w0).cast("double") +
          lit(w1).cast("double") * col("x")) / lit(1000000.0)
        val sig = lit(1.0) / (lit(1.0) + exp(-z))
        val g = base.agg(
          sum(round((sig - yD) * lit(1000000.0)).cast("long")).as("g0"),
          sum(round((sig - yD) * col("x") * lit(1000000.0))
            .cast("long")).as("g1")).collect().head
        w0 -= lrPpm * g.getLong(0) / (nRow * 1000000L)
        w1 -= lrPpm * g.getLong(1) / (nRow * 1000000L)
      }
      val zF = lit(w0).cast("double") + lit(w1).cast("double") * col("x")
      val acc = base.agg(count(lit(1)).as("n"),
        sum(when((zF >= 0.0) === col("y"), 1L).otherwise(0L))
          .as("nc")).collect().head
      Seq((acc.getLong(0), w0, w1, acc.getLong(1),
        acc.getLong(1) * 1000000L / acc.getLong(0)))
        .toDF("n", "w0_micros", "w1_micros", "n_correct",
          "accuracy_ppm")
    }
  }

  /** Cochran–Armitage trend test — "does the success rate MOVE with
    * the dose": linear-trend alternative over ordered groups
    * (exposure buckets, deciles, months), the question [[anovaF]] on
    * a binary outcome wastes power on (omnibus tests spend their α
    * on every permutation of the groups; a monotone alternative
    * earns a one-degree test). With integer group scores s, group
    * sizes n_i and successes r_i: `T = Σ s·r − (Σ s·n)·R/N`,
    * `Var = p̄(1−p̄)·[Σ n·s² − (Σ n·s)²/N]`.
    *
    * Exactness: multiply through by N — `T·N = N·Σs·r − (Σs·n)·R`
    * and `A·N = N·Σn·s² − (Σn·s)²` are DECIMAL(38,0)-exact, and
    * `z = (T·N)·√N / √(R·(N−R) · A·N)` is ONE mirrored IEEE tree
    * over casts of exact integers (the product under the root is
    * taken in DOUBLE — R(N−R)·AN can pass 38 digits at petabyte
    * rows; the split cast is the contract). Two-sided p through the
    * shared A&S polynomial. Degenerate (all/no successes, zero
    * score variance) returns empty. Returns one row
    * (n_groups, n, successes, z_micros, p_micros).
    *
    * Scale: one row-scale hash-agg to k group rows + one k-row
    * aggregate; nothing shuffles wide. */
  def cochranArmitage(df: DataFrame, scoreExpr: Column,
      successExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val g = df.select(scoreExpr.cast("long").as("s"),
        successExpr.cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("r"))
    val m = g.agg(count(lit(1)).as("k"),
      sum(col("n").cast(dec)).as("nn"),
      sum(col("r").cast(dec)).as("rr"),
      sum(col("n").cast(dec) * col("s")).as("sns"),
      sum(col("n").cast(dec) * col("s") * col("s")).as("sns2"),
      sum(col("s").cast(dec) * col("r")).as("ssr"))
    val tn = col("nn") * col("ssr") - col("sns") * col("rr")
    val an = col("nn") * col("sns2") - col("sns") * col("sns")
    val z = tn.cast("double") * sqrt(col("nn").cast("double")) /
      sqrt((col("rr") * (col("nn") - col("rr"))).cast("double") *
        an.cast("double"))
    m.filter(col("rr") > 0 && col("rr") < col("nn") && an > 0)
      .select(col("k").cast("bigint").as("n_groups"),
        col("nn").cast("bigint").as("n"),
        col("rr").cast("bigint").as("successes"),
        round(z * 1e6).cast("long").as("z_micros"),
        round(Quality.pValueTwoSidedZ(z) * 1e6).cast("long")
          .as("p_micros"))
  }

  /** Cochran's Q — k matched binary flags on the SAME rows ("do
    * these k classifiers/rules disagree beyond chance"): the
    * repeated-measures cousin of [[mcnemarTest]] (k = 2 reduces to
    * it), the eval-harness question a per-flag rate table cannot
    * answer because the flags are correlated through the rows.
    * `Q = (k−1)·[k·ΣC_j² − (ΣC_j)²] / (k·ΣR_i − ΣR_i²)` with C_j
    * the per-flag totals and R_i the per-row success counts — every
    * term an exact integer from ONE aggregate (ΣR and ΣR² fold
    * row-locally; the C_j are k conditional sums), so Q is one
    * truncating-free division of DECIMAL-exact integers mirrored in
    * IEEE. Rows where all flags agree (R_i = 0 or k) carry no
    * information and drop from the denominator by algebra, not by
    * filtering. p is the EXACT χ²(2) tail `exp(−Q/2)` when k = 3
    * (the only df with a closed form both engines share), NULL
    * otherwise — stated, not approximated. Degenerate (denominator
    * 0: every row unanimous) returns empty. Returns one row
    * (n_rows, k, q_micros, p_micros).
    *
    * Scale: ONE map-side-combined aggregate; flags are row-local
    * column algebra. Flag count guards loudly at 16. */
  def cochranQ(df: DataFrame, flagExprs: Seq[Column]): DataFrame = {
    require(flagExprs.size >= 2 && flagExprs.size <= 16,
      s"flag count must be in [2, 16] (got ${flagExprs.size})")
    val dec = "decimal(38,0)"
    val k = flagExprs.size
    val fCols = (1 to k).map(j => s"__f$j")
    val base = df.select(flagExprs.zip(fCols).map { case (e, n) =>
      when(e.cast("boolean"), 1L).otherwise(0L).as(n) }: _*)
    val rSum = fCols.map(col).reduce(_ + _)
    val aggs = Seq(count(lit(1)).as("n"),
      sum(rSum.cast(dec)).as("sr"),
      sum((rSum * rSum).cast(dec)).as("sr2")) ++
      fCols.zipWithIndex.map { case (c, j) =>
        sum(col(c).cast(dec)).as(s"c${j + 1}") }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val sc2 = (1 to k).map(j => col(s"c$j") * col(s"c$j")).reduce(_ + _)
    val sc = (1 to k).map(j => col(s"c$j")).reduce(_ + _)
    val num = lit(k - 1).cast(dec) * (lit(k).cast(dec) * sc2 - sc * sc)
    val den = lit(k).cast(dec) * col("sr") - col("sr2")
    val q = num.cast("double") / den.cast("double")
    m.filter(den > 0)
      .select(col("n").cast("bigint").as("n_rows"),
        lit(k.toLong).as("k"),
        round(q * 1e6).cast("long").as("q_micros"),
        (if (k == 3) round(exp(-q / lit(2.0)) * 1e6).cast("long")
         else lit(null).cast("long")).as("p_micros"))
  }

  /** Multi-feature [[logisticGd]] — the same replayable
    * integer-state GD with the weight state widened to a bias + one
    * slope per feature (array-of-longs in the driver, same
    * truncating per-step update): the smallest model that can fit
    * two covariates, which the single-feature form cannot by
    * construction. Everything that makes [[logisticGd]] hash-gradable
    * carries over unchanged: per-row gradient terms micro-quantize
    * (`round((σ(z) − y)·x_j·10⁶)`) so the per-step sums are
    * order-free exact integers; `z = (w₀ + Σ w_j x_j)/10⁶`
    * accumulates LEFT-TO-RIGHT in the feature order (the IEEE tree a
    * second engine mirrors token-for-token); each weight updates by
    * `w_j ← w_j − (lrPpm·g_j) div (n·10⁶)` in driver LONG arithmetic
    * (Java `/` and DuckDB `//` both truncate toward zero).
    *
    * The feature count guards LOUDLY at 16: per step the aggregate
    * is one map-side-combined pass with k+1 sums — wide-feature
    * models belong in a real solver, not the replay harness.
    * SIDE-EFFECTING: `iters` aggregate jobs run at construction.
    * Returns k+1 rows (weight_idx [0 = bias], w_micros, n,
    * n_correct, accuracy_ppm) — accuracy at the z ≥ 0 rule, summary
    * columns repeated per row so the output stays a flat hashable
    * table. Empty input returns empty.
    *
    * Scale: identical to [[logisticGd]] — each step ONE
    * map-side-combined aggregate over the localCheckpointed feature
    * table; nothing shuffles wide. */
  def logisticGdMulti(df: DataFrame, xExprs: Seq[Column],
      yExpr: Column, iters: Int = 5, lrPpm: Long = 500000L)
      : DataFrame = {
    require(xExprs.nonEmpty && xExprs.size <= 16,
      s"feature count must be in [1, 16] (got ${xExprs.size}) — " +
        "wide models belong in a real solver, not the replay harness")
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1, 100] (got $iters)")
    require(lrPpm > 0L, s"lrPpm must be > 0 (got $lrPpm)")
    val spark = df.sparkSession
    import spark.implicits._
    val k = xExprs.size
    val xCols = (1 to k).map(j => s"__x$j")
    val base = df.select(xExprs.zip(xCols).map {
          case (e, n) => e.cast("double").as(n)
        } :+ yExpr.cast("boolean").as("__y"): _*)
      .filter(xCols.map(c => col(c).isNotNull && !isnan(col(c)))
        .reduce(_ && _) && col("__y").isNotNull)
      .localCheckpoint(true) // iters + 1 consumers
    val nRow = base.count()
    if (nRow == 0L) {
      Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("weight_idx", "w_micros", "n", "n_correct",
          "accuracy_ppm")
    } else {
      val w = Array.fill(k + 1)(0L)
      val yD = when(col("__y"), lit(1.0)).otherwise(lit(0.0))
      def zTree: Column = xCols.zipWithIndex.foldLeft(
        lit(w(0)).cast("double")) { case (acc, (c, j)) =>
          acc + lit(w(j + 1)).cast("double") * col(c) }
      for (_ <- 1 to iters) {
        val sig = lit(1.0) / (lit(1.0) + exp(-(zTree / lit(1000000.0))))
        val gAggs = sum(round((sig - yD) * lit(1000000.0))
            .cast("long")).as("g0") +:
          xCols.zipWithIndex.map { case (c, j) =>
            sum(round((sig - yD) * col(c) * lit(1000000.0))
              .cast("long")).as(s"g${j + 1}") }
        val g = base.agg(gAggs.head, gAggs.tail: _*).collect().head
        // BigInt on the driver: lrPpm·g_j wraps a Java long once
        // |g_j| > ~1.8e13 (≈18M rows at |x| ≤ 1) while the oracle's
        // BIGINT errors loudly — the update must not diverge
        // silently. BigInt division truncates toward zero like Java /
        // and DuckDB //; longValueExact keeps the failure loud if a
        // step ever leaves the representable range.
        for (j <- 0 to k)
          w(j) -= (BigInt(lrPpm) * g.getLong(j) /
            (BigInt(nRow) * 1000000L)).bigInteger.longValueExact()
      }
      val acc = base.agg(count(lit(1)).as("n"),
        sum(when((zTree >= 0.0) === col("__y"), 1L).otherwise(0L))
          .as("nc")).collect().head
      val (n, nc) = (acc.getLong(0), acc.getLong(1))
      w.toSeq.zipWithIndex.map { case (wj, j) =>
        (j.toLong, wj, n, nc, nc * 1000000L / n) }
        .toDF("weight_idx", "w_micros", "n", "n_correct",
          "accuracy_ppm")
        .orderBy(col("weight_idx"))
    }
  }

  /** Pairwise post-hoc comparisons with Holm step-down — the
    * follow-up [[anovaF]] / [[graft.operators.OrderedStats.kruskalWallis]]
    * demand (an omnibus rejection says "SOME group differs", never
    * WHICH; running k²/2 naked t-tests inflates the family error):
    * every group pair gets a Welch t (the [[welchTTest]] tree on
    * per-group exact moments), its large-sample normal p (the
    * documented stance of the rank tests — at per-group n where this
    * engine runs, t ≈ z), and the Holm step-down verdict — reject
    * ranks 1..i while `p₍ᵢ₎·(m−i+1) ≤ α` holds, an exact integer
    * comparison, stopping at the first failure (step-down: stronger
    * than Bonferroni, still controls FWER with NO independence
    * assumption — the safe default where [[Quality.bhFdr]] trades
    * FWER for FDR).
    *
    * Pairs where the test is undefined (an arm with < 2 rows, or
    * both variances zero) are ABSENT and do not consume Holm budget
    * (m counts performed tests only). Returns one row per testable
    * pair: (g1, g2, n_1, n_2, mean_1_micros, mean_2_micros,
    * t_micros, p_micros, rank, rejected), g1 < g2.
    *
    * Scale: one row-scale hash-agg to k group-moment rows; the pair
    * join and the rank window are k²-scale — the loud `maxGroups`
    * pre-flight (one narrow count, a documented eager exception)
    * refuses a grouping column that isn't a treatment arm. */
  def posthocPairs(df: DataFrame, groupExpr: Column, valueExpr: Column,
      alphaMicros: Long = 50000L, maxGroups: Long = 200L): DataFrame = {
    require(alphaMicros > 0L && alphaMicros < 1000000L,
      s"alphaMicros must be in (0, 1e6) (got $alphaMicros)")
    val dec = "decimal(38,0)"
    import org.apache.spark.sql.expressions.Window
    val perGroup = df.select(groupExpr.cast("string").as("g"),
        valueExpr.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).as("s"),
        sum(col("x").cast(dec) * col("x")).as("q"))
      .localCheckpoint() // consumed twice (both sides of the pair join)
    val k = perGroup.count()
    require(k <= maxGroups,
      s"posthocPairs: $k groups (cap $maxGroups) — the pair join is " +
        "k²-scale; a grouping column this wide is not a treatment arm")
    val a = perGroup.select(col("g").as("g1"), col("n").as("__n1"),
      col("s").as("__s1"), col("q").as("__q1"))
    val b = perGroup.select(col("g").as("g2"), col("n").as("__n2"),
      col("s").as("__s2"), col("q").as("__q2"))
    def se2(n: Column, s: Column, q: Column) =
      (n.cast(dec) * q - s * s).cast("double") /
        (n.cast(dec) * (n - 1)).cast("double") / n.cast("double")
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    val se21 = se2(col("__n1"), col("__s1"), col("__q1"))
    val se22 = se2(col("__n2"), col("__s2"), col("__q2"))
    val t = (mean(col("__s1"), col("__n1")) -
      mean(col("__s2"), col("__n2"))) / sqrt(se21 + se22)
    val pairs = a.join(b, col("g1") < col("g2"))
      .filter(col("__n1") > 1L && col("__n2") > 1L)
      .withColumn("__se2", se21 + se22)
      .filter(col("__se2") > 0.0)
      .withColumn("__t", t)
      .withColumn("p_micros",
        round(Quality.pValueTwoSidedZ(col("__t")) * 1e6).cast("long"))
    // k²-scale windows: rank the performed tests, then the step-down
    // prefix AND (reject until the first surviving null)
    val wRank = Window.orderBy(col("p_micros"), col("g1"), col("g2"))
    val wPrefix = wRank.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    pairs
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("__ok",
        when(col("p_micros") * (col("__m") - col("rank") + 1L) <=
          lit(alphaMicros), 1).otherwise(0))
      .withColumn("rejected",
        min(col("__ok")).over(wPrefix) === 1)
      .select(col("g1"), col("g2"),
        col("__n1").cast("bigint").as("n_1"),
        col("__n2").cast("bigint").as("n_2"),
        round(mean(col("__s1"), col("__n1")) * 1e6).cast("long")
          .as("mean_1_micros"),
        round(mean(col("__s2"), col("__n2")) * 1e6).cast("long")
          .as("mean_2_micros"),
        round(col("__t") * 1e6).cast("long").as("t_micros"),
        col("p_micros"), col("rank"), col("rejected"))
      .orderBy(col("rank"))
  }

  /** Decision STUMP — the best single binary split `feature ≤ t` by
    * weighted Gini impurity: the supervised atom the feature family
    * stops short of (target_encode and woe SCORE a feature; this
    * turns one into a deployable rule and the measured impurity says
    * whether it was worth it — and it is the base learner any
    * boosting/forest loop starts from). Returns ONE row: the chosen
    * threshold, the split's class counts, the split's weighted Gini
    * and the parent Gini (both ppm — gain = parent − split).
    *
    * Exactness: candidate thresholds are the DISTINCT feature values
    * except the maximum (x ≤ max keeps the right side empty — not a
    * split); per candidate the weighted impurity
    * `[(nL²−pL²−qL²)·10⁶/nL + (nR²−pR²−qR²)·10⁶/nR] / n` is two
    * DECIMAL-exact truncating divisions summed then one more (every
    * operand an exact integer — the two-level truncation is stated
    * convention, mirrored token-for-token in the oracle); the argmin
    * tie-breaks (gini asc, threshold asc), so a second engine lands
    * on the same rule bit for bit. NULL features or labels are
    * excluded (no vote). A constant feature emits NOTHING (there is
    * no split) rather than a fake rule.
    *
    * Scale: one feature-keyed hash-agg to the distinct-value table,
    * one ordered cumulative window + one argmin over it (value-scale,
    * not row-scale) — 10¹¹ rows with 10⁴ distinct quantized values
    * window over 10⁴ rows. Quantize continuous features first (the
    * census IS the algorithm: a split between two adjacent quantized
    * values cannot beat splitting AT one). */
  def decisionStump(df: DataFrame, featureExpr: Column,
      labelExpr: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val rows = df.select(featureExpr.cast("long").as("__f"),
        labelExpr.cast("boolean").as("__y"))
      .filter(col("__f").isNotNull && col("__y").isNotNull)
    val byV = rows.groupBy(col("__f"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__c"))
      .localCheckpoint(true) // two consumers: totals + cumulative scan
    val tot = byV.agg(sum(col("__p")).as("__tp"), sum(col("__c")).as("__tn"),
      max(col("__f")).as("__fmax"))
    val wCum = Window.orderBy(col("__f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = byV.crossJoin(broadcast(tot)) // 1-row totals
      .withColumn("__pl", sum(col("__p")).over(wCum))
      .withColumn("__nl", sum(col("__c")).over(wCum))
      .filter(col("__f") < col("__fmax")) // right side must be nonempty
      .withColumn("__ql", col("__nl") - col("__pl"))
      .withColumn("__pr", col("__tp") - col("__pl"))
      .withColumn("__nr", col("__tn") - col("__nl"))
      .withColumn("__qr", col("__nr") - col("__pr"))
    val gSplit = Quality.decimalDivTrunc(
      Quality.decimalDivTrunc(
        (col("__nl").cast(dec) * col("__nl") - col("__pl").cast(dec) *
          col("__pl") - col("__ql").cast(dec) * col("__ql")) * 1000000L,
        col("__nl").cast(dec)) +
      Quality.decimalDivTrunc(
        (col("__nr").cast(dec) * col("__nr") - col("__pr").cast(dec) *
          col("__pr") - col("__qr").cast(dec) * col("__qr")) * 1000000L,
        col("__nr").cast(dec)),
      col("__tn").cast(dec))
    val gParent = Quality.decimalDivTrunc(
      (col("__tn").cast(dec) * col("__tn") - col("__tp").cast(dec) *
        col("__tp") - (col("__tn") - col("__tp")).cast(dec) *
        (col("__tn") - col("__tp"))) * 1000000L,
      col("__tn").cast(dec) * col("__tn"))
    val wBest = Window.orderBy(col("__g").cast(dec).asc, col("__f"))
    cand.withColumn("__g", gSplit)
      .withColumn("__gp", gParent)
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("__f").cast("bigint").as("threshold"),
        col("__nl").cast("bigint").as("n_left"),
        col("__nr").cast("bigint").as("n_right"),
        col("__pl").cast("bigint").as("pos_left"),
        col("__pr").cast("bigint").as("pos_right"),
        col("__g").cast("bigint").as("gini_ppm"),
        col("__gp").cast("bigint").as("parent_gini_ppm"))
  }

  /** L2 gradient boosting over regression STUMPS — the actual
    * boosting LOOP ([[decisionStump]] fits one rule; this chains
    * them on residuals, which is the whole trick of gradient
    * boosting with squared loss: each round fits the best
    * SSE-reducing split of what the previous rounds failed to
    * explain). Returns one row per round: (round, threshold, n_left,
    * n_right, v_left_micros, v_right_micros) — the full additive
    * model, base prediction excluded by convention (it is the
    * truncated global mean, recomputable from round 0 residuals).
    *
    * Exactness: the target enters in micro units; the base
    * prediction and every leaf value are truncating integer
    * divisions (toward zero, both engines); per-round split gain
    * `SL² div nL + SR² div nR` is DECIMAL-exact with the stated
    * truncation (SL² ≥ 0, so floor == trunc), argmax ties break
    * (gain desc, threshold asc); residual updates are exact long
    * subtraction. A chained-CTE oracle replays every round bit for
    * bit. NULL features/targets are excluded; a constant feature
    * emits nothing (no split exists).
    *
    * Scale: per round one feature-keyed hash-agg to the
    * distinct-value census + one cumulative window over it
    * (value-scale), plus one broadcast-free residual update (the
    * stump is three scalars folded into the expression).
    * SIDE-EFFECTING: two 1-row collects per round (totals and the
    * winning split — model-scale, documented). Rounds are a small
    * constant by contract. */
  def boostedStumpsL2(df: DataFrame, featureExpr: Column,
      targetMicrosExpr: Column, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16] (got $rounds)")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(featureExpr.cast("long").as("__f"),
        targetMicrosExpr.cast("long").as("__y"))
      .filter(col("__f").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // every round re-scans it
    val head0 = base.agg(sum(col("__y")).as("s"),
      count(lit(1)).as("n")).head() // 1-row totals (documented eager)
    if (head0.isNullAt(0) || head0.getLong(1) == 0L)
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("round", "threshold", "n_left", "n_right",
          "v_left_micros", "v_right_micros")
    val p0 = (BigInt(head0.getLong(0)) / head0.getLong(1)).toLong
    var cur = base.withColumn("__r", col("__y") - lit(p0))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    var rnd = 1
    var splittable = true
    while (rnd <= rounds && splittable) {
      val byV = cur.groupBy(col("__f"))
        .agg(sum(col("__r")).as("__sr"), count(lit(1)).as("__c"))
        .localCheckpoint(true) // totals + cumulative scan consumers
      val tot = byV.agg(sum(col("__sr")).as("st"), sum(col("__c")).as("nt"),
        max(col("__f")).as("fmax")).head()
      val (st, nt, fmax) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
      val wCum = Window.orderBy(col("__f"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cand = byV
        .withColumn("__pl", sum(col("__sr")).over(wCum))
        .withColumn("__nl", sum(col("__c")).over(wCum))
        .filter(col("__f") < lit(fmax))
      if (cand.isEmpty) splittable = false
      else {
        val gain = Quality.decimalDivTrunc(
          col("__pl").cast(dec) * col("__pl"), col("__nl").cast(dec)) +
          Quality.decimalDivTrunc(
            (lit(st).cast(dec) - col("__pl")) *
              (lit(st).cast(dec) - col("__pl")),
            lit(nt).cast(dec) - col("__nl"))
        val wBest = Window.orderBy(col("__g").desc, col("__f"))
        val best = cand.withColumn("__g", gain)
          .withColumn("__rn", row_number().over(wBest))
          .filter(col("__rn") === 1)
          .select(col("__f"), col("__pl"), col("__nl")).head()
        val (t, sl, nl) = (best.getLong(0), best.getLong(1),
          best.getLong(2))
        val (nr, sr) = (nt - nl, st - sl)
        val vL = (BigInt(sl) / nl).toLong // trunc toward zero, mirrored
        val vR = (BigInt(sr) / nr).toLong
        out += ((rnd.toLong, t, nl, nr, vL, vR))
        cur = cur.withColumn("__r", col("__r") -
          when(col("__f") <= lit(t), lit(vL)).otherwise(lit(vR)))
        rnd += 1
      }
    }
    out.toSeq.toDF("round", "threshold", "n_left", "n_right",
        "v_left_micros", "v_right_micros")
      .orderBy(col("round"))
  }

  /** Two-covariate RIDGE regression — the regularized member the
    * linear family lacks (feat_group_regression / feat_ols_diagnostics
    * fit plain OLS; near-collinear covariates make those coefficients
    * explode, and the standard fix is L2 shrinkage): solve
    * `(C + λ·n²·I)·β = c_y` over the CENTERED exact moment matrix
    * `C_ab = n·Σab − Σa·Σb` (so λ is in per-observation covariance
    * units — λ = 0 reproduces OLS exactly), intercept
    * `(Σy − β₁Σx₁ − β₂Σx₂)/n` from the same sums. One row per
    * requested λ — the shrinkage path a model selection actually
    * reads.
    *
    * Exactness: the nine raw moments are exact integer sums in ONE
    * row-scale pass (inputs must be integral — cast to cents first);
    * centered moments, both Cramer numerators and the determinant
    * are DECIMAL(38,0)-exact; each β is ONE mirrored IEEE division
    * of exact integers and the intercept one mirrored tree — a
    * second engine replays every bit. Degenerate systems (det ≤ 0 —
    * constant or perfectly collinear covariates at λ = 0) emit NULL
    * coefficients, never a division error. DECIMAL(38,0) holds the
    * numerators to |Σay| ~ 10¹⁹ — far past any cents-quantized
    * column at group scale; re-quantize coarser beyond that.
    *
    * Returns (lambda, n_obs, b1_micros, b2_micros, intercept_micros).
    * Scale: one hash-agg to a 1-row moment table; everything after
    * is constant work broadcast over the λ list. */
  def ridgeRegression(df: DataFrame, yExpr: Column, x1Expr: Column,
      x2Expr: Column, lambdas: Seq[Long]): DataFrame = {
    require(lambdas.nonEmpty, "lambdas must be non-empty")
    require(lambdas.forall(_ >= 0L),
      s"lambdas must be >= 0 (got ${lambdas.mkString(",")})")
    val dec = "decimal(38,0)"
    val rows = df.select(yExpr.cast("long").as("__y"),
        x1Expr.cast("long").as("__x1"), x2Expr.cast("long").as("__x2"))
      .filter(col("__y").isNotNull && col("__x1").isNotNull &&
        col("__x2").isNotNull)
    val m = rows.agg(count(lit(1)).as("n"),
      sum(col("__y")).as("sy"),
      sum(col("__x1")).as("s1"), sum(col("__x2")).as("s2"),
      sum(col("__x1") * col("__x1")).as("s11"),
      sum(col("__x2") * col("__x2")).as("s22"),
      sum(col("__x1") * col("__x2")).as("s12"),
      sum(col("__x1") * col("__y")).as("s1y"),
      sum(col("__x2") * col("__y")).as("s2y"))
      .filter(col("n") >= 3L)
    def c(sab: String, sa: String, sb: String) =
      (col("n").cast(dec) * col(sab) - col(sa).cast(dec) * col(sb))
        .cast(dec)
    val spark = df.sparkSession
    import spark.implicits._
    val ls = lambdas.toDF("lambda")
    m.crossJoin(broadcast(ls)) // 1-row moments x the lambda list
      .withColumn("__l",
        (col("lambda").cast(dec) * col("n").cast(dec) * col("n").cast(dec))
          .cast(dec))
      .withColumn("__a11", (c("s11", "s1", "s1") + col("__l")).cast(dec))
      .withColumn("__a22", (c("s22", "s2", "s2") + col("__l")).cast(dec))
      .withColumn("__a12", c("s12", "s1", "s2"))
      .withColumn("__c1y", c("s1y", "s1", "sy"))
      .withColumn("__c2y", c("s2y", "s2", "sy"))
      .withColumn("__det",
        (col("__a11") * col("__a22") - col("__a12") * col("__a12"))
          .cast(dec))
      // the division is guarded AT THE SITE (not just in the output
      // projection): ANSI mode raises DIVIDE_BY_ZERO eagerly on the
      // degenerate det = 0 row even when a later `when` discards it
      .withColumn("__b1", when(col("__det") > 0,
        (col("__a22") * col("__c1y") - col("__a12") * col("__c2y"))
          .cast(dec).cast("double") / col("__det").cast("double")))
      .withColumn("__b2", when(col("__det") > 0,
        (col("__a11") * col("__c2y") - col("__a12") * col("__c1y"))
          .cast(dec).cast("double") / col("__det").cast("double")))
      .select(col("lambda").cast("bigint").as("lambda"),
        col("n").cast("bigint").as("n_obs"),
        when(col("__det") > 0, round(col("__b1") * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("b1_micros"),
        when(col("__det") > 0, round(col("__b2") * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("b2_micros"),
        when(col("__det") > 0,
          round((col("sy").cast("double") - col("__b1") *
            col("s1").cast("double") - col("__b2") *
            col("s2").cast("double")) / col("n").cast("double") * 1e6)
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("intercept_micros"))
      .orderBy(col("lambda"))
  }

  /** Weighted isotonic regression by pool-adjacent-violators — the
    * BUCKET-level, fully SQL-gradeable sibling of
    * [[isotonicCalibrate]] (which folds per-group distinct scores and
    * can only be gate-graded because no SQL engine replays its
    * pooling loop; THIS form's minimax identity gives every fitted
    * value a value-for-value oracle, and it adds decreasing fits and
    * explicit weights): given per-bucket weights and label sums in
    * bucket order, find the monotone (increasing or decreasing) fit
    * minimizing weighted squared error. PAVA merges adjacent pools
    * while they violate the direction; a pool's fitted value is its
    * exact weighted mean.
    *
    * Exactness: pool means compare by CROSS-MULTIPLICATION
    * (s₁·w₂ vs s₂·w₁ — exact longs, never a float tie-break), and
    * the emitted value is the truncating ppm `s·10⁶ div w` of the
    * pool's exact sums. The oracle needs no PAVA at all: the minimax
    * theorem gives `fit(k) = max_{i≤k} min_{j≥k} mean(i..j)`
    * (min/max swapped for decreasing), truncation is monotone, and
    * equal rationals truncate equally — so a plain SQL minimax over
    * segment means replays every fitted value.
    *
    * Input: one row per bucket (orderCol, weightCol > 0, sumCol);
    * duplicate buckets and w ≤ 0 refuse loudly; the TOTALS Σw and
    * Σ|s| are bounded at 2³¹ — the violation test multiplies
    * MERGED-pool sums, which per-bucket bounds alone cannot keep
    * inside a long (two max-sized buckets pooled together would
    * silently flip merge decisions) — so every cross-product of pool
    * sums stays ≤ 2⁶² and every `s·10⁶` stays ≤ 2³¹·10⁶.
    * Returns one row per bucket:
    * (bucket, n, n_pos, raw_ppm, fit_ppm).
    *
    * Scale: calibration tables are BUCKET-scale (tens of rows) by
    * construction — the ordered fold runs in one task; aggregate to
    * buckets first (that aggregation is the data-scale pass). For a
    * fleet of per-segment curves use [[isotonicFitGrouped]], which
    * distributes one fold per key. */
  def isotonicFit(df: DataFrame, orderCol: String, weightCol: String,
      sumCol: String, increasing: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(orderCol).cast("long").as("b"),
        col(weightCol).cast("long").as("w"),
        col(sumCol).cast("long").as("s"))
      .as[(Long, Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) => pavaFold(it, increasing, "") }
      .toDF("bucket", "n", "n_pos", "raw_ppm", "fit_ppm")
      .orderBy(col("bucket"))
  }

  /** Per-segment [[isotonicFit]] — the production calibration shape
    * (one monotone curve per model segment/cohort/geo): identical
    * PAVA semantics per key, the bounds applied PER GROUP (each
    * group's Σw and Σ|s| ≤ 2³¹), and the single-task funnel of the
    * ungrouped form becomes one fold per key — the fleet of
    * calibration curves parallelizes for free across executors.
    * Keys compare as strings (the [[isotonicCalibrate]] convention).
    * Returns one row per (key, bucket):
    * (key, bucket, n, n_pos, raw_ppm, fit_ppm). */
  def isotonicFitGrouped(df: DataFrame, keyCol: String,
      orderCol: String, weightCol: String, sumCol: String,
      increasing: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        col(orderCol).cast("long").as("b"),
        col(weightCol).cast("long").as("w"),
        col(sumCol).cast("long").as("s"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        pavaFold(it.map(r => (r._2, r._3, r._4)), increasing,
            s" (key=$k)")
          .map { case (b, w, s, raw, fit) => (k, b, w, s, raw, fit) }
      }
      .toDF("key", "bucket", "n", "n_pos", "raw_ppm", "fit_ppm")
      .orderBy(col("key"), col("bucket"))
  }

  /** One exact weighted PAVA over a group's (bucket, w, s) rows —
    * shared by [[isotonicFit]] and [[isotonicFitGrouped]] so the
    * grouped form can never drift from the graded single-group one.
    * Emits (bucket, w, s, raw_ppm, fit_ppm) in bucket order. */
  private def pavaFold(it: Iterator[(Long, Long, Long)],
      increasing: Boolean,
      ctx: String): Iterator[(Long, Long, Long, Long, Long)] = {
    val rows = it.toArray.sortBy(_._1)
    rows.foreach { case (b, w, s) =>
      // per-bucket pre-screen so the totals below sum without
      // overflow (an in-memory array never holds 2^31 buckets)
      require(w > 0 && w <= (1L << 31) && math.abs(s) <= (1L << 31),
        s"isotonicFit$ctx: bucket $b needs 0 < w <= 2^31 and " +
          s"|s| <= 2^31 (got w=$w, s=$s) — aggregate to buckets " +
          "first and keep counts in range")
    }
    // bound the TOTALS, not just each bucket: PAVA compares
    // MERGED-pool sums cross-wise (prev.s * cur.w), so the worst
    // cross-product is (Σ|s|)·(Σw) — per-bucket bounds would let
    // two max-sized buckets pooled together overflow silently and
    // flip a merge decision
    val totW = rows.iterator.map(_._2).sum
    val totS = rows.iterator.map(r => math.abs(r._3)).sum
    require(totW <= (1L << 31) && totS <= (1L << 31),
      s"isotonicFit$ctx: total weight $totW and total |s| $totS must " +
        "each stay <= 2^31 so pooled cross-products fit in a " +
        "long — aggregate to coarser buckets or rescale")
    require(rows.map(_._1).distinct.length == rows.length,
      s"isotonicFit$ctx: duplicate bucket order values — one row per " +
        "bucket")
    // PAVA: pools as (startIdx, w, s); a violation exists when the
    // previous pool's mean is above (increasing) / below
    // (decreasing) the current's — compared exactly cross-wise
    case class Pool(start: Int, var w: Long, var s: Long)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    rows.zipWithIndex.foreach { case ((_, w, s), i) =>
      pools += Pool(i, w, s)
      var merging = true
      while (merging && pools.length >= 2) {
        val cur = pools(pools.length - 1)
        val prev = pools(pools.length - 2)
        val violates =
          if (increasing) prev.s * cur.w > cur.s * prev.w
          else prev.s * cur.w < cur.s * prev.w
        if (violates) {
          prev.w += cur.w; prev.s += cur.s
          pools.remove(pools.length - 1)
        } else merging = false
      }
    }
    val fit = new Array[Long](rows.length)
    pools.zipWithIndex.foreach { case (p, pi) =>
      val end = if (pi + 1 < pools.length) pools(pi + 1).start
        else rows.length
      val v = p.s * 1000000L / p.w
      var i = p.start
      while (i < end) { fit(i) = v; i += 1 }
    }
    rows.iterator.zipWithIndex.map { case ((b, w, s), i) =>
      (b, w, s, s * 1000000L / w, fit(i))
    }
  }
}
