package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Right-censored survival analysis — the time-to-event toolkit
  * (churn curves, "days until second purchase", hardware
  * time-to-failure) the rest of the event family feeds: retention
  * cohorts count who came back, survival curves say how LONG until
  * the event while crediting the users still hanging (censored)
  * instead of dropping them — dropping censored rows biases every
  * naive duration average low.
  *
  * Scale: everything is one duration-keyed hash-agg to the distinct
  * event-time table (study-length scale, NOT row scale) plus two
  * cumulative windows over ONE ordered pass — no per-subject state,
  * no driver loops; 10¹¹ subjects reduce to at most as many rows as
  * there are distinct durations before any window runs.
  */
object Survival {

  /** Kaplan-Meier product-limit estimator with Nelson-Aalen
    * cumulative hazard, one row per distinct EVENT time `t`:
    * `n_risk` (subjects with duration ≥ t), `n_events` (observed
    * events at t), `n_censored` (withdrawals at t),
    * `ln_s_micros` = Σ_{u≤t} round(10⁶·ln(1 − d_u/n_u)) — the KM
    * survival curve as exact integer micro-nats (S(t) = exp(·/10⁶)
    * downstream), and `cumhaz_micros` = Σ round(10⁶·d_u/n_u) — the
    * Nelson-Aalen estimate. Input: one row per subject, `durationExpr`
    * a non-negative integer duration, `observedExpr` true when the
    * event was SEEN (false = right-censored at that duration).
    *
    * Conventions that make this replay exactly in a second engine:
    * per-term micro-rounding then integer cumulative sums (the
    * order-free micro-nat discipline — `ln` agrees between engines on
    * identical doubles); censoring at the same instant as an event
    * follows the standard rule (censored subjects ARE still at risk
    * at their own time: n_risk counts duration ≥ t, exits leave
    * after t). If every remaining subject dies at the final time
    * (d = n), ln(0) has no finite value — `ln_s_micros` is NULL from
    * that row on (survival hit zero), never a silent skip: the NULL
    * propagates by flag, not by sum-ignores-null. */
  def kaplanMeier(df: DataFrame, durationExpr: Column,
      observedExpr: Column): DataFrame = {
    val rows = df.select(durationExpr.cast("long").as("t"),
        observedExpr.cast("boolean").as("obs"))
      .filter(col("t").isNotNull && col("t") >= 0 && col("obs").isNotNull)
    // study-length-scale table: exits (events + censors) per time —
    // materialized ONCE (lineage truncation, construction runs jobs
    // eagerly): the subject-count agg and the curve both consume it,
    // and without truncation each re-runs the row-scale reduction
    val byT = rows.groupBy(col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("exits"))
      .localCheckpoint(true)
    val total = byT.agg(sum(col("exits")).as("__n0"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(total)) // 1-row subject count
      .withColumn("n_risk",
        col("__n0") - coalesce(sum(col("exits")).over(wBefore), lit(0L)))
      .filter(col("d") > 0) // the curve steps at event times only
      .withColumn("__term",
        when(col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")) * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("__hit_zero",
        max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wUpTo))
      .withColumn("ln_s_micros",
        when(col("__hit_zero") === 1, lit(null).cast("long"))
          .otherwise(sum(col("__term")).over(wUpTo)))
      .withColumn("cumhaz_micros",
        sum(round(col("d").cast("double") /
          col("n_risk").cast("double") * 1e6).cast("long")).over(wUpTo))
      .select(col("t"), col("n_risk").cast("bigint").as("n_risk"),
        col("d").cast("bigint").as("n_events"),
        (col("exits") - col("d")).cast("bigint").as("n_censored"),
        col("ln_s_micros"), col("cumhaz_micros"))
      .orderBy(col("t"))
  }

  /** Restricted mean survival time — the AREA under the
    * [[kaplanMeier]] curve up to a horizon τ: "average event-free
    * time within the first τ units", the one-number survival summary
    * that stays defined under censoring where the plain mean does
    * not (median fails too once S never crosses ½) — the standard
    * product readout ("average active hours in the first week").
    *
    * Exactness: the KM step function is integrated segment by
    * segment — the pre-first-event segment contributes
    * `min(t₁, τ)·10⁶` exactly (S = 1); each event-time segment
    * contributes `round(exp(ln_s/10⁶) · width · 10⁶)` — per-segment
    * micro-quantization, order-free sum, `exp` agreeing between
    * engines on identical doubles (the micro-nat discipline);
    * S-hit-zero rows (NULL ln_s) contribute exactly 0. Returns one
    * row (horizon, n_subjects, rmst_micros); n_subjects is the risk
    * set at the FIRST event time (0 when no event was ever
    * observed — then rmst = τ exactly, everyone survived the
    * window).
    *
    * Scale: rides [[kaplanMeier]] (one row-scale hash-agg; windows
    * at study-length scale); the segment lead window and both 1-row
    * reductions run on the study-length table only. SIDE-EFFECTING:
    * the KM table localCheckpoints (two consumers). */
  /** KM curve with GREENWOOD confidence bands — the uncertainty the
    * point curve refuses to fake: a churn curve from 40 subjects and
    * one from 40,000 print identically; the Greenwood variance
    * `Var(S) = S²·Σ d/(n(n−d))` says which one you may act on. Plain
    * (linear-scale) Greenwood bands `S ± z·S·√Σg`, clamped to
    * [0, 10⁶] micros.
    *
    * Exactness: per-event-time Greenwood terms pico-quantize
    * (`round(10¹²·d/(n(n−d)))` — doubles from exact integers, then
    * order-free integer cumulative sums); S and the half-width are
    * ONE mirrored tree each off the integer ln_s / cumulative-term
    * columns. Rows after survival hits zero (d = n) carry NULL
    * S/bands by the kaplanMeier flag discipline (the variance is
    * undefined there, and d = n can only occur at the final event
    * time, so the skipped NULL term never corrupts an emitted band).
    * Returns one row per event time:
    * (t, n_risk, n_events, s_micros, lo_micros, hi_micros).
    *
    * Scale: rides [[kaplanMeier]]'s study-length-scale posture — the
    * extra work is two more window sums over the distinct-event-time
    * table. */
  def kmBands(df: DataFrame, durationExpr: Column,
      observedExpr: Column, zMicros: Long = 1959964L): DataFrame = {
    require(zMicros > 0L, s"zMicros must be positive (got $zMicros)")
    val km = kaplanMeier(df, durationExpr, observedExpr)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km.withColumn("__gt", when(col("n_events") < col("n_risk"),
        round(col("n_events").cast("double") /
          (col("n_risk").cast("double") *
            (col("n_risk") - col("n_events")).cast("double")) * 1e12)
          .cast("long")))
      .withColumn("__cg", sum(col("__gt")).over(w))
      .withColumn("s_micros", when(col("ln_s_micros").isNotNull,
        round(exp(col("ln_s_micros").cast("double") / 1e6) * 1e6)
          .cast("long")))
      .withColumn("__half", when(col("ln_s_micros").isNotNull,
        round(lit(zMicros.toDouble / 1e6) *
          exp(col("ln_s_micros").cast("double") / 1e6) *
          sqrt(col("__cg").cast("double") / 1e12) * 1e6).cast("long")))
      .select(col("t"), col("n_risk"), col("n_events"), col("s_micros"),
        when(col("__half").isNotNull,
          greatest(lit(0L), col("s_micros") - col("__half")))
          .as("lo_micros"),
        when(col("__half").isNotNull,
          least(lit(1000000L), col("s_micros") + col("__half")))
          .as("hi_micros"))
  }

  def rmst(df: DataFrame, durationExpr: Column, observedExpr: Column,
      horizonT: Long): DataFrame = {
    require(horizonT > 0L, s"horizonT must be > 0 (got $horizonT)")
    val km = kaplanMeier(df, durationExpr, observedExpr)
      .localCheckpoint(true)
    val wLead = Window.orderBy(col("t"))
    val seg = km.filter(col("t") < horizonT)
      .withColumn("__next", least(
        coalesce(lead(col("t"), 1).over(wLead), lit(horizonT)),
        lit(horizonT)))
      .withColumn("__s",
        when(col("ln_s_micros").isNull, lit(0.0))
          .otherwise(exp(col("ln_s_micros").cast("double") /
            lit(1000000.0))))
    val terms = seg.agg(coalesce(sum(round(col("__s") *
        (col("__next") - col("t")).cast("double") * lit(1000000.0))
        .cast("long")), lit(0L)).as("__terms"))
    km.agg(
        least(coalesce(min(col("t")), lit(horizonT)), lit(horizonT))
          .as("__f"),
        coalesce(max(col("n_risk")), lit(0L)).as("__nr"))
      .crossJoin(terms) // 1-row segment sum
      .select(lit(horizonT).as("horizon"),
        col("__nr").cast("bigint").as("n_subjects"),
        (col("__f") * 1000000L + col("__terms")).cast("bigint")
          .as("rmst_micros"))
  }

  /** Two-group log-rank test — the inferential companion to
    * [[kaplanMeier]] (the curve shows churn differs; this says
    * whether the difference survives chance): at each distinct event
    * time, compare group 1's observed events `d₁` against the
    * hypergeometric expectation `E = d·n₁/n` under "both curves
    * identical", accumulate `O₁−E₁` and the variance
    * `V = d·n₁·(n−n₁)·(n−d) / (n²·(n−1))`, and read
    * `z = (O₁−E₁)/√V` (χ² = z², 1 dof). The standard censoring rule
    * rides along from kaplanMeier: censored subjects are at risk at
    * their own time.
    *
    * Exactness: per-event-time E and V are the pico-scaled
    * truncating divisions `(d·n₁·10¹²) div n` and
    * `(d·n₁·(n−n₁)·(n−d)·10¹²) div (n²·(n−1))` — exact DECIMAL
    * integers, order-free sums (the averagePrecision device); times
    * with n ≤ 1 contribute nothing to V by definition. z is ONE
    * mirrored IEEE tree `(O₁·10¹² − ΣE) / (10⁶·√ΣV)` from exact
    * integers, through the shared [[Quality.pValueTwoSidedZ]]
    * polynomial. Degenerate inputs (either group empty, or zero
    * variance — e.g. no event time where both groups are at risk)
    * return empty. Returns one row (n_1, n_2, observed_1,
    * expected_1_micros, z_micros, p_micros).
    *
    * Scale: identical to [[kaplanMeier]] — one row-scale hash-agg to
    * the distinct-time table, cumulative windows over that
    * study-length-scale table only. */
  def logRank(df: DataFrame, durationExpr: Column,
      observedExpr: Column, groupExpr: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val rows = df.select(durationExpr.cast("long").as("t"),
        observedExpr.cast("boolean").as("obs"),
        groupExpr.cast("boolean").as("g"))
      .filter(col("t").isNotNull && col("t") >= 0 &&
        col("obs").isNotNull && col("g").isNotNull)
    val byT = rows.groupBy(col("t"))
      .agg(sum(when(col("obs") && col("g"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("g"), 1L).otherwise(0L)).as("exits1"),
        count(lit(1)).as("exits"))
      .localCheckpoint(true) // two consumers of the row-scale reduction
    val total = byT.agg(sum(col("exits")).as("__n0"),
      sum(col("exits1")).as("__n10"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = byT.crossJoin(broadcast(total)) // 1-row subject counts
      .withColumn("__n",
        col("__n0") - coalesce(sum(col("exits")).over(wBefore), lit(0L)))
      .withColumn("__n1",
        col("__n10") - coalesce(sum(col("exits1")).over(wBefore), lit(0L)))
      .filter(col("d") > 0L) // event times only
      // Quality.decimalDivTrunc, NOT SQL `div`: the pico-scaled
      // quotients reach d·10¹² and IntegralDivide wraps silently
      // past a long
      .select(col("__n0"), col("__n10"), col("d1"),
        Quality.decimalDivTrunc(
          col("d").cast(dec) * col("__n1") * lit(1000000000000L),
          col("__n").cast(dec)).as("__e"),
        when(col("__n") > 1L, Quality.decimalDivTrunc(
          col("d").cast(dec) * col("__n1") * (col("__n") - col("__n1")) *
            (col("__n") - col("d")) * lit(1000000000000L),
          col("__n").cast(dec) * col("__n") * (col("__n") - 1L)))
          .otherwise(lit(0).cast(dec)).as("__v"))
    val agg = terms.groupBy(col("__n0"), col("__n10"))
      .agg(sum(col("d1")).as("__o1"), sum(col("__e").cast(dec)).as("__ep"),
        sum(col("__v").cast(dec)).as("__vp"))
      .filter(col("__n10") > 0L && col("__n0") > col("__n10") &&
        col("__vp") > 0)
    val z = (col("__o1").cast(dec) * lit(1000000000000L) - col("__ep"))
      .cast("double") / (lit(1e6) * sqrt(col("__vp").cast("double")))
    agg.withColumn("__z", z)
      .select((col("__n10")).cast("bigint").as("n_1"),
        (col("__n0") - col("__n10")).cast("bigint").as("n_2"),
        col("__o1").cast("bigint").as("observed_1"),
        expr("CAST(__ep div 1000000 AS BIGINT)").as("expected_1_micros"),
        round(col("__z") * 1e6).cast("long").as("z_micros"),
        round(Quality.pValueTwoSidedZ(col("__z")) * 1e6).cast("long")
          .as("p_micros"))
  }

  /** COMPETING-RISKS cumulative incidence (Aalen-Johansen) — the
    * estimator [[kaplanMeier]] is WRONG for when more than one event
    * type removes a subject ("churned to rival" vs "churned
    * inactive": 1−KM per cause overstates both, because it treats
    * the other cause's exits as censoring that could still fail
    * later). CIF_k(t) = Σ_{u≤t} S(u⁻)·d_k(u)/n(u), where S is the
    * ALL-CAUSE survival — incidences sum to 1−S and never overstate.
    * Input: one row per subject (duration, cause — NULL cause =
    * right-censored). Returns one row per (event time, cause):
    * (t, cause, n_risk, n_events, cif_micros) — every observed
    * cause gets a row at every event time (d = 0 contributes 0), so
    * each cause's curve is complete.
    *
    * Exactness: the kaplanMeier discipline end to end — all-cause
    * ln(1−d/n) terms micro-rounded then integer-cumulated, S(u⁻)
    * ONE mirrored exp over the PRIOR cumulative (1.0 at the first
    * event time); per-(time, cause) increments
    * `round(10¹²·S(u⁻)·d_k/n)` pico-quantized then integer-cumulated
    * per cause; cif_micros is one truncating division of the
    * non-negative pico sum. After all-cause survival hits zero
    * (d = n), S(u⁻) for later times is exactly 0 by flag, not by a
    * NULL-swallowing sum.
    *
    * Scale: one row-scale hash-agg per axis (all-cause and
    * per-cause), a times × causes grid at study-length × cause-count
    * scale, ordered windows over that grid only. */
  def competingRisks(df: DataFrame, durationExpr: Column,
      causeExpr: Column): DataFrame = {
    val rows = df.select(durationExpr.cast("long").as("t"),
        causeExpr.cast("long").as("cause"))
      .filter(col("t").isNotNull && col("t") >= 0)
    val byT = rows.groupBy(col("t"))
      .agg(sum(when(col("cause").isNotNull, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("exits"))
      .localCheckpoint(true) // totals + grid + curve consumers
    val byTC = rows.filter(col("cause").isNotNull)
      .groupBy(col("t"), col("cause"))
      .agg(count(lit(1)).as("dk"))
    val causes = rows.select(col("cause")).filter(col("cause").isNotNull)
      .distinct()
    val total = byT.agg(sum(col("exits")).as("__n0"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // all-cause risk set, event-time rows only, S(u-) per time
    val km = byT.crossJoin(broadcast(total)) // 1-row subject count
      .withColumn("n_risk",
        col("__n0") - coalesce(sum(col("exits")).over(wBefore), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("__term",
        when(col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")) * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("__hit0_prev",
        coalesce(max(when(col("d") >= col("n_risk"), 1).otherwise(0))
          .over(wBefore), lit(0)))
      .withColumn("__lns_prev",
        coalesce(sum(col("__term")).over(wBefore), lit(0L)))
      .withColumn("__s_prev",
        when(col("__hit0_prev") === 1, lit(0.0))
          .otherwise(exp(col("__lns_prev").cast("double") / 1e6)))
      .select(col("t"), col("n_risk"), col("__s_prev"))
      .localCheckpoint(true) // grid join + per-cause windows
    val wCause = Window.partitionBy(col("cause")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km.crossJoin(broadcast(causes)) // times x causes grid
      .join(byTC, Seq("t", "cause"), "left")
      .withColumn("__dk", coalesce(col("dk"), lit(0L)))
      .withColumn("__inc",
        round(col("__s_prev") * col("__dk").cast("double") /
          col("n_risk").cast("double") * 1e12).cast("long"))
      .withColumn("__cum", sum(col("__inc")).over(wCause))
      .select(col("t"), col("cause").cast("bigint").as("cause"),
        col("n_risk").cast("bigint").as("n_risk"),
        col("__dk").cast("bigint").as("n_events"),
        expr("CAST(__cum div 1000000 AS BIGINT)").as("cif_micros"))
      .orderBy(col("cause"), col("t"))
  }
}
