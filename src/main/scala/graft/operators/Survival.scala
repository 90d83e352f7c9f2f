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
}
