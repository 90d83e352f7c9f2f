package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature generation via grouped percentiles (reference theme P4,
  * README.md:233-272): compute per-group multi-quantiles, join them
  * back to the fact rows, and bucket each value with a CASE ladder.
  *
  * Two forms are provided and property-tested equal:
  *  - [[bucketByJoin]] — the reference's 2016 shape (GROUP BY +
  *    self-join, README.md:236-261). The aggregate side has one row
  *    per distinct key; the join back is left UNHINTED so Catalyst's
  *    size estimate (and AQE's runtime re-plan) picks broadcast when
  *    the key cardinality is small and degrades to sort-merge when it
  *    is not — a forced broadcast hint would bypass the size check and
  *    OOM on a 10⁸-key corpus. PlanSpec pins both regimes.
  *  - [[bucketByWindow]] — the idiomatic rewrite with a single
  *    `percent_rank()` window (one shuffle on the group key, no join).
  *    The documented path when the key cardinality is itself huge.
  *
  * `exact=false` swaps the memory-heavy exact `percentile` (a
  * TypedImperativeAggregate buffering each group's values) for
  * `percentile_approx` (bounded-size QuantileSummaries sketch) — the
  * 100 TB path, same operator surface. `accuracy` is the sketch's
  * size/error knob (Spark default 10000): the sketch is exact while a
  * group's row count stays under ~accuracy, so lower accuracies are
  * both cheaper and still exact for small groups; at 100 TB keep it
  * at 10⁴ for ±10⁻⁴ relative-rank error.
  */
object Percentiles {

  val defaultPs: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99)

  /** Shared pre-flight for every exact order-statistic aggregate in
    * the engine (here and the [[Quality]] family): fail LOUDLY before
    * launching an exact `percentile`/`percentile_disc` whose
    * per-group buffer would exceed `maxExactGroupRows` values. One
    * cheap key-column-only hash-agg (counts NULL-valued rows too —
    * the guard may over-trigger, never under-trigger); pass
    * `Long.MaxValue` to skip when group sizes are known. `what` names
    * the calling operator in the error. */
  private[graft] def guardExactGroups(df: DataFrame, keyCol: String,
      maxExactGroupRows: Long, what: String): Unit = {
    if (maxExactGroupRows < Long.MaxValue) {
      val over = df.select(col(keyCol))
        .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxExactGroupRows)
        .limit(1).collect() // pre-flight verdict: zero or one row
      require(over.isEmpty,
        s"exact $what would buffer ${over.head.getLong(1)} values " +
          s"for group ${keyCol}=${over.head.get(0)} (cap $maxExactGroupRows) " +
          "— use exact=false (percentile_approx, bounded sketch), " +
          "or raise maxExactGroupRows if the executors are sized for it")
    }
  }

  /** Per-key percentile array: one row per key, `percentiles` =
    * array<double> indexed like the reference's `p.percentiles[k]`
    * (README.md:239-258).
    *
    * Memory guard: exact `percentile` BUFFERS every group value in
    * the aggregate's memory — the one aggregate here that can OOM an
    * executor when a group grows 100×. When `exact`, a pre-flight
    * narrow count over (key) fails loudly if any group exceeds
    * `maxExactGroupRows` (default 10M values ≈ 80 MB of doubles per
    * group buffer), naming the offending key and the two bounded
    * alternatives. The pre-flight is one cheap hash-agg over the key
    * column — small next to buffering the values themselves; pass
    * `maxExactGroupRows = Long.MaxValue` to skip it when group sizes
    * are known. */
  def grouped(df: DataFrame, keyCol: String, valueExpr: Column,
      ps: Seq[Double] = defaultPs, exact: Boolean = true,
      accuracy: Int = 10000,
      maxExactGroupRows: Long = 10000000L): DataFrame = {
    val arr = s"array(${ps.mkString(",")})"
    if (exact) guardExactGroups(df, keyCol, maxExactGroupRows, "percentile")
    val call =
      if (exact) s"percentile(__v, $arr)"
      else s"percentile_approx(__v, $arr, $accuracy)"
    df.withColumn("__v", valueExpr)
      .groupBy(col(keyCol))
      .agg(expr(call).as("percentiles"))
  }

  /** WEIGHTED discrete percentile per key — the family member the
    * unweighted forms cannot fake (the quantity-weighted median price
    * asks "the price of the median UNIT SOLD", not of the median line
    * item): the smallest value v whose cumulative weight reaches
    * `p`·totalWeight — the weighted `percentile_disc` convention
    * (rank-based, returns an ACTUAL data value, bit-exact on any
    * engine; interpolation on weights is a modeling choice this
    * operator deliberately refuses).
    *
    * Exactness: weights aggregate per distinct value (exact longs in
    * DECIMAL), the threshold test is the cross-multiplied integer
    * comparison `cumW·10⁶ ≥ p_micros·totalW` (never a double ratio),
    * and the pick is `min(v | test)` — total by construction.
    * Non-positive weights are REFUSED rows (filtered with the NULLs:
    * a zero-weight observation cannot move a weighted rank).
    * Returns one row per key: (key, total_weight, value).
    *
    * Scale: one row-scale hash-agg to (key, value) weight cells,
    * then DISTINCT-VALUE-scale windows partitioned by key (the
    * grouped-percentile contract: per-key distinct values fit a
    * partition) and one final hash-agg. */
  def weightedPercentileDisc(df: DataFrame, keyCol: String,
      valueExpr: Column, weightExpr: Column,
      pMicros: Long = 500000L): DataFrame = {
    require(pMicros > 0L && pMicros <= 1000000L,
      s"pMicros must be in (0, 1e6] (got $pMicros)")
    val dec = "decimal(38,0)"
    val vc = df.select(col(keyCol).as("__k"),
        valueExpr.cast("long").as("__v"),
        weightExpr.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull &&
        col("__w") > 0L)
      .groupBy(col("__k"), col("__v"))
      .agg(sum(col("__w")).as("__w"))
    val wCum = Window.partitionBy(col("__k")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    vc.withColumn("__cw", sum(col("__w")).over(wCum))
      .withColumn("__tw", sum(col("__w")).over(wAll))
      .groupBy(col("__k"), col("__tw"))
      .agg(min(when(col("__cw").cast(dec) * 1000000L >=
        lit(pMicros).cast(dec) * col("__tw"), col("__v"))).as("value"))
      .select(col("__k").as(keyCol),
        col("__tw").cast("bigint").as("total_weight"), col("value"))
  }

  /** The reference's 12-arm CASE ladder (README.md:238-251): label a
    * value with the decile band it falls into, given the percentile
    * array. `<= p[0]` → "10", `<= p[1]` → "20", …, else "99+". */
  def bucketLadder(value: Column, pctArray: Column,
      ps: Seq[Double] = defaultPs): Column = {
    val labels = ps.map(p => ((p * 100).round).toString)
    val ladder = ps.indices.foldLeft(Option.empty[Column]) { (acc, i) =>
      val cond = value <= pctArray.getItem(i)
      Some(acc match {
        case None => when(cond, lit(labels(i)))
        case Some(c) => c.when(cond, lit(labels(i)))
      })
    }
    ladder.get.otherwise(lit("99+"))
  }

  /** Join form (reference shape, README.md:252-261): fact ⋈ per-key
    * percentiles, then the ladder. The join is deliberately unhinted —
    * Catalyst/AQE broadcasts the aggregate when its size estimate fits
    * `autoBroadcastJoinThreshold` and falls back to sort-merge when the
    * key cardinality makes a broadcast unsafe (see class doc). */
  def bucketByJoin(fact: DataFrame, keyCol: String, valueExpr: Column,
      outCols: Seq[String], ps: Seq[Double] = defaultPs,
      exact: Boolean = true, accuracy: Int = 10000,
      maxExactGroupRows: Long = 10000000L): DataFrame = {
    val withV = fact.withColumn("__v", valueExpr)
    val aggs = grouped(fact, keyCol, valueExpr, ps, exact, accuracy,
      maxExactGroupRows)
    withV.join(aggs, Seq(keyCol))
      .withColumn("bucket", bucketLadder(col("__v"), col("percentiles"), ps))
      .select((keyCol +: outCols :+ "bucket").map(col): _*)
  }

  /** Sketch form: per-key KLL quantile sketches → quantile array →
    * the same join-back ladder. Unlike `percentile_approx`'s opaque
    * buffer, the KLL aggregate side is a plain binary column, so at
    * 100 TB it can be PERSISTED and refreshed incrementally — merge
    * new partitions' sketches instead of rescanning history (the
    * bucketing twin of `sketch_kll_persist`). Rank error at k=200 is
    * ~1.65%, so bucket labels can disagree with the exact form only
    * for values within that rank band of a decile boundary. */
  def bucketBySketch(fact: DataFrame, keyCol: String, valueExpr: Column,
      outCols: Seq[String], ps: Seq[Double] = defaultPs,
      k: Int = 200): DataFrame = {
    val withV = fact.withColumn("__v", valueExpr)
    val aggs = withV.groupBy(col(keyCol))
      .agg(graft.functions.kll_sketch_agg(col("__v"), k).as("__sk"))
      .select(col(keyCol), array(ps.map(p =>
        graft.functions.kll_quantile(col("__sk"), lit(p))): _*).as("percentiles"))
    withV.join(aggs, Seq(keyCol))
      .withColumn("bucket", bucketLadder(col("__v"), col("percentiles"), ps))
      .select((keyCol +: outCols :+ "bucket").map(col): _*)
  }

  /** Window form: same bucketing from a single `percent_rank()` pass.
    * Note percent_rank gives rank/(n-1) which is the inverse view of
    * the interpolated percentile; the two forms agree on bucket labels
    * for values that sit on group order statistics (property-tested). */
  def bucketByWindow(fact: DataFrame, keyCol: String, valueExpr: Column,
      outCols: Seq[String], ps: Seq[Double] = defaultPs): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(valueExpr)
    val pr = percent_rank().over(w)
    val labels = ps.map(p => ((p * 100).round).toString)
    val ladder = ps.indices.foldLeft(Option.empty[Column]) { (acc, i) =>
      val cond = pr <= ps(i)
      Some(acc match {
        case None => when(cond, lit(labels(i)))
        case Some(c) => c.when(cond, lit(labels(i)))
      })
    }
    fact.withColumn("bucket", ladder.get.otherwise(lit("99+")))
      .select((keyCol +: outCols :+ "bucket").map(col): _*)
  }
}
