package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` (backward, the default), the earliest with
  * `right.ts >= left.ts` (forward), or whichever of the two is
  * temporally closer (nearest; equal distance goes backward — the
  * pandas rule) on the same key — the time-series join the
  * reference's stack lacks entirely; standard in market/telemetry
  * analytics (the full pandas `merge_asof` direction surface).
  *
  * Implemented by composition, not a custom SparkPlan (SURVEY.md §4
  * preference (a)): tag both sides, union, then one window pass per
  * key ordered by (ts, side) carrying the nearest right payload
  * across — `last(..., ignoreNulls)` over an unbounded-preceding
  * frame (backward) or `first(..., ignoreNulls)` over an
  * unbounded-following frame (forward). Cost: one shuffle on the key
  * (same as any keyed join), one sort within partitions, no
  * range-explosion. At 100 TB this beats a range-condition join
  * (which Spark would plan as a broadcast nested loop or a cartesian
  * per key).
  */
object AsOf {

  /** Epoch seconds from a ts column of any supported type. Spark 4
    * refuses CAST(TIMESTAMP_NTZ AS BIGINT), so NTZ routes through
    * TIMESTAMP first (identity on the stored micros under a UTC
    * session zone); numeric ts columns cast directly. */
  private def epochSeconds(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => c.cast(TimestampType).cast("long")
    case _ => c.cast("long")
  }

  /** @param left      fact side (keeps all rows)
    * @param right     lookup side
    * @param keyCol    equality key present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (renamed as-is onto the output)
    * @param direction "backward" (latest right at-or-before, default)
    *                  or "forward" (earliest right at-or-after)
    * @param toleranceSeconds when set, a match farther than this from
    *                  the left timestamp is nulled out (pandas
    *                  merge_asof `tolerance`) — the row is kept, its
    *                  payload columns become NULL
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward" ||
      direction == "nearest",
      s"direction must be backward|forward|nearest (got $direction)")
    require(toleranceSeconds.forall(_ >= 0), "tolerance must be >= 0")
    val back = direction == "backward"
    // side marker ordering puts the right row INSIDE the frame at
    // equal ts: before left rows for backward (<=), after for
    // forward (>=). Nearest uses the backward marker and derives the
    // forward ordering from it (1 − side).
    val (leftSide, rightSide) =
      if (direction == "forward") (0, 1) else (1, 0)
    val lCols = left.columns
    val rtsType = right.schema(rightTs).dataType
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .withColumn("__rts", lit(null).cast(rtsType))
      .withColumns(payload.map(p => p -> lit(null).cast(right.schema(p).dataType)).toMap)
    val r = right.select((keyCol +: rightTs +: payload).map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__rts", col(rightTs)).drop(rightTs)
      .withColumn("__side", lit(rightSide))
      .withColumns(lCols.filterNot(c => c == keyCol || payload.contains(c))
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val outCols = lCols.filterNot(payload.contains) ++ payload :+
      "__ts" :+ "__side" :+ "__rts"
    val unioned = l.select(outCols.map(col): _*)
      .unionByName(r.select(outCols.map(col): _*))
    val matched = if (direction != "nearest") {
      val w0 = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      val w = if (back) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      def carry(c: Column): Column =
        if (back) last(c, ignoreNulls = true).over(w)
        else first(c, ignoreNulls = true).over(w)
      val carried = (payload :+ "__rts").foldLeft(unioned) { (df, p) =>
        df.withColumn(p, carry(col(p)))
      }
      carried.filter(col("__side") === leftSide)
    } else {
      // nearest: carry BOTH directions (each with its own tie
      // placement), then pick per left row by absolute distance —
      // ties go backward (the pandas merge_asof rule)
      val wb = Window.partitionBy(col(keyCol))
        .orderBy(col("__ts"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col(keyCol))
        .orderBy(col("__ts"), lit(1) - col("__side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val carried = (payload :+ "__rts").foldLeft(unioned) { (df, p) =>
        df.withColumn(s"__b_$p", last(col(p), ignoreNulls = true).over(wb))
          .withColumn(s"__f_$p", first(col(p), ignoreNulls = true).over(wf))
      }
      val lsec = epochSeconds(col(leftTs), left.schema(leftTs).dataType)
      val db = abs(lsec - epochSeconds(col("__b___rts"), rtsType))
      val dfw = abs(epochSeconds(col("__f___rts"), rtsType) - lsec)
      val useB = col("__b___rts").isNotNull &&
        (col("__f___rts").isNull || db <= dfw)
      val picked = (payload :+ "__rts").foldLeft(
        carried.filter(col("__side") === leftSide)) { (df, p) =>
        df.withColumn(p,
          when(useB, col(s"__b_$p")).otherwise(col(s"__f_$p")))
      }
      picked.drop((payload :+ "__rts")
        .flatMap(p => Seq(s"__b_$p", s"__f_$p")): _*)
    }
    val bounded = toleranceSeconds match {
      case None => matched
      case Some(tol) =>
        // out-of-tolerance matches null out; the left row survives
        val within = abs(epochSeconds(col(leftTs), left.schema(leftTs).dataType) -
          epochSeconds(col("__rts"), rtsType)) <= tol
        payload.foldLeft(matched)((df, p) =>
          df.withColumn(p, when(within, col(p))))
    }
    bounded.drop("__ts", "__side", "__rts")
  }

  /** Skew escape hatch: [[joinAsOf]] with the time axis sliced into
    * `sliceSeconds` buckets — the per-key window that serializes a
    * hot key (one celebrity user = one task) becomes one window per
    * (key, slice), so a key spanning S slices runs S parallel tasks.
    *
    * Boundary carry keeps it EXACT, not approximate: a left row's
    * match can precede its slice, so each (key, slice) is seeded with
    * a carry-in row — the key's latest right row before the slice
    * start (earliest after the slice end, for forward). Carry-ins are
    * computed on per-slice SUMMARIES (one extremal row per key-slice,
    * slice-scale not row-scale) via a recursive [[joinAsOf]], then the
    * main join runs [[joinAsOf]] verbatim on a composite (key, slice)
    * struct key — same window logic, finer partitions. Result is
    * pinned row-equal to the plain form by AsOfSpec properties.
    *
    * Cost: one extra slice-scale shuffle + window for the carry
    * table. Use when a key's row count outgrows one task (the 100×
    * posture note in SURVEY §2.4); the plain form is cheaper when
    * keys are well distributed. */
  def joinAsOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      sliceSeconds: Long, direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(sliceSeconds > 0, s"sliceSeconds must be > 0 (got $sliceSeconds)")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    val back = direction == "backward"
    val rtsType = right.schema(rightTs).dataType
    val ltsType = left.schema(leftTs).dataType
    def sliceOf(ts: Column, dt: DataType): Column =
      floor(epochSeconds(ts, dt) / sliceSeconds).cast("long")

    // per-(key, slice) extremal right row: the only candidate an
    // out-of-slice left probe can match (latest for backward carry-in,
    // earliest for forward carry-out)
    val rCols = (keyCol +: rightTs +: payload).map(col)
    val extremal = {
      val pick = struct(epochSeconds(col(rightTs), rtsType) +: rCols: _*)
      if (back) max(pick) else min(pick)
    }
    val summaries = right.select(rCols: _*)
      .groupBy(col(keyCol), sliceOf(col(rightTs), rtsType).as("__slice"))
      .agg(extremal.as("__x"))
      .select(Seq(col(keyCol), col("__slice"),
        col(s"__x.$rightTs").as(rightTs)) ++
          payload.map(p => col(s"__x.$p").as(p)): _*)

    // every (key, slice) the LEFT probes, with a probe ts just outside
    // the slice: backward = slice start minus 1 MICROSECOND (timestamp
    // precision — a 1-second step would miss sub-second rights near
    // the boundary), forward = exactly the slice end (rows there
    // belong to the next slice by floor). timestamp_micros keeps both
    // exact; the cast folds to integer seconds for long ts columns.
    val probeTs =
      if (back) timestamp_micros(col("__slice") * sliceSeconds * 1000000L - 1)
        .cast(rtsType)
      else timestamp_micros((col("__slice") + 1) * sliceSeconds * 1000000L)
        .cast(rtsType)
    val probes = left
      .select(col(keyCol), sliceOf(col(leftTs), ltsType).as("__slice")).distinct()
      .withColumn("__probe_ts", probeTs)
    // slice-scale as-of: each probe picks the key's nearest summary
    // outside its slice; carry the matched row's ORIGINAL ts through
    // the payload so tolerance still sees the true distance
    val withOrig = summaries.withColumn("__orig_rts", col(rightTs))
    val carry = joinAsOf(
        probes.select(col(keyCol), col("__slice"), col("__probe_ts")),
        withOrig.drop("__slice"), keyCol, "__probe_ts", rightTs,
        payload :+ "__orig_rts", direction)
      .filter(col("__orig_rts").isNotNull)
      .select(Seq(col(keyCol), col("__slice"),
        col("__orig_rts").as(rightTs)) ++ payload.map(col): _*)

    // composite-key join: raw rows in their own slice + carry rows
    // seeded into each probed slice, through joinAsOf VERBATIM
    val kslice = struct(col(keyCol), col("__slice"))
    val l2 = left.withColumn("__slice", sliceOf(col(leftTs), ltsType))
      .withColumn("__kslice", kslice)
    val r2 = right.select(rCols: _*)
      .withColumn("__slice", sliceOf(col(rightTs), rtsType))
      .unionByName(carry)
      .withColumn("__kslice", kslice)
      .drop("__slice")
    joinAsOf(l2, r2, "__kslice", leftTs, rightTs, payload,
        direction, toleranceSeconds)
      .drop("__kslice", "__slice")
  }
}
