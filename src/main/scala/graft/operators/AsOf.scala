package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` (backward, the default) or the earliest with
  * `right.ts >= left.ts` (forward) on the same key — the time-series
  * join the reference's stack lacks entirely; standard in
  * market/telemetry analytics (pandas `merge_asof` surface).
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
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    require(toleranceSeconds.forall(_ >= 0), "tolerance must be >= 0")
    val back = direction == "backward"
    // side marker ordering puts the right row INSIDE the frame at
    // equal ts: before left rows for backward (<=), after for
    // forward (>=)
    val (leftSide, rightSide) = if (back) (1, 0) else (0, 1)
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
    val w0 = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
    val w = if (back) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def carry(c: Column): Column =
      if (back) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val carried = (payload :+ "__rts").foldLeft(unioned) { (df, p) =>
      df.withColumn(p, carry(col(p)))
    }
    val matched = carried.filter(col("__side") === leftSide)
    val bounded = toleranceSeconds match {
      case None => matched
      case Some(tol) =>
        // out-of-tolerance matches null out; the left row survives
        val within = abs(col(leftTs).cast("long") - col("__rts").cast("long")) <= tol
        payload.foldLeft(matched)((df, p) =>
          df.withColumn(p, when(within, col(p))))
    }
    bounded.drop("__ts", "__side", "__rts")
  }
}
