package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (the time-series join the
  * reference's stack lacks entirely; standard in market/telemetry
  * analytics).
  *
  * Implemented by composition, not a custom SparkPlan (SURVEY.md §4
  * preference (a)): tag both sides, union, then one window pass per
  * key ordered by (ts, side) carrying the last seen right payload
  * forward — `last(..., ignoreNulls)` over an unbounded-preceding
  * frame. Cost: one shuffle on the key (same as any keyed join), one
  * sort within partitions, no range-explosion. At 100 TB this beats a
  * range-condition join (which Spark would plan as a broadcast
  * nested loop or a cartesian per key).
  */
object AsOf {

  /** @param left      fact side (keeps all rows)
    * @param right     lookup side
    * @param keyCol    equality key present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (renamed as-is onto the output)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // side marker: right rows sort before left rows at equal ts so a
    // simultaneous right row is visible to the left row (<= semantics)
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p => p -> lit(null).cast(right.schema(p).dataType)).toMap)
    val r = right.select((keyCol +: rightTs +: payload).map(col): _*)
      .withColumn("__ts", col(rightTs)).drop(rightTs)
      .withColumn("__side", lit(0))
      .withColumns(lCols.filterNot(c => c == keyCol || payload.contains(c))
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val unioned = l.select((lCols.filterNot(payload.contains) ++ payload
      :+ "__ts" :+ "__side").map(col): _*)
      .unionByName(r.select((lCols.filterNot(payload.contains) ++ payload
        :+ "__ts" :+ "__side").map(col): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
