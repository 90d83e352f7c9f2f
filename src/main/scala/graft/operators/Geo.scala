package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar proximity joins on integer grids — the spatial-join pattern
  * (bucket to cells, probe the 3×3 neighborhood, verify exactly)
  * without a geometry library: callers scale their coordinates to
  * non-negative integers first (fixed-point lon/lat offsets, screen
  * or warehouse coordinates, projected meters), which keeps every
  * distance an EXACT integer a second engine replays and sidesteps
  * the trunc-vs-floor division trap on negatives entirely.
  *
  * Scale: the candidate set is |a| × (points of b in the 9 cells
  * around each a-row) — locality makes that near-linear on real
  * point sets, and the cell-occupancy pre-flight fails loudly when a
  * degenerate b (everything in one cell) would detonate the join
  * into all-pairs. All shuffles are fixed-width (cell key, ids,
  * coordinates); no nested-loop join anywhere.
  */
object Geo {

  /** All pairs (a, b) within `radius` (Euclidean, inclusive) on the
    * integer plane: returns `aId`, `bId`, `dist2` = the exact squared
    * distance. Cell side = `radius`, so any within-radius pair sits
    * in the same or an adjacent cell — the 3×3 probe is EXHAUSTIVE,
    * not approximate; the final `dist2 <= radius²` filter is exact
    * long arithmetic. Coordinates must be non-negative (loud
    * pre-flight — scale to offsets first) and small enough that
    * squared differences fit a long (|coord| < 2³¹, plenty for
    * fixed-point geo). `maxCellPoints` guards the b-side cell
    * occupancy (one cell-keyed count, cheap next to the join it
    * protects). */
  def radiusJoin(a: DataFrame, aIdCol: String, b: DataFrame,
      bIdCol: String, xCol: String, yCol: String, radius: Long,
      maxCellPoints: Long = 100000L): DataFrame = {
    require(radius > 0, s"radius must be > 0 (got $radius)")
    def prep(df: DataFrame, idCol: String, idOut: String) = {
      val p = df.select(col(idCol).cast("long").as(idOut),
        col(xCol).cast("long").as(s"__x_$idOut"),
        col(yCol).cast("long").as(s"__y_$idOut"))
      val bad = p.filter(col(s"__x_$idOut") < 0 || col(s"__y_$idOut") < 0 ||
          col(s"__x_$idOut").isNull || col(s"__y_$idOut").isNull)
        .limit(1).collect()
      require(bad.isEmpty,
        s"radiusJoin needs non-negative integer coordinates (row $idOut=" +
          s"${bad.headOption.map(_.get(0)).orNull} violates) — scale to " +
          "offsets first; negative-coordinate cell math is the " +
          "trunc-vs-floor trap this operator refuses to enter")
      p
    }
    val pa = prep(a, aIdCol, "a_id")
    val pb = prep(b, bIdCol, "b_id")
      .withColumn("__cx", expr(s"__x_b_id div ${radius}L"))
      .withColumn("__cy", expr(s"__y_b_id div ${radius}L"))
    val occ = pb.groupBy(col("__cx"), col("__cy"))
      .agg(count(lit(1)).as("__n")).agg(max(col("__n")).as("__m"))
      .collect()
    val worst = if (occ.isEmpty || occ.head.isNullAt(0)) 0L
      else occ.head.getLong(0)
    require(worst <= maxCellPoints,
      s"a grid cell holds $worst b-side points (cap $maxCellPoints) — " +
        "the 3x3 probe would degenerate toward all-pairs; shrink the " +
        "radius, thin the point set, or raise the cap deliberately")
    val offsets = Seq(-1L, 0L, 1L)
    val probe = pa
      .withColumn("__off", explode(typedLit(
        for (dx <- offsets; dy <- offsets) yield (dx, dy))))
      .withColumn("__cx", expr(s"__x_a_id div ${radius}L") + col("__off._1"))
      .withColumn("__cy", expr(s"__y_a_id div ${radius}L") + col("__off._2"))
      .drop("__off")
    val dx = col("__x_a_id") - col("__x_b_id")
    val dy = col("__y_a_id") - col("__y_b_id")
    probe.join(pb, Seq("__cx", "__cy"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= radius * radius)
      .select(col("a_id").as(aIdCol), col("b_id").as(bIdCol), col("dist2"))
  }
}
