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

  /** Nearest neighbor WITHIN a radius cap — the lookup
    * [[radiusJoin]]'s pair dump doesn't answer directly: for each
    * a-point, its single closest b-point by exact squared Euclidean
    * distance, ties broken by smallest b id (deterministic — two
    * engines agree). The cap is the honest distributed contract: an
    * UNCAPPED global nearest neighbor degenerates to all-pairs for
    * isolated points, while "nearest within r, else NULL" is one
    * exhaustive 3×3 probe (cell side = r) plus a min — and the NULL
    * rows surface exactly the isolated points a caller should know
    * about. Returns one row per a-point:
    * (aId, bId nullable, dist2 nullable, matched).
    *
    * Scale: the [[radiusJoin]] candidate set plus one a-keyed min
    * aggregation (min over a (dist2, b_id) struct — fixed-width) and
    * one left join-back; same cell-occupancy pre-flight. */
  def nearestNeighbor(a: DataFrame, aIdCol: String, b: DataFrame,
      bIdCol: String, xCol: String, yCol: String, maxRadius: Long,
      maxCellPoints: Long = 100000L): DataFrame = {
    val pairs = radiusJoin(a, aIdCol, b, bIdCol, xCol, yCol,
      maxRadius, maxCellPoints)
    val best = pairs.groupBy(col(aIdCol))
      .agg(min(struct(col("dist2"), col(bIdCol))).as("__b"))
      .select(col(aIdCol), col(s"__b.$bIdCol").as(bIdCol),
        col("__b.dist2").as("dist2"))
    a.select(col(aIdCol).cast("long").as(aIdCol)).distinct()
      .join(best, Seq(aIdCol), "left")
      .withColumn("matched", col(bIdCol).isNotNull)
      .select(col(aIdCol), col(bIdCol), col("dist2"), col("matched"))
  }

  /** Grid-cell hotspot screen — WHERE does the point set concentrate:
    * bucket to `cellSize` cells, score each occupied cell's count
    * against the bounding-grid density (`z = (n·T − N)/√(T·Σn² − N²)`
    * over all T grid cells, empties included — a hotspot is dense
    * relative to the STUDY AREA, not to other hotspots), and report
    * cells at `z ≥ zMin` with their 3×3 neighborhood count riding
    * along (the smoothed reading that separates an isolated spike
    * from a dense REGION). The binned density screen — cheap,
    * deterministic, the step before a proper spatial-statistics
    * package.
    *
    * Exactness: counts, T, and the z numerator/denominator are exact
    * integers (DECIMAL products); z is ONE mirrored IEEE division,
    * micro-quantized; the threshold compares the unrounded double
    * (mirrored). Same non-negative-integer-coordinate contract as
    * [[radiusJoin]]; a degenerate grid (zero variance — everything
    * uniform or one cell) returns empty.
    *
    * Scale: one row-scale hash-agg to occupied cells; the
    * neighborhood sum is a 9-offset explode + equi-join on the
    * CELL table (occupied-cell scale); totals are one 1-row
    * aggregate. */
  def hotspot(df: DataFrame, xCol: String, yCol: String,
      cellSize: Long, zMinMicros: Long = 2000000L): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0 (got $cellSize)")
    val dec = "decimal(38,0)"
    val p = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val bad = p.filter(col("__x") < 0 || col("__y") < 0).limit(1).collect()
    require(bad.isEmpty,
      "hotspot needs non-negative integer coordinates — scale to " +
        "offsets first (the radiusJoin contract)")
    val cells = p
      .withColumn("cx", expr(s"__x div ${cellSize}L"))
      .withColumn("cy", expr(s"__y div ${cellSize}L"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // three consumers: totals, target, nbhd
    val tot = cells.agg(sum(col("n")).as("__nn"),
      sum(col("n").cast(dec) * col("n")).as("__q"),
      ((max(col("cx")) + 1L).cast(dec) * (max(col("cy")) + 1L))
        .as("__t"))
    val offsets = for (ox <- Seq(-1L, 0L, 1L); oy <- Seq(-1L, 0L, 1L))
      yield (ox, oy)
    val nbhd = cells
      .withColumn("__off", explode(typedLit(offsets)))
      .select((col("cx") + col("__off._1")).as("cx"),
        (col("cy") + col("__off._2")).as("cy"), col("n"))
      .groupBy(col("cx"), col("cy")).agg(sum(col("n")).as("n_nbhd"))
    val z = (col("n").cast(dec) * col("__t") - col("__nn"))
      .cast("double") /
      sqrt((col("__t") * col("__q") - col("__nn").cast(dec) *
        col("__nn")).cast("double"))
    cells.join(nbhd, Seq("cx", "cy"))
      .crossJoin(broadcast(tot)) // 1-row totals
      .filter(col("__t") * col("__q") -
        col("__nn").cast(dec) * col("__nn") > 0)
      .withColumn("__z", z)
      .filter(col("__z") >= lit(zMinMicros.toDouble / 1e6))
      .select(col("cx").cast("bigint").as("cx"),
        col("cy").cast("bigint").as("cy"),
        col("n").cast("bigint").as("n"),
        col("n_nbhd").cast("bigint").as("n_nbhd"),
        round(col("__z") * 1e6).cast("long").as("z_micros"))
      .orderBy(col("cx"), col("cy"))
  }
}
