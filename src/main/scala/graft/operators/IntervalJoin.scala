package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** Point-in-interval (range) join — "which intervals contain this
  * timestamp" — the temporal join the reference's stack has no answer
  * for and that naive Spark gets catastrophically wrong: a join whose
  * only condition is `p.ts BETWEEN i.start AND i.end` has no equality
  * key, so Catalyst plans BroadcastNestedLoopJoin (or a cartesian),
  * which is O(|points| x |intervals|) and dies at scale.
  *
  * The scale shape: quantize time into fixed buckets. Each interval
  * is exploded to the buckets it overlaps; each point maps to exactly
  * ONE bucket — so the join becomes a plain shuffled equi-join on
  * (keys..., bucket) with the exact containment predicate evaluated
  * as a post-join filter, and no (point, interval) pair can appear
  * twice (the point's bucket is unique). Cost: one shuffle of each
  * side on an 8-byte composite key plus `ceil(len/bucket)` replicas
  * per interval — choose `bucketSeconds` near the typical interval
  * length so the replication factor stays 1-2.
  *
  * At 100 TB this is the only viable plan: both sides partition by
  * (key, bucket), long intervals fan out instead of forcing a
  * broadcast, and AQE handles bucket skew like any other equi-join
  * key. An interval longer than `maxBucketsPerInterval` buckets
  * fails loudly (raise_error) rather than silently exploding a task —
  * same fail-loud posture as Graph.connectedComponents past maxIter.
  *
  * STREAMING: [[pointInInterval]] also accepts a STREAMING `points`
  * side against static `intervals` — the bucket column is a stateless
  * row-local projection and the join is a plain stream-static inner
  * equi-join, so it runs in append mode with no state store at all
  * (IntervalJoinSpec pins it; the streaming enrichment shape —
  * "which campaign window does this live event fall in").
  */
object IntervalJoin {

  /** Epoch seconds for any temporal or numeric column. TIMESTAMP_NTZ
    * and DATE have no direct cast to BIGINT — route them through
    * TIMESTAMP (session-tz interpretation; consistent across both
    * sides, and the exact containment post-filter compares the
    * ORIGINAL columns, so bucketing only needs consistency). */
  private def seconds(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType | DateType =>
      c.cast(TimestampType).cast("long")
    case _ => c.cast("long")
  }

  /** @param points     side with one timestamp column per row
    * @param intervals  side with [startTs, endTs] columns (inclusive
    *                   both ends, SQL BETWEEN semantics)
    * @param pointTs    point timestamp column name
    * @param startTs    interval start column name (on intervals)
    * @param endTs      interval end column name (on intervals)
    * @param keys       optional equality keys present on BOTH sides
    *                   (e.g. user_id); empty = pure range join
    * @param bucketSeconds quantization width; pick ~ the typical
    *                   interval length (p50-p90)
    * @param maxBucketsPerInterval loud-failure cap on per-interval
    *                   fan-out (default 4096)
    *
    * Non-key column names must be disjoint across the two sides
    * (rename before calling); output carries all columns of both.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startTs: String, endTs: String,
      keys: Seq[String] = Nil, bucketSeconds: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bucketOf(dt: DataType, c: Column): Column =
      floor(seconds(dt, c) / lit(bucketSeconds)).cast("long")
    val b0 = bucketOf(intervals.schema(startTs).dataType, col(startTs))
    val b1 = bucketOf(intervals.schema(endTs).dataType, col(endTs))
    val guarded = when(b1 - b0 >= lit(maxBucketsPerInterval.toLong),
        raise_error(concat(lit(s"IntervalJoin: interval spans >= " +
          s"$maxBucketsPerInterval buckets of ${bucketSeconds}s — raise " +
          "bucketSeconds or split the interval (start="), col(startTs)
          .cast("string"), lit(")"))))
      .otherwise(b1)
    val ib = intervals
      .filter(col(endTs) >= col(startTs)) // empty intervals match nothing
      .withColumn("__b", explode(sequence(b0, guarded)))
    val pb = points.withColumn("__b",
      bucketOf(points.schema(pointTs).dataType, col(pointTs)))
    pb.join(ib, (keys :+ "__b").toSeq, "inner")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__b")
  }

  /** Interval-overlap join: all (left, right) pairs whose intervals
    * intersect (`l.start <= r.end AND r.start <= l.end`, ends
    * inclusive) — session-collision / concurrent-campaign analytics.
    * Same bucketization as [[pointInInterval]]; both sides explode,
    * and since two overlapping intervals share EVERY bucket their
    * overlap covers, the pair is kept only in the bucket where the
    * overlap STARTS (`max(l.start, r.start)`'s bucket — a bucket both
    * sides provably contain), so each pair appears exactly once
    * without a distinct. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keys: Seq[String] = Nil, bucketSeconds: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bucketOf(dt: DataType, c: Column): Column =
      floor(seconds(dt, c) / lit(bucketSeconds)).cast("long")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = bucketOf(df.schema(s).dataType, col(s))
      val b1 = bucketOf(df.schema(e).dataType, col(e))
      val guarded = when(b1 - b0 >= lit(maxBucketsPerInterval.toLong),
          raise_error(concat(lit(s"IntervalJoin: interval spans >= " +
            s"$maxBucketsPerInterval buckets of ${bucketSeconds}s — raise " +
            "bucketSeconds or split the interval (start="), col(s)
            .cast("string"), lit(")"))))
        .otherwise(b1)
      df.filter(col(e) >= col(s)).withColumn("__b", explode(sequence(b0, guarded)))
    }
    val lb0 = bucketOf(left.schema(lStart).dataType, col(lStart))
    val rb0 = bucketOf(right.schema(rStart).dataType, col(rStart))
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), (keys :+ "__b").toSeq, "inner")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") === greatest(lb0, rb0))
      .drop("__b")
  }
}
