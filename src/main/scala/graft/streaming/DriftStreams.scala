package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Merge, Quality}

/** Streaming drift monitoring — the micro-batch form of
  * [[graft.operators.Quality.driftReport]]: each batch buckets only
  * ITS rows with the monitor's fixed integer bucketing and adds them
  * into a versioned count snapshot; the drift report then compares
  * the ACCUMULATED stream distribution against a frozen reference
  * histogram. Counts are additive where raw values are not, so the
  * monitor never re-reads history — state is O(nBuckets), not
  * O(rows ever seen).
  *
  * Snapshots are versioned exactly like [[SketchStreams]] /
  * [[graft.operators.Merge.applyChangeBatch]]: `dir/v=<batchId>`,
  * `_SUCCESS`-gated reads, idempotent batch replay (a redelivered
  * batch rebuilds its snapshot from the version BELOW it — a
  * deterministic rewrite, never a double-count),
  * [[graft.operators.Merge.retainSnapshots]] for retention.
  *
  * The verdicts inherit driftReport's exactness: integer bucketing
  * (NULLs to bucket -1, feeding the totals), cross-multiplied
  * DECIMAL(38,0) share comparison — a batch-accumulated report is
  * VALUE-IDENTICAL to running the batch form over the union of every
  * batch's rows, which is the replay identity `dq_drift_stream`
  * grades.
  */
object DriftStreams {

  /** `foreachBatch` body:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   DriftStreams.applyDriftBatch(dir, id, b, col("v"),
    *     lo = 1, width = 5, nBuckets = 10)
    * }
    * }}} */
  def applyDriftBatch(targetBase: String, batchId: Long, batch: DataFrame,
      valueExpr: Column, lo: Long, width: Long, nBuckets: Int): Unit = {
    require(width > 0 && nBuckets > 0, "width and nBuckets must be positive")
    val spark = batch.sparkSession
    val fresh = Quality.bucketCounts(batch, valueExpr, lo, width, nBuckets, "n")
    val merged = Merge.latestSnapshotVersion(spark, targetBase,
        below = batchId) match {
      case Some(v) =>
        spark.read.parquet(s"$targetBase/v=$v")
          .unionByName(fresh)
          .groupBy(col("bucket")).agg(sum(col("n")).as("n"))
      case None => fresh
    }
    merged.write.mode("overwrite").parquet(s"$targetBase/v=$batchId")
  }

  /** `foreachBatch` body for the KS→FDR drift battery — the
    * streaming fold of [[graft.operators.OrderedStats.ksBattery]]'s
    * sufficient statistic: `shaped` is the batch's monitoring rows
    * pre-framed as (metric STRING, v, t BOOLEAN) (metric = the panel
    * cell, v = the metric's value, t = the A/B split tag); the batch
    * reduces to per-(metric, value) side counts and folds them into
    * the versioned snapshot. Counts are additive, so the snapshot
    * after batch k equals the count table over the union of batches
    * 0..k — the exact KS sufficient statistic, with the same
    * idempotent-redelivery contract as [[applyDriftBatch]] (a
    * redelivered batch rebuilds its version from the one BELOW it).
    * State is O(distinct (metric, value)), never O(rows). */
  def applyKsBatch(targetBase: String, batchId: Long,
      shaped: DataFrame): Unit = {
    val spark = shaped.sparkSession
    val fresh = shaped
      .select(col("metric").cast("string").as("metric"), col("v"),
        col("t").cast("boolean").as("t"))
      .filter(col("metric").isNotNull && col("v").isNotNull &&
        col("t").isNotNull)
      .groupBy(col("metric"), col("v"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("cb"))
    val merged = Merge.latestSnapshotVersion(spark, targetBase,
        below = batchId) match {
      case Some(v) =>
        spark.read.parquet(s"$targetBase/v=$v")
          .unionByName(fresh)
          .groupBy(col("metric"), col("v"))
          .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      case None => fresh
    }
    merged.write.mode("overwrite").parquet(s"$targetBase/v=$batchId")
  }

  /** The trigger-time verdict set over the latest sealed KS
    * snapshot: per-metric KS battery from the accumulated counts →
    * Benjamini–Hochberg step-up — the streaming twin of the batch
    * `bhFdr(ksBattery(...))` production shape, value-identical on
    * the same sealed window. Fails loudly when no committed snapshot
    * exists (a monitor that reports "no drift" before the stream
    * starts is worse than one that refuses). */
  def ksFdrAgainstSealed(spark: SparkSession, targetBase: String,
      alphaMicros: Long = 50000L): DataFrame = {
    val v = Merge.latestSnapshotVersion(spark, targetBase).getOrElse(
      throw new IllegalStateException(
        s"no committed KS snapshot under $targetBase — the stream " +
          "has not processed a batch yet"))
    val counts = spark.read.parquet(s"$targetBase/v=$v")
    val battery = graft.operators.OrderedStats.ksBatteryFromCounts(counts)
    Quality.bhFdr(battery.select(col("metric"), col("p_micros")),
      "metric", col("p_micros"), alphaMicros)
  }

  /** Drift report of the latest accumulated snapshot against a frozen
    * reference histogram (`reference` = (bucket, n_a), typically a
    * [[graft.operators.Quality.bucketCounts]] of the training-time
    * sample, persisted once). Returns the same (bucket, n_a, n_b,
    * drifted) rows as the batch [[graft.operators.Quality.driftReport]].
    * Fails loudly when no committed snapshot exists — a monitor that
    * silently reports "no drift" before the stream starts is worse
    * than one that refuses. */
  def driftAgainstReference(spark: SparkSession, targetBase: String,
      reference: DataFrame, nBuckets: Int,
      thresholdPpm: Long = 50000L): DataFrame = {
    val v = Merge.latestSnapshotVersion(spark, targetBase).getOrElse(
      throw new IllegalStateException(
        s"no committed drift snapshot under $targetBase — the stream " +
          "has not processed a batch yet"))
    val streamed = spark.read.parquet(s"$targetBase/v=$v")
      .select(col("bucket"), col("n").as("n_b"))
    Quality.driftVerdict(
      reference.select(col("bucket"), col("n_a")), streamed,
      nBuckets, thresholdPpm)
  }
}
