package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** Incremental sketch maintenance over a stream — the streaming twin
  * of the persisted-sketch queries (`sketch_hll_persist`,
  * `sketch_kll_persist`, `sketch_theta_persist`): each micro-batch
  * sketches only ITS rows and union-merges with the previous
  * snapshot's per-group sketches, so corpus-lifetime statistics
  * (distinct counts, quantiles, set overlaps) stay current without
  * ever rescanning history. Snapshots are versioned exactly like
  * [[graft.operators.Merge.applyChangeBatch]] — `dir/v=<batchId>`,
  * `_SUCCESS`-gated reads, idempotent batch replay by determinism,
  * [[graft.operators.Merge.retainSnapshots]] for retention.
  *
  * Scale: per batch, one partial-aggregated groupBy over the NEW rows
  * only (the shuffle carries bounded sketch binaries) plus a k-row
  * merge with the prior snapshot. State size is O(groups), not
  * O(rows ever seen).
  */
object SketchStreams {

  /** `foreachBatch` body:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   SketchStreams.applySketchBatch(dir, id, b, Seq("source"),
    *     sketch = theta_sketch_agg(col("url")),
    *     merge = theta_union_agg)
    * }
    * }}}
    * `sketch` aggregates the batch's raw rows per group; `merge`
    * union-merges serialized sketches (pass the matching pair:
    * `hll_sketch_agg`/`hll_union_agg`, `kll_sketch_agg`/
    * `kll_merge_agg`, `theta_sketch_agg`/`theta_union_agg`). */
  def applySketchBatch(targetBase: String, batchId: Long, batch: DataFrame,
      groupCols: Seq[String], sketch: Column,
      merge: Column => Column): Unit = {
    require(groupCols.nonEmpty, "applySketchBatch needs at least one group column")
    val spark = batch.sparkSession
    val fresh = batch.groupBy(groupCols.map(col): _*).agg(sketch.as("sk"))
    val merged = Merge.latestSnapshotVersion(spark, targetBase, below = batchId) match {
      case Some(v) =>
        spark.read.parquet(s"$targetBase/v=$v")
          .unionByName(fresh)
          .groupBy(groupCols.map(col): _*)
          .agg(merge(col("sk")).as("sk"))
      case None => fresh
    }
    merged.write.mode("overwrite").parquet(s"$targetBase/v=$batchId")
  }
}
