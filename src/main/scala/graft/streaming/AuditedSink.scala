package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Quality

/** Audited streaming publish — the streaming form of
  * `Writers.writeAuditPublish`: every micro-batch is staged, audited
  * against a declarative expectation suite (over the STAGED files —
  * what was actually serialized), and then either PUBLISHED as a
  * committed snapshot (`<base>/v=<batchId>/` + `_SUCCESS`, the same
  * versioned layout `Merge.applyChangeBatch` commits, so
  * `Merge.readSnapshot` and [[readCommitted]] read it directly) or
  * QUARANTINED (`<base>/_quarantine/v=<batchId>/`) — the stream keeps
  * running and the bad batch parks for inspection instead of killing
  * the pipeline or reaching readers.
  *
  * Exactly-once under foreachBatch's at-least-once redelivery: a
  * replayed batch whose version is already committed (or already
  * quarantined) is SKIPPED — deterministic sources make the rewrite
  * identical, so skipping is the cheap half of idempotence, and a
  * batch can never be double-published or double-audited.
  *
  * Scale shape: the audit costs one scan of the batch (the suite's
  * one-agg-pass design); publish is two metadata renames; the
  * quarantine listing never grows past the number of refused batches.
  * Nothing here touches previously committed snapshots.
  */
object AuditedSink {

  /** Batch core (directly testable; [[start]] wires it to a stream).
    * Returns what happened: "published", "quarantined", or
    * "replayed" (already settled by an earlier delivery — no-op). */
  def publishBatch(batch: DataFrame, targetBase: String, batchId: Long,
      rules: Seq[Quality.Expectation]): String = {
    val spark = batch.sparkSession
    val basePath = new Path(targetBase)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vdir = new Path(s"$targetBase/v=$batchId")
    val qdir = new Path(s"$targetBase/_quarantine/v=$batchId")
    // replay gate: committed OR quarantined means this delivery is a
    // redelivery — the batch's fate is already settled
    if (fs.exists(new Path(vdir, "_SUCCESS"))) return "replayed"
    if (fs.exists(qdir)) return "replayed"
    val staged = new Path(s"$targetBase/_staging/v=$batchId")
    batch.write.mode("overwrite").parquet(staged.toString)
    val report = Quality.expect(spark.read.parquet(staged.toString), rules)
    val rows = report.collect() // rule-count scale
    val ok = rows.nonEmpty && rows.forall(_.getAs[Boolean]("passed"))
    val dest = if (ok) vdir else qdir
    fs.mkdirs(dest.getParent)
    require(fs.rename(staged, dest), s"rename $staged -> $dest failed")
    if (ok) "published" else "quarantined"
  }

  /** Wire [[publishBatch]] to a streaming DataFrame. The checkpoint
    * carries batch ids across restarts; the replay gate makes the
    * sink idempotent even when the checkpoint commit itself was
    * lost. */
  def start(stream: DataFrame, targetBase: String,
      rules: Seq[Quality.Expectation], checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        publishBatch(batch, targetBase, id, rules); ()
      }
      .start()

  /** Every committed (published) row across all snapshot versions —
    * the reader for the append-mode audited sink. One metadata
    * listing; quarantined and staging dirs are invisible both by the
    * `_SUCCESS` gate and by their underscore prefix. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      targetBase: String): DataFrame = {
    val basePath = new Path(targetBase)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.listStatus(basePath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
    require(committed.nonEmpty, s"no committed snapshots at $targetBase")
    spark.read.parquet(committed: _*)
  }
}
