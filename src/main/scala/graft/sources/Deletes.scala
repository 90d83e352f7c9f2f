package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level deletes over an immutable parquet table WITHOUT rewriting
  * data files — the position-delete / deletion-vector pattern every
  * modern table format ships (Iceberg v2 position deletes, Delta
  * deletion vectors). The reference's storage story is append-only
  * CTAS + overwrite (README.md:111-118,131-132); this is the missing
  * mutation half: GDPR erasure, bad-batch retraction, and late
  * corrections on a 100 TB table cannot afford to rewrite the files
  * that contain the rows.
  *
  * Layout: the table dir stays untouched; deletes accumulate NEXT TO
  * it in `<dir>__deletes` as parquet rows `(file_path, row_index)` —
  * the (file, position) coordinate Spark's parquet reader exposes via
  * the `_metadata.file_path` / `_metadata.row_index` constant columns.
  * A delete therefore costs one predicate scan + an append of
  * fixed-width coordinates; the data files' bytes and mtimes never
  * change (DeletesSpec pins this).
  *
  * Read path: anti-join the scan against the delete log on the
  * (file_path, row_index) pair. The log is tiny next to the table
  * (24-ish bytes per deleted row), so Catalyst broadcasts it and the
  * scan stays one pass — the same asymmetry that makes reader-side
  * merge-on-read cheap in the formats this models. Deletes against
  * already-deleted rows are no-ops (the predicate runs over the LIVE
  * view), so the log never grows duplicate coordinates and a replayed
  * delete batch is idempotent.
  *
  * [[materializeDeletes]] is the maintenance sweep: rewrite the table
  * minus its deleted rows (compaction's crash-safe verify-then-swap
  * discipline) and retire the log — merge-on-read until the log is
  * worth folding in, exactly the Iceberg rewrite_position_deletes
  * lifecycle.
  */
object Deletes {

  private def deleteLogDir(dir: String): String = dir + "__deletes"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live view: table minus logged positions. One scan + an
    * anti-join against the (broadcastable) delete log. */
  def readApplyingDeletes(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.parquet(dir)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    val live =
      if (fs(spark, dir).exists(new Path(deleteLogDir(dir)))) {
        val log = spark.read.parquet(deleteLogDir(dir))
          .select(col("file_path").as("__file"), col("row_index").as("__pos"))
        base.join(log, Seq("__file", "__pos"), "left_anti")
      } else base
    live.drop("__file", "__pos")
  }

  /** Log position deletes for live rows matching `predicate`; data
    * files are never opened for write. Returns the number of rows
    * newly deleted. Running the same predicate twice deletes 0 new
    * rows (the scan is over the live view). */
  def deleteWhere(spark: SparkSession, dir: String, predicate: Column): Long = {
    val base = spark.read.parquet(dir)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    val logDir = deleteLogDir(dir)
    import spark.implicits._
    val existing =
      if (fs(spark, dir).exists(new Path(logDir)))
        spark.read.parquet(logDir)
          .select(col("file_path").as("__file"), col("row_index").as("__pos"))
      else Seq.empty[(String, Long)].toDF("__file", "__pos")
    val doomed = base.filter(predicate)
      .join(existing, Seq("__file", "__pos"), "left_anti")
      .select(col("__file").as("file_path"), col("__pos").as("row_index"))
      .cache()
    val n = doomed.count()
    // append-only log: each delete batch is its own parquet file(s);
    // parquet's _temporary commit makes the append all-or-nothing
    if (n > 0) doomed.write.mode("append").parquet(logDir)
    doomed.unpersist()
    n
  }

  /** Fold the delete log into the data: rewrite the table as its live
    * view, then retire the log. compactParquet's verify-then-swap
    * sequencing — the original table and its log both survive any
    * crash before the final promotion. Returns the surviving count. */
  def materializeDeletes(spark: SparkSession, dir: String,
      targetRowsPerFile: Long = 1000000L): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val f = fs(spark, dir)
    val p = new Path(dir)
    val tmp = new Path(dir + "__mat_tmp")
    val old = new Path(dir + "__mat_old")
    if (!f.exists(p)) { // mid-swap crash: the original must come back first
      if (f.exists(old)) require(f.rename(old, p), s"recovery rename $old -> $p failed")
      else throw new IllegalStateException(s"$dir missing with no materialize debris")
    }
    f.delete(tmp, true); f.delete(old, true)
    val live = readApplyingDeletes(spark, dir)
    val n = live.count()
    val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    live.repartition(parts.toInt).write.parquet(tmp.toString)
    val nNew = spark.read.parquet(tmp.toString).count()
    require(nNew == n, s"materialize row drift: $n -> $nNew (aborted, original intact)")
    require(f.rename(p, old), s"rename $p -> $old failed")
    require(f.rename(tmp, p), s"rename $tmp -> $p failed")
    // log entries point at the OLD files' coordinates — they are
    // meaningless against the rewrite and must not outlive it
    f.delete(new Path(deleteLogDir(dir)), true)
    f.delete(old, true)
    n
  }

  /** Logged-delete count (0 when no log exists) — the signal a
    * maintenance scheduler compares against table size to decide when
    * [[materializeDeletes]] pays for itself. */
  def deletedCount(spark: SparkSession, dir: String): Long = {
    if (fs(spark, dir).exists(new Path(deleteLogDir(dir))))
      spark.read.parquet(deleteLogDir(dir)).count()
    else 0L
  }
}
