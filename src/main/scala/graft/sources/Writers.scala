package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.input_file_name

/** Sinks + auxiliary scans (SURVEY.md §2.1).
  *
  * The reference's storage story: text CSV in, ORC+ZLIB as the real
  * analytic format (CTAS, README.md:111-118), Pig `STORE ... USING
  * PigStorage(',')` CSV out with `rmf` overwrite (README.md:131-132).
  * Parquet is this engine's default at-rest format (driver testdata);
  * ORC is kept for fidelity.
  */
object Writers {

  /** ORC + ZLIB conversion, the reference's CTAS (README.md:111-118). */
  def toOrcZlib(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  def toParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** PigStorage(',') analogue with `rmf`-style overwrite
    * (README.md:131-132,160-161). */
  def toCsv(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  /** Whole-file scan: one row per file, (file, contents) — the
    * reference's `sc.wholeTextFiles` (README.md:297). */
  def wholeTextFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumnRenamed("value", "contents")
      .withColumn("file", input_file_name())
      .select("file", "contents")

  /** Line scan: one row per line — `sc.textFile` (README.md:352,385). */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")

  /** Small-files compaction — the table-maintenance sweep every
    * streaming/incremental sink eventually needs: rewrite a parquet
    * directory into `ceil(rows / targetRowsPerFile)` files. A 100 TB
    * table fed by per-batch appends decays into millions of KB-sized
    * files whose open/footer cost dominates scans; compaction restores
    * scan-sized files without changing a single row.
    *
    * Crash-safe sequencing: write the compacted copy NEXT TO the
    * target (`<dir>__compact_tmp`), verify its row count, then swap
    * via two renames (old → `__old`, tmp → dir) and delete the
    * original. A crash before the first rename leaves the original
    * intact (readers keep working). A crash BETWEEN the two renames
    * leaves the table dir absent with the data living only in
    * `__old` (original) / `__tmp` (verified copy) — so the startup
    * sweep must RECOVER before it deletes: if the table dir is
    * missing, promote `__old` back (the conservative choice: it is
    * the pre-compaction original, and tmp's verification happened
    * against it). Only when the table dir itself exists are tmp/old
    * genuinely stale debris. Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, dir: String,
      targetRowsPerFile: Long): (Long, Long) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    if (!fs.exists(p)) {
      // mid-swap crash: restore the original before anything else.
      if (fs.exists(old)) require(fs.rename(old, p), s"recovery rename $old -> $p failed")
      else if (fs.exists(tmp)) require(fs.rename(tmp, p), s"recovery rename $tmp -> $p failed")
      else throw new IllegalStateException(s"$dir does not exist and no compaction debris to recover from")
    }
    fs.delete(tmp, true); fs.delete(old, true) // dir exists => genuinely stale debris
    val df = spark.read.parquet(dir)
    val n = df.count()
    val filesBefore = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    df.repartition(parts.toInt).write.parquet(tmp.toString)
    val nNew = spark.read.parquet(tmp.toString).count()
    require(nNew == n, s"compaction row drift: $n -> $nNew (aborted, original intact)")
    require(fs.rename(p, old), s"rename $p -> $old failed")
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
    fs.delete(old, true)
    val filesAfter = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    (filesBefore, filesAfter)
  }
}
