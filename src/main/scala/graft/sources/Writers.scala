package graft.sources

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
}
