package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table access layer: every engine query reads the driver-generated
  * parquet star schema from a scale-factor directory (TESTDATA.md).
  *
  * Parquet is the at-rest columnar format (the reference converts text
  * to ORC for the same reason — /root/reference/README.md:111-118);
  * Catalyst pushes predicates + column pruning into these scans, which
  * is the 100 TB story: a query touching 3 of 27 columns reads 3
  * column chunks, not the table.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` normalizes to session-zoned TIMESTAMP whatever the
    * generator emitted:
    * - parquet TIMESTAMP(NANOS) (older testdata) reads as a nanos long
    *   under `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *   [[Sessions.configure]]); convert with integer `div` (a double
    *   division would lose precision above 2^53). Sub-microsecond data
    *   means queries emitting raw `ts` must truncate to a precision
    *   both engines share (e.g. date_trunc('second', ...)).
    * - parquet timestamp[us] with isAdjustedToUTC=false reads as
    *   TIMESTAMP_NTZ, which Spark 4 refuses to cast to numeric types;
    *   cast to TIMESTAMP here (the session zone is pinned UTC, so the
    *   stored micros value is unchanged and matches DuckDB's reading). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
