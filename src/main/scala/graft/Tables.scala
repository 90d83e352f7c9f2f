package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects.
    * With `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[Sessions.configure]]) it reads as a nanos long; convert to a
    * microsecond timestamp with integer `div` (a double division would
    * lose precision above 2^53). Sub-microsecond data exists in the
    * testdata, so any query emitting raw `ts` must truncate to a
    * precision both engines share (e.g. date_trunc('second', ...)). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
