package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, pmod, timestamp_micros, xxhash64}
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

  /** Plain scan — NO automatic parallelism spread (round-21 reversal
    * of the r20 blanket spread, VERDICT r20 "Next round" #1, decided
    * by a full quiet-box A/B: `plans/r21/spread_ab_full.txt`).
    *
    * Background: the testdata tables are single-row-group parquet
    * files, and a parquet row group is the unit of split — so every
    * scan runs as ONE task regardless of core count. Round 20
    * therefore repartitioned every table > 128 KiB to the full core
    * count. The r21 A/B (426 queries, spread on vs off, same quiet
    * box) measured that policy at 191 s of tax across 383 queries
    * against 29 s of win across 42: the exchange pays ONLY where the
    * downstream per-byte map work is heavy (shingling, n-gram builds,
    * perceptual encode/decode/hash, Jaro-Winkler, unbounded percentile
    * buffers), and those consumers are a small, known set. So the
    * spread is now strictly OPT-IN at the consumer: the winner queries
    * wrap their heavy input in [[wide]]; everything else scans
    * naturally (and at 100 TB a table has many row groups and scans
    * wide with no help). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The spread exchange: hash-on-key, NOT round-robin and NOT
    * all-columns — a keyless repartition(n) first SORTS its input
    * partition (sortBeforeRepartition, needed for retry determinism),
    * a single-task full-table sort; and hashing EVERY column forces
    * the scan to read every column, silently defeating column pruning
    * (measured in r20: +2 s on closeness via the 16-column lineitem).
    * The leading columns are the generator's keys — high-cardinality,
    * usually read anyway — so hashing just the first two is
    * deterministic, retry-safe (guide §2.5), pruning-friendly, and
    * spreads at ~row cardinality. */
  private def spreadTo(df: DataFrame, width: Int): DataFrame =
    df.repartition(width, pmod(
      xxhash64(df.columns.take(2).map(col): _*), lit(width * 64)))

  /** FULL-WIDTH spread for heavy per-byte map work (shingling,
    * n-gram builds, perceptual hash/decode, Jaro-Winkler scoring,
    * unbounded percentile buffers): these consumers measured 0.4-4.5 s
    * wins from a full-core spread in the r21 A/B even on KB-scale
    * tables, because their cost per byte is orders of magnitude above
    * a scan's. Fires only when the input scans narrower than the core
    * count AND exceeds SPARK_GRAFT_SMALL_SCAN_BYTES (default 128 KiB
    * — so Verify's sf0.001/sf0.01 sweeps keep the narrow layouts the
    * oracle record was built under, and per-task overhead never
    * dominates); deterministic 2-leading-column hash — exactly the
    * r20 partitioning these consumers were oracle-swept under. On a
    * production multi-split table the parts-vs-cores guard makes this
    * a no-op. */
  def wide(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val minBytes = sys.env.getOrElse("SPARK_GRAFT_SMALL_SCAN_BYTES",
      "131072").toLong
    val par = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes > minBytes)
      spreadTo(df, par)
    else df
  }

  /** Scan PINNED to the natural layout — must never go through
    * [[wide]], for consumers whose OUTPUT depends on the physical
    * layout: `sample_first_n` (orders by the non-unique
    * (l_orderkey, l_linenumber) — tie-winners follow scan order, and
    * the DuckDB oracle resolves them by file order), the seeded
    * samplers (`df.sample` draws per (partition, position)), and the
    * seeded spark.ml fits (floating-point sum order moves centroids —
    * see [[embeddings]]). Now that [[table]] is spread-free this is an
    * alias, kept as the explicit DOCUMENTED pin so a future scan-layer
    * change cannot silently alter what these queries compute. */
  def tableUnspread(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
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
  /** PINNED to the natural scan (never [[wide]]): embeddings is a
    * 2k-row vector table whose heavy consumers either shuffle by a
    * join key immediately (brute top-k, band joins) or run seeded
    * spark.ml KMeans fits — and a seeded fit is
    * PARTITIONING-SENSITIVE (floating-point sum order changes the
    * centroids), so spreading this scan changes what the recall-gated
    * ANN queries compute (measured in r20: sim_recall_ivf /
    * sim_filtered_ivf_recall dipped below their floors under a spread
    * scan). */
  def embeddings(s: SparkSession, d: String): DataFrame =
    tableUnspread(s, d, "embeddings")
}
