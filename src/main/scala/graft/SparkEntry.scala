package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Driver contract — registry of named queries (SURVEY.md §2 inventory).
  *
  * Conventions shared by every query + oracle pair:
  *  - reads `$sfDir/<table>.parquet` via [[Tables]];
  *  - deterministic output: explicit ORDER BY on key columns in both
  *    the Spark plan and the DuckDB oracle SQL;
  *  - double aggregation goes through decimal (exact, associative,
  *    partition-order independent) and is cast back to double at the
  *    end — identical bits in Spark and DuckDB;
  *  - column names aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- P2 data quality (SURVEY §2.2, §2.3, §2.5) ----
    "dq_invalid_codes" -> ((s, dir) =>
      // Reference README.md:126-132 transplanted: Brand#N with a
      // single digit fails `Brand#\d{2}`; report counts per bad code.
      Quality.invalidCodeReport(Tables.part(s, dir), "p_brand",
        "^(Brand#\\d{2})$")),

    // ---- Aggregation (SURVEY §2.5): TPC-H Q1-shaped pricing summary ----
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(24,8)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "dq_invalid_codes" ->
      """SELECT p_brand, count(*) AS n_invalid
        |FROM part
        |WHERE NULLIF(regexp_extract(p_brand, '^(Brand#\d{2})$', 1), '') IS NULL
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
