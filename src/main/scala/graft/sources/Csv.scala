package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source with real quote/escape handling and an explicit
  * malformed-row policy (SURVEY.md §1.4).
  *
  * The reference ingests the Medicare CSV by splitting on bare commas
  * (README.md:58-60) and its own sampled output shows the damage:
  * column-shifted rows wherever a quoted description contains a comma,
  * plus a copyright banner row and a header row ingested as data
  * (README.md:202-211). This source turns that failure into policy:
  * PERMISSIVE parsing routes any row that doesn't fit the schema into
  * `_corrupt_record` instead of silently shifting columns.
  */
object Csv {

  val corruptCol = "_corrupt_record"

  /** Quoted-CSV scan: schema-declared (never inferred — the reference
    * declares its DDL up front, README.md:29-56), quote-aware,
    * malformed rows captured. Streams by default — a 100 TB ingest must
    * not pin itself to storage memory; pass `cache = true` only for the
    * corrupt-record *report* path (Spark disallows queries that
    * reference only the internal corrupt column on an uncached scan). */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, delimiter: String = ",",
      cache: Boolean = false): DataFrame = {
    val df = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("header", header)
      .option("sep", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
    if (cache) df.cache() else df
  }

  /** Valid rows only. */
  def valid(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNull).drop(corruptCol)

  /** The malformed-row report: what the reference's pipeline silently
    * column-shifted, surfaced as data. Requires a `cache = true` scan
    * (the projection references only the corrupt column). */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNotNull).select(col(corruptCol))

  /** The reference's 27-column Medicare Part B schema verbatim
    * (README.md:29-56): 24 strings + 3 ints, money kept as string for
    * query-time coercion (README.md:52-56, 239-256). */
  val medicareSchema: StructType = StructType(Seq(
    "npi", "nppes_provider_last_org_name", "nppes_provider_first_name",
    "nppes_provider_mi", "nppes_credentials", "nppes_provider_gender",
    "nppes_entity_code", "nppes_provider_street1", "nppes_provider_street2",
    "nppes_provider_city", "nppes_provider_zip", "nppes_provider_state",
    "nppes_provider_country", "provider_type",
    "medicare_participation_indicator", "places_of_service", "hcpcs_code",
    "hcpcs_description", "hcpcs_drug_indicator")
    .map(StructField(_, StringType)) ++ Seq(
    StructField("line_srvc_cnt", IntegerType),
    StructField("bene_unique_cnt", IntegerType),
    StructField("bene_day_srvc_cnt", IntegerType)) ++ Seq(
    "average_medicare_allowed_amt", "average_submitted_chrg_amt",
    "stdev_submitted_chrg_amt", "average_medicare_payment_amt",
    "stdev_medicare_payment_amt").map(StructField(_, StringType)))

  /** Medicare ingest with the reference's conversion-time predicate
    * `WHERE npi != ''` (README.md:117). */
  def readMedicare(spark: SparkSession, path: String): DataFrame =
    valid(read(spark, path, medicareSchema))
      .filter(col("npi").isNotNull && col("npi") =!= "")
}
