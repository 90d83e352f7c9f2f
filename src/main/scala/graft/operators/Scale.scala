package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out machinery that only matters when the data no longer fits
  * one node: skew-salted joins and bucketed (pre-partitioned) tables
  * for shuffle-free co-located joins. Local tests assert the plan
  * shape (no Exchange over bucketed scans; salt fan-out), which is
  * exactly what transfers to a 1000-executor cluster.
  */
object Scale {

  /** Salted inner equi-join for skewed keys: the build side is
    * replicated `salt` ways, the probe side scatters each row to one
    * of the `salt` replicas — a hot key's rows spread over `salt`
    * reducers instead of melting one. (AQE's skew-join handles
    * moderate skew automatically; explicit salting is for the
    * pathological keys AQE splits can't fix, e.g. one key = 30% of
    * the table.) */
  def saltedJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      salt: Int = 8): DataFrame = {
    val p = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Write a table bucketed by `keyCol` into the session catalog:
    * joins/aggregations on `keyCol` between tables bucketed the same
    * way need no shuffle (the scan reports the hash partitioning). At
    * 100 TB this converts every fact⋈fact join on the bucket key from
    * a full shuffle into a zip of co-located buckets. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    // reclaim stale state from a prior JVM: a crashed/old run can leave
    // the warehouse dir without a catalog entry, which saveAsTable
    // (even mode=overwrite) refuses with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table) // managed, under spark.sql.warehouse.dir
  }

  /** Repartition-by-key helper for reusing one partitioning across
    * several downstream aggregations (pay the shuffle once). */
  def copartition(df: DataFrame, keyCol: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(keyCol))
}
