package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changeset application — the warehouse MERGE family, expressed as
  * plain relational algebra so it runs on any table format (no
  * transactional log required; pair with an atomic-rename or
  * partition-overwrite sink for the commit step).
  *
  * Scale notes: a changeset is small relative to the snapshot by
  * construction (else it's a rewrite, not a merge), so [[upsert]]
  * shapes the plan as an ANTI JOIN of the 100 TB side against the
  * change keys — broadcastable when the changeset fits, an id-keyed
  * shuffle otherwise — plus a union. The snapshot's payload columns
  * never shuffle in the broadcast regime, and there is no full-outer
  * join materializing both sides wide. [[scd2]] is one window over
  * the changeset only (the snapshot is not involved).
  */
object Merge {

  /** SCD-type-1 upsert: apply `changes` to `base` by key — changed
    * keys take the change row's values, new keys are inserted, and
    * rows whose `deleteCol` (if given) is true are removed. `changes`
    * must be key-unique (one row per key; pre-aggregate with
    * [[latestByKey]] when replaying a multi-version log). Both inputs
    * must share the schema (minus `deleteCol`). */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val keep = deleteCol.map(d => changes.filter(!col(d)).drop(d))
      .getOrElse(changes)
    base.join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(keep)
  }

  /** Collapse a multi-version changelog to the latest row per key
    * (`versionCol` strictly increasing per key — a commit timestamp or
    * log sequence number). One window, no join. */
  def latestByKey(log: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** SCD-type-2 history build: turn a changelog into effective-dated
    * rows — each version valid from its own timestamp until the key's
    * next version (`valid_to` NULL = current). One window over the
    * changelog, keyed by the natural key; the downstream as-of lookup
    * is [[AsOf.joinAsOf]]. */
  def scd2(log: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    // (key, ts) must be unique — two versions of one key at the same
    // instant have no defined order in any engine
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
