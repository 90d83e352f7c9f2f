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
    * must share the schema (minus `deleteCol`).
    *
    * `assertUniqueKeys = true` runs an eager uniqueness check over the
    * changeset (one extra pass over the SMALL side only — the snapshot
    * is untouched) and fails loudly on a duplicate key instead of
    * silently emitting duplicate rows. Off by default so the pure-plan
    * path stays lazy; turn it on in pipelines whose changelog source
    * can't guarantee key-uniqueness upstream.
    *
    * `allowSchemaEvolution = true` merges mismatched schemas by name:
    * columns the changeset adds appear NULL on untouched base rows,
    * columns it drops appear NULL on its own rows (the additive
    * evolution every long-lived CDC pipeline eventually hits). Off by
    * default — a silent schema drift in a supposedly-stable feed
    * should fail loudly, not widen the table. */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      deleteCol: Option[String] = None,
      assertUniqueKeys: Boolean = false,
      allowSchemaEvolution: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    if (assertUniqueKeys) {
      val dup = changes.groupBy(keyCols.map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsert changeset has duplicate key ${dup.headOption.orNull}; " +
          "collapse it first with Merge.latestByKey")
    }
    val keep = deleteCol.map(d => changes.filter(!col(d)).drop(d))
      .getOrElse(changes)
    base.join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(keep, allowMissingColumns = allowSchemaEvolution)
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

  /** Streaming CDC apply — the `foreachBatch` body that turns a
    * changelog stream into versioned table snapshots:
    * {{{
    * stream.writeStream.foreachBatch { (batch, id) =>
    *   Merge.applyChangeBatch(base, id, batch, Seq("k"), "version", Some("del"))
    * }
    * }}}
    * Batch `i` reads the newest snapshot with version < i, applies the
    * micro-batch's net effect ([[latestByKey]] then [[upsert]]), and
    * overwrites `dir/v=i`. Exactly-once falls out of determinism: a
    * replayed batch (restart between sink write and checkpoint commit)
    * has the same id and same content, so it rewrites `v=i`
    * byte-identically instead of double-applying. Readers pick the
    * highest complete version — the snapshot-isolation convention of
    * every log-structured table format, minus the format dependency.
    */
  def applyChangeBatch(targetBase: String, batchId: Long, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: Option[String] = None,
      allowSchemaEvolution: Boolean = false): Unit = {
    val spark = changes.sparkSession
    val prior = latestSnapshotVersion(spark, targetBase, below = batchId)
    val net = latestByKey(changes, keyCols, versionCol).drop(versionCol)
    val base = prior match {
      case Some(v) => spark.read.parquet(s"$targetBase/v=$v")
      case None =>
        val cols = deleteCol.map(d => net.drop(d)).getOrElse(net).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cols)
    }
    upsert(base, net, keyCols, deleteCol,
        allowSchemaEvolution = allowSchemaEvolution)
      .write.mode("overwrite").parquet(s"$targetBase/v=$batchId")
  }

  /** Snapshot diff — the reconciliation inverse of [[upsert]]: compare
    * two versions of a table by key and report every `added`,
    * `removed`, and `changed` key, plus WHICH columns changed
    * (null-safe comparison, so null→value and value→null both count).
    * The audit primitive for CDC pipelines: `diff(v_n, apply(v_n,
    * changes))` must equal the changes, and `diff(v_n, v_n)` must be
    * empty.
    *
    * Scale: one full-outer join keyed on `keyCols` — both sides
    * shuffle once on the key (unavoidable for a total diff); on
    * bucketed/co-partitioned snapshots (see [[graft.operators.Scale]])
    * it degenerates to a zip of co-located buckets with no exchange.
    * Column comparison is row-local. Unchanged keys are dropped
    * before anything widens. */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val cmp = if (compareCols.nonEmpty) compareCols
      else before.columns.filterNot(keyCols.contains).toSeq
    val b = cmp.foldLeft(before)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__b_present", lit(true))
    val a = cmp.foldLeft(after)((d, c) => d.withColumnRenamed(c, s"__a_$c"))
      .withColumn("__a_present", lit(true))
    val anyChange = cmp.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduce(_ || _)
    b.join(a, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__a_present").isNull, "removed")
          .when(col("__b_present").isNull, "added")
          .when(anyChange, "changed"))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === "changed", array_compact(array(cmp.map(c =>
          when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))): _*)))
          .otherwise(array().cast("array<string>")))
      .select(keyCols.map(col) ++ Seq(col("change_type"), col("changed_cols")): _*)
  }

  /** Highest committed snapshot version under `targetBase` (strictly
    * below `below` when scanning for a batch's base). Listing is one
    * driver-side FS call over version directories, not data files.
    * "Committed" = the directory carries the `_SUCCESS` marker Spark's
    * commit protocol writes last — a crash mid-overwrite leaves a
    * partial `v=` directory with no marker, and readers must not
    * consume it as if committed. */
  def latestSnapshotVersion(spark: org.apache.spark.sql.SparkSession,
      targetBase: String, below: Long = Long.MaxValue): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(targetBase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .filter(_ < below)
      .sorted(Ordering[Long].reverse)
      .headOption
  }

  /** Time-travel read: the newest COMMITTED snapshot, or — with
    * `asOf` — the newest committed snapshot whose version is <= that
    * batch id (what the table looked like after batch `asOf`
    * applied). The snapshot-isolation read path of the versioned
    * [[applyChangeBatch]] layout: one metadata listing picks the
    * directory, then it scans like any parquet table. Fails loudly
    * when nothing committed matches rather than returning an empty
    * frame a pipeline would happily aggregate. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      targetBase: String,
      asOf: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val bound = asOf.map(_ + 1).getOrElse(Long.MaxValue)
    latestSnapshotVersion(spark, targetBase, below = bound) match {
      case Some(v) => spark.read.parquet(s"$targetBase/v=$v")
      case None => throw new IllegalStateException(
        s"no committed snapshot at $targetBase" +
          asOf.map(a => s" as of batch $a").getOrElse(""))
    }
  }

  /** Snapshot retention sweep: delete all but the newest `keep`
    * committed snapshots under `targetBase` (and any uncommitted
    * partials older than the retained set — debris from crashed
    * writes). Replay safety: [[applyChangeBatch]] for batch `i` only
    * reads the newest snapshot below `i`, so retention of versions
    * older than the checkpoint's replay horizon never changes a
    * replayed batch's input. One driver-side listing, `O(versions)`
    * FS deletes, no job. */
  def retainSnapshots(spark: org.apache.spark.sql.SparkSession,
      targetBase: String, keep: Int): Unit = {
    require(keep >= 1, s"must retain at least one snapshot (got $keep)")
    val path = new org.apache.hadoop.fs.Path(targetBase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val dirs = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v=")) Some(n.stripPrefix("v=").toLong -> st.getPath)
        else None
      }
    val committed = dirs.filter { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
    val retained = committed.map(_._1).sorted(Ordering[Long].reverse)
      .take(keep).toSet
    dirs.foreach { case (v, p) =>
      if (!retained.contains(v) && retained.forall(v < _))
        fs.delete(p, true)
    }
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
