package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
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

  /** Crash-safe promotion of a freshly written skipping map: the live
    * map is renamed ASIDE (`<map>__old`) before the tmp is renamed
    * into place, so no instant ever has zero copies on disk — the
    * compactParquet discipline applied to the map swap. A crash
    * between the renames leaves `__old` (superseded but complete) and
    * possibly `__tmp` (the newer union); [[recoverMap]] promotes one
    * of them on the next touch. */
  private def swapMap(fs: FileSystem, live: Path, tmp: Path): Unit = {
    val old = new Path(live.toString + "__old")
    fs.delete(old, true) // live exists => stale debris from a past swap
    require(fs.rename(live, old), s"rename $live -> $old failed")
    require(fs.rename(tmp, live), s"rename $tmp -> $live failed")
    fs.delete(old, true)
  }

  /** Startup recovery for [[swapMap]]'s mid-swap crash window: if the
    * live map is missing, promote the complete tmp copy when present
    * (it strictly supersets the old map — append-only union), else
    * restore the old map. Called by every map reader/appender before
    * the live path is opened. */
  private def recoverMap(fs: FileSystem, live: Path): Unit = {
    if (!fs.exists(live)) {
      val old = new Path(live.toString + "__old")
      val tmp = new Path(live.toString + "__tmp")
      if (fs.exists(tmp)) {
        require(fs.rename(tmp, live), s"recovery rename $tmp -> $live failed")
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        require(fs.rename(old, live), s"recovery rename $old -> $live failed")
      }
    }
  }

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Zone map — per-FILE min/max statistics for `cols`, persisted next
    * to the table (`<dir>__zonemap`). The data-skipping half of the
    * clustered-write story: [[compactParquet]]/range/Z-order layouts
    * concentrate each file's key range, and the zone map is what lets
    * a reader SKIP files whose range can't match a predicate — the
    * Delta/Iceberg file-stats pattern without the table format. At
    * 100 TB the map is metadata-sized (one row per file) while the
    * skipped IO is the table itself; parquet's own row-group min/max
    * only helps AFTER a file is opened and listed, so at
    * millions-of-files scale the zone map is what cuts the listing.
    *
    * One scan of the projected columns builds it (columnar pruning
    * keeps the scan narrow). REBUILD after any write to the dir —
    * the map records the files it indexed, and [[prunedRead]] fails
    * loudly on drift rather than returning silently stale results. */
  def writeZoneMap(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val stats = zoneStats(spark.read.parquet(dir), cols)
    stats.coalesce(1).write.mode("overwrite").parquet(dir + "__zonemap")
    spark.read.parquet(dir + "__zonemap").count()
  }

  /** Per-file min/max/count rows for one scan of `cols` (shared by the
    * full [[writeZoneMap]] build and the incremental [[appendZoneMap]]). */
  private def zoneStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__${c}_min"), max(col(c)).as(s"__${c}_max"))) :+
      count(lit(1)).as("__n_rows")
    df.select(cols.map(col): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental zone-map maintenance — the daily-append path: scan
    * ONLY files the map has not indexed yet (mirror of
    * `Similarity.ivfAppend`'s no-refit contract). A 100 TB table
    * growing by 0.1%/day must not rescan 100 TB to keep its skipping
    * index fresh; this scans the appended files and unions their rows
    * into the existing map, leaving every already-indexed entry
    * byte-identical. `cols` must match the original build (checked
    * against the map's schema). Returns (newFilesIndexed, totalFiles).
    *
    * The old-map read routes through a temp dir + two renames because
    * parquet cannot lazily read and overwrite the same path in one
    * job; the swap is crash-safe the same way [[compactParquet]] is —
    * [[swapMap]] renames the live map aside before promoting tmp, and
    * [[recoverMap]] promotes the surviving copy after a mid-swap
    * crash. */
  def appendZoneMap(spark: SparkSession, dir: String,
      cols: Seq[String]): (Long, Long) = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val zmPath = dir + "__zonemap"
    recoverMap(fsFor(spark, new Path(zmPath)), new Path(zmPath))
    val old = spark.read.parquet(zmPath)
    val expect = (cols.flatMap(c => Seq(s"__${c}_min", s"__${c}_max")) :+
      "__n_rows").toSet
    require(old.columns.toSet == expect + "__file",
      s"appendZoneMap cols $cols do not match the existing map schema " +
        old.columns.mkString("(", ",", ")"))
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val mapped = old.select("__file").collect().map(r => base(r.getString(0))).toSet
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newFiles = fs.listStatus(p).map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .filterNot(f => mapped.contains(f.getName))
      .map(_.toString)
    if (newFiles.isEmpty) return (0L, mapped.size.toLong)
    val fresh = zoneStats(spark.read.parquet(newFiles.toIndexedSeq: _*), cols)
    val tmp = new Path(zmPath + "__tmp")
    fs.delete(tmp, true)
    old.unionByName(fresh).coalesce(1).write.parquet(tmp.toString)
    swapMap(fs, new Path(zmPath), tmp)
    (newFiles.length.toLong, (mapped.size + newFiles.length).toLong)
  }

  /** Metadata-only pruned scan: keep the files whose `[min, max]` zone
    * can intersect `[lo, hi]` on `c`, and read ONLY those. Returns
    * (pruned DataFrame, files kept, files total). The file-list
    * collect is the zone map itself — one row per file, the justified
    * metadata-scale driver step of every data-skipping reader.
    *
    * Correct pruning for NULL zones falls out of SQL three-valued
    * logic: a file whose `c` is entirely NULL has NULL min/max, the
    * intersect test evaluates NULL, and the file is skipped — rows
    * that are NULL on `c` can never satisfy a range predicate, so
    * skipping is exact. Fails loudly if the table's current files
    * drift from the map (stale map = silent wrong answers otherwise). */
  def prunedRead(spark: SparkSession, dir: String, c: String,
      lo: Any, hi: Any): (DataFrame, Long, Long) = {
    import org.apache.spark.sql.functions._
    // No cache(): the zone map is one tiny metadata file scanned
    // exactly twice below; caching it leaked a pinned table per call
    // for the lifetime of the session.
    recoverMap(fsFor(spark, new Path(dir + "__zonemap")),
      new Path(dir + "__zonemap"))
    val zm = spark.read.parquet(dir + "__zonemap")
    // staleness gate by FILESYSTEM listing (pure metadata — a table
    // scan here would defeat the point), compared on basenames
    // (part-file names carry a write-UUID, so they are unique)
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val mapped = zm.select("__file").collect().map(r => base(r.getString(0))).toSet
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = fs.listStatus(p).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    require(mapped == current,
      s"zone map is stale for $dir (${mapped.size} mapped vs " +
        s"${current.size} current files) — rebuild with writeZoneMap")
    val keep = zm.filter(
        !(col(s"__${c}_max") < lit(lo) || col(s"__${c}_min") > lit(hi)))
      .select("__file").collect().map(_.getString(0))
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep: _*)
    (df, keep.length.toLong, mapped.size.toLong)
  }

  /** Per-file BLOOM side-file — the equality-predicate half of data
    * skipping (the zone map covers ranges; a high-cardinality key
    * whose values interleave across files has useless min/max but a
    * sharp bloom). Delta and Iceberg both ship exactly this pair.
    * One row per file: a serialized Bloom sketch over `xxhash64(c)`
    * (hashing first makes the sketch type-agnostic — strings, longs,
    * dates all probe the same way, the trick Spark's own injected
    * runtime bloom filters use). One scan of the single projected
    * column builds it. REBUILD after any write to the dir —
    * [[prunedReadEquals]] fails loudly on drift, like [[prunedRead]].
    *
    * Sizing: `bitsPerFile` defaults to 8 bits/item at 1M items/file
    * (~1% fpp, ~1 MB per file-entry) — at 100 TB the map is
    * files × 1 MB of pure metadata while the skipped IO is the table. */
  def writeBloomMap(spark: SparkSession, dir: String, c: String,
      expectedItemsPerFile: Long = 1000000L): Long = {
    val stats = bloomStats(spark.read.parquet(dir), c, expectedItemsPerFile)
    stats.coalesce(1).write.mode("overwrite").parquet(dir + "__bloommap")
    spark.read.parquet(dir + "__bloommap").count()
  }

  /** Per-file bloom rows for one scan of `c` (shared by the full
    * [[writeBloomMap]] build and the incremental [[appendBloomMap]]). */
  private def bloomStats(df: DataFrame, c: String,
      expectedItemsPerFile: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(col(c))
      .groupBy(input_file_name().as("__file"))
      .agg(graft.functions.bloom_filter_agg(xxhash64(col(c)),
        expectedItemsPerFile, expectedItemsPerFile * 8L).as("__bloom"),
        count(lit(1)).as("__n_rows"))
      // self-describing build parameters: [[refreshSkippingIndexes]]
      // re-derives the map after a rewrite without the caller having
      // to remember them
      .withColumn("__col", lit(c))
      .withColumn("__items", lit(expectedItemsPerFile))
  }

  /** Incremental bloom-map maintenance: scan ONLY files the map has
    * not indexed yet — the equality-skipping twin of [[appendZoneMap]]
    * (same no-rescan contract, same crash-safe tmp-then-rename swap).
    * Per-file sketches are independent, so appended entries never
    * perturb existing ones. `c` and `expectedItemsPerFile` must match
    * the original build so all sketches stay merge- and
    * probe-compatible — CHECKED against the `__col`/`__items` the map
    * itself records (appending sketches over a different column would
    * make [[prunedReadEquals]] silently skip files that do contain
    * the probed value). Returns (newFilesIndexed, totalFiles). */
  def appendBloomMap(spark: SparkSession, dir: String, c: String,
      expectedItemsPerFile: Long = 1000000L): (Long, Long) = {
    val bmPath = dir + "__bloommap"
    recoverMap(fsFor(spark, new Path(bmPath)), new Path(bmPath))
    val old = spark.read.parquet(bmPath)
    // an empty map (built over an empty dir) constrains nothing
    old.select("__col", "__items").limit(1).collect().foreach { meta =>
      require(meta.getString(0) == c && meta.getLong(1) == expectedItemsPerFile,
        s"appendBloomMap($c, $expectedItemsPerFile) does not match the " +
          s"existing map's build (${meta.getString(0)}, ${meta.getLong(1)}) " +
          "— rebuild with writeBloomMap to change column or sizing")
    }
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val mapped = old.select("__file").collect().map(r => base(r.getString(0))).toSet
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newFiles = fs.listStatus(p).map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .filterNot(f => mapped.contains(f.getName))
      .map(_.toString)
    if (newFiles.isEmpty) return (0L, mapped.size.toLong)
    val fresh = bloomStats(spark.read.parquet(newFiles.toIndexedSeq: _*), c,
      expectedItemsPerFile)
    val tmp = new Path(bmPath + "__tmp")
    fs.delete(tmp, true)
    old.unionByName(fresh).coalesce(1).write.parquet(tmp.toString)
    swapMap(fs, new Path(bmPath), tmp)
    (newFiles.length.toLong, (mapped.size + newFiles.length).toLong)
  }

  /** Metadata-only pruned scan for `c = value`: keep the files whose
    * bloom MIGHT contain the value's hash, read only those. Returns
    * (pruned DataFrame, files kept, files total). False positives
    * only cost IO (the caller's predicate still applies); a bloom
    * miss is definitive, so skipping is exact. The per-file probe is
    * the justified metadata-scale driver step — one deserialized
    * sketch per file, same budget class as [[prunedRead]]'s keep-list
    * collect. Fails loudly if the table's files drift from the map. */
  def prunedReadEquals(spark: SparkSession, dir: String, c: String,
      value: Any): (DataFrame, Long, Long) = {
    import org.apache.spark.sql.functions._
    recoverMap(fsFor(spark, new Path(dir + "__bloommap")),
      new Path(dir + "__bloommap"))
    val bm = spark.read.parquet(dir + "__bloommap")
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val entries = bm.select("__file", "__bloom").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val mapped = entries.map(e => base(e._1)).toSet
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = fs.listStatus(p).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    require(mapped == current,
      s"bloom map is stale for $dir (${mapped.size} mapped vs " +
        s"${current.size} current files) — rebuild with writeBloomMap")
    // hash the probe value with the ENGINE's xxhash64 (not a JVM
    // reimplementation) so build and probe can never disagree
    val h = spark.range(1).select(xxhash64(lit(value))).head().getLong(0)
    val keep = entries.filter { case (_, bytes) =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .mightContainLong(h)
    }.map(_._1)
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (df, keep.length.toLong, mapped.size.toLong)
  }

  /** Rebuild whichever data-skipping side-files exist for `dir` — the
    * post-maintenance hook: [[compactParquet]] and clustering rewrites
    * change the file set, so existing maps go stale (the pruned reads
    * fail loudly rather than serve wrong answers); this re-derives
    * each map from its own persisted metadata instead of making the
    * caller remember build parameters. Zone-map columns come from the
    * `__<c>_min`/`__<c>_max` field names; the bloom map records its
    * column and sizing in `__col`/`__items` fields. Cost: one narrow
    * scan per existing map — the same price as the original builds,
    * paid only when a rewrite actually happened. Returns
    * (zoneRebuilt, bloomRebuilt). */
  def refreshSkippingIndexes(spark: SparkSession, dir: String): (Boolean, Boolean) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zmPath = new Path(dir + "__zonemap")
    // a mid-swap crash during a prior append leaves the live map
    // aside — restore it first so "map exists" is answered correctly
    recoverMap(fs, zmPath)
    recoverMap(fs, new Path(dir + "__bloommap"))
    val zone = fs.exists(zmPath) && {
      val cols = spark.read.parquet(zmPath.toString).schema.fieldNames
        .collect { case n if n.startsWith("__") && n.endsWith("_min") =>
          n.stripPrefix("__").stripSuffix("_min") }
      require(cols.nonEmpty, s"$zmPath has no __<col>_min fields to re-derive from")
      writeZoneMap(spark, dir, cols.toIndexedSeq)
      true
    }
    val bmPath = new Path(dir + "__bloommap")
    val bloom = fs.exists(bmPath) && {
      val head = spark.read.parquet(bmPath.toString)
        .select("__col", "__items").head()
      writeBloomMap(spark, dir, head.getString(0), head.getLong(1))
      true
    }
    (zone, bloom)
  }

  /** Write-audit-publish: stage `df` beside the table, run the
    * expectation suite against the STAGED FILES (what was actually
    * serialized, not the in-memory plan — a writer bug that corrupts
    * rows on disk is exactly what the audit must catch), and publish
    * atomically only when every rule passes. The quality firewall in
    * front of every curated 100 TB table: a bad batch never becomes
    * visible to readers, and the previous published version keeps
    * serving throughout (audit included).
    *
    * Publish is the same two-rename swap as [[compactParquet]]
    * (current → `__wap_old`, staged → dir, delete old), with the same
    * startup recovery: a missing table dir with `__wap_old` present is
    * a mid-swap crash — promote the old version back before doing
    * anything else (conservative: the staged copy's audit verdict
    * predates the crash, the old version was the serving one).
    * A refused batch leaves its staging dir in place for inspection.
    *
    * Returns (published, per-rule report). The report is materialized
    * (rule-count scale) before the verdict is read — the swap must not
    * re-run audit aggregates over files it is about to move. */
  def writeAuditPublish(spark: SparkSession, df: DataFrame, dir: String,
      rules: Seq[graft.operators.Quality.Expectation]): (Boolean, DataFrame) = {
    import org.apache.spark.sql.functions._
    require(rules.nonEmpty, "write-audit-publish needs at least one rule")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(dir + "__wap_staged")
    val old = new Path(dir + "__wap_old")
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"recovery rename $old -> $p failed")
    df.write.mode("overwrite").parquet(staged.toString)
    val report = graft.operators.Quality
      .expect(spark.read.parquet(staged.toString), rules)
    val rows = report.collect() // rule-count scale
    val ok = rows.nonEmpty && rows.forall(_.getAs[Boolean]("passed"))
    if (ok) {
      fs.delete(old, true)
      if (fs.exists(p))
        require(fs.rename(p, old), s"rename $p -> $old failed")
      require(fs.rename(staged, p), s"rename $staged -> $p failed")
      fs.delete(old, true)
    }
    (ok, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), report.schema))
  }

  /** Dynamic partition overwrite (Hive's INSERT OVERWRITE semantics,
    * the lakehouse default): replace ONLY the partitions present in
    * `df`, leaving every other partition untouched — the daily-ingest
    * shape for a date-partitioned 100 TB table, where static
    * overwrite mode would atomically DELETE THE WHOLE TABLE and write
    * back one day. Scoped config flip (partitionOverwriteMode =
    * dynamic), restored afterwards so the session's write semantics
    * don't silently change for later writers. */
  def dynamicOverwrite(spark: SparkSession, df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "dynamic")
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dir)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Debris vacuum for the table-maintenance layer: sweep the sidecar
    * directories that a CRASHED job can leave next to a table —
    * `__wap_staged` (refused or abandoned WAP batches),
    * `__compact_old`/`__compact_tmp` (compaction swap), and the
    * `__zonemap__tmp`/`__bloommap__tmp`/`__*__old` skipping-map swap
    * debris. Live data, the live maps, and anything newer than
    * `olderThanMs` are never touched; age is the standard vacuum
    * guard (a CONCURRENT job's staging dir looks exactly like debris
    * — retention must outlive the longest running write).
    *
    * SAFETY INVARIANT — recovery artifacts survive: `__wap_old` or
    * `__compact_old` WITHOUT a live table dir is a mid-swap crash
    * whose old copy is the only surviving version; the vacuum leaves
    * it for the writer's startup recovery (deleting it would turn a
    * recoverable crash into data loss). The same applies to a map's
    * `__tmp`/`__old` when the live map is missing — `recoverMap`
    * promotes the tmp (append-only superset) or restores the old.
    *
    * Driver-side FS metadata walk, `O(siblings)` — no Spark job, no
    * data reads. Returns one row per candidate: (path, kind,
    * age_seconds, deleted, reason). */
  def vacuumDebris(spark: SparkSession, dir: String,
      olderThanMs: Long = 24L * 3600 * 1000): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    val name = p.getName
    val now = System.currentTimeMillis()
    val debrisSuffixes = Seq("__wap_staged", "__compact_tmp")
    val oldSuffixes = Seq("__wap_old", "__compact_old")
    val mapSwapRe = ("^" + java.util.regex.Pattern.quote(name) +
      "__(zonemap|bloommap)__(tmp|old)$").r
    val rows = if (parent == null || !fs.exists(parent)) Seq.empty else {
      fs.listStatus(parent).toSeq.flatMap { st =>
        val n = st.getPath.getName
        val ageMs = now - st.getModificationTime
        val kind: Option[(String, Boolean)] =
          if (debrisSuffixes.exists(s => n == name + s))
            Some(("staging", true))
          else if (oldSuffixes.exists(s => n == name + s))
            // only debris when the live table exists (else: recovery)
            Some(("swap_old", fs.exists(p)))
          else n match {
            case mapSwapRe(map, which) =>
              // the live map present => tmp/old are leftovers; live
              // missing => recoverMap will promote tmp (or restore
              // old) — both are recovery artifacts then
              val live = new Path(parent, s"${name}__$map")
              Some((s"${map}_$which", fs.exists(live)))
            case _ => None
          }
        kind.map { case (k, deletable) =>
          val oldEnough = ageMs >= olderThanMs
          val doDelete = deletable && oldEnough
          if (doDelete) fs.delete(st.getPath, true)
          val reason =
            if (doDelete) "deleted"
            else if (!deletable) "kept: crash-recovery artifact"
            else "kept: younger than retention"
          (st.getPath.toString, k, ageMs / 1000, doDelete, reason)
        }
      }
    }
    rows.toDF("path", "kind", "age_seconds", "deleted", "reason")
  }
}
