package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Bloom-prefiltered join — the runtime-filter pattern as an
    * explicit operator: aggregate the (selective) dim side's keys into
    * ONE Bloom sketch (a 1-row aggregate, broadcast), drop the fact
    * rows whose key cannot be in the dim BEFORE the join's exchange,
    * then run the exact equi-join (which also clears the Bloom's
    * false positives — the result is exactly the plain join's).
    *
    * At 100 TB this is the difference between shuffling the whole
    * fact table and shuffling only the ~|dim-matching| slice: with a
    * 1% -selective dim, ~99% of fact rows die at the scan side for
    * the cost of one broadcast bitmap probe per row. Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter` applies the same trick
    * only when its heuristics fire; this form is deterministic and
    * composable. `join_bloom_prefilter` pins result-equality to the
    * plain join; ScaleSpec pins that the probe sits BELOW the join.
    *
    * LAZY: the sketch is a SCALAR SUBQUERY in the returned plan
    * (`Dataset.scalar()`), not an eager collect — construction runs no
    * job; the 1-row sketch aggregate executes as a subquery stage when
    * the query runs, exactly how Spark's own injected runtime bloom
    * filters are shaped (`BloomFilterMightContain` accepts a foldable
    * OR a scalar-subquery bloom). The dim side of a prefilter is
    * selective by construction; if it isn't, use a plain join. */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedDimKeys: Long = 1000000L): DataFrame = {
    val sketch = dim.agg(graft.functions.bloom_filter_agg(
        col(dimKey), expectedDimKeys, expectedDimKeys * 8).as("__bf"))
      .scalar()
    fact.filter(graft.functions.might_contain(sketch, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
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

  /** Per-key skew profile — the diagnostic you run BEFORE choosing a
    * join strategy at 100 TB: the `topK` heaviest keys with their row
    * counts, exact parts-per-million share of the table, and the salt
    * factor (`ceil(rows / targetRowsPerTask)`) that `saltedJoin`
    * would need to spread that key to ~one task's worth of rows per
    * reducer. A profile whose top entry reads `salt_factor = 1` says
    * a plain shuffle join is safe; `salt_factor = 40` says AQE's
    * skew splitting (or explicit salting) is mandatory.
    *
    * Cost shape: ONE partial-aggregated key shuffle (map-side combine
    * shrinks it to distinct-key scale — fixed-width rows, the payload
    * never moves), a lazy scalar subquery for the total (no driver
    * collect), and a TakeOrderedAndProject top-k (no global sort).
    * Share and salt are integral arithmetic (`div`, not IEEE `/`) so
    * the numbers are exact past 2^53 and engine-independent. */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 20,
      targetRowsPerTask: Long = 4000000L): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("key_rows"))
    // 1-row total, broadcast — a lazy plan stage, not a driver collect.
    // Deliberately count(*) over the INPUT, not sum over perKey: the
    // branches of a DAG re-execute, and summing the rollup would pay
    // the key shuffle twice — a zero-column scan + partial count is
    // the cheap way to the same number. The DECIMAL(38,0) widening
    // before the multiply keeps the ppm numerator exact far past long
    // overflow at 100 TB row counts.
    val totalDf = df.agg(count(lit(1)).as("__total"))
    perKey.crossJoin(broadcast(totalDf))
      .withColumn("share_ppm",
        expr("CAST(key_rows AS DECIMAL(38,0)) * 1000000 div __total"))
      .withColumn("salt_factor",
        expr(s"(key_rows + ${targetRowsPerTask - 1}L) div ${targetRowsPerTask}L"))
      .drop("__total")
      .orderBy(col("key_rows").desc, col(keyCol))
      .limit(topK)
  }

  /** Skew-proof HOLISTIC aggregation: two-phase salted collect for
    * the aggregates partial aggregation cannot decompose. Sums and
    * counts shrink map-side, so a hot key never hurts them — but
    * `collect_list`/`collect_set` ship every row of a key to ONE
    * reducer, and a key holding 30% of a 100 TB table melts it. The
    * fix is the salted two-phase shape: phase 1 collects per
    * (key, salt) — the hot key's rows spread over `salt` reducers,
    * each buffering 1/salt of the payload — and phase 2 merges `salt`
    * pre-collected ARRAYS per key (rows already gone from the
    * shuffle). The merged array is sorted, which both pins the
    * nondeterministic collect order and makes the salted result
    * EXACTLY equal the direct form — same elements, same order, any
    * salt. Distinctness (the set form) applies after the merge;
    * phase-1 `array_distinct` pre-shrinks each salted slice so the
    * phase-2 payload is bounded by salt × distinct-values, not rows.
    *
    * The salt hashes the VALUE (not a random id): duplicate values
    * land on the same reducer, so the set form dedups most copies in
    * phase 1. */
  def saltedCollect(df: DataFrame, keyCol: String, valueCol: Column,
      distinct: Boolean = false, salt: Int = 16): DataFrame = {
    require(salt >= 1, s"salt must be >= 1 (got $salt)")
    val phase1 = df
      .withColumn("__v", valueCol)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(salt)).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg((if (distinct) array_distinct(collect_list(col("__v")))
            else collect_list(col("__v"))).as("__part"))
    val merged = phase1.groupBy(col(keyCol))
      .agg(flatten(collect_list(col("__part"))).as("__all"))
    val values =
      if (distinct) sort_array(array_distinct(col("__all")))
      else sort_array(col("__all"))
    merged.select(col(keyCol), values.as("values"))
      .withColumn("n_values", size(col("values")).cast("bigint"))
  }

  /** Token-budget sharding: assign every row a `shard_id` such that
    * consecutive rows in `idCol` order accumulate ~`budgetTokens`
    * tokens per shard — how a training corpus is split into
    * fixed-token-count output files. A row's shard is
    * `floor(tokens_before_it / budget)`, so the result is a pure
    * function of the data (independent of partitioning) and a shard
    * overshoots the budget by at most one row's tokens.
    *
    * The global running sum is a DISTRIBUTED PREFIX SUM, not a
    * single-partition window (`Window.orderBy` with no partitionBy
    * funnels 100 TB through one task): (1) range-repartition by id
    * and sort within partitions; (2) one tiny aggregate collects the
    * per-partition subtotals — `numPartitions` rows, the only
    * driver-side state; (3) broadcast the exclusive prefix offsets
    * back and stream each partition once, adding its offset to a local
    * running sum (genuine per-partition imperative logic — the
    * mapPartitions escape hatch earns its keep here). Null token
    * counts count as 0. SIDE-EFFECTING at plan-construction time: the
    * subtotal pass runs eagerly (the input is localCheckpoint'd so the
    * range shuffle is paid once, not twice). */
  def tokenShards(df: DataFrame, idCol: String, tokenCol: String,
      budgetTokens: Long, partitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0 (got $budgetTokens)")
    // `div` (IntegralDivide on LongType), NOT Column `/`: the latter is
    // IEEE double division, which loses bit-exactness once cumulative
    // token starts pass 2^53 — a 100 TB corpus gets there.
    tokenStarts(df, idCol, tokenCol, "__tok_start", partitions)
      .withColumn("shard_id", expr(s"__tok_start div ${budgetTokens}L"))
      .drop("__tok_start")
  }

  /** Global exclusive prefix sum of `tokenCol` in `idCol` order,
    * emitted as `startCol` — the distributed-prefix-sum core shared by
    * [[tokenShards]] and [[packSequences]] (see tokenShards doc for
    * the shape: range-repartition → per-partition subtotals → the one
    * justified collect — numPartitions rows — → broadcast offsets →
    * one streaming pass). */
  def tokenStarts(df: DataFrame, idCol: String, tokenCol: String,
      startCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint(true)
    val tokIdx = ranged.schema.fieldIndex(tokenCol)
    val sums = ranged
      .groupBy(spark_partition_id().as("pid"))
      // coalesce: a partition whose rows all carry null token counts
      // must contribute 0, not a null subtotal
      .agg(coalesce(sum(col(tokenCol).cast("long")), lit(0L)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { i =>
        val o = i -> acc; acc += sums.getOrElse(i, 0L); o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = ranged.schema.add(startCol, LongType, nullable = false)
    ranged.mapPartitions { it =>
      val off = bc.value.getOrElse(TaskContext.getPartitionId(), 0L)
      var run = 0L
      it.map { r =>
        val t = if (r.isNullAt(tokIdx)) 0L
          else r.getAs[Number](tokIdx).longValue()
        val start = off + run
        run += t
        Row.fromSeq(r.toSeq :+ start)
      }
    }(Encoders.row(outSchema))
  }

  /** Sequence packing — the LLM-pretraining "concatenate the corpus
    * and chunk it into fixed-length training sequences" step, as an
    * INDEX: concatenating documents in `idCol` order, each document
    * occupies global token interval [start, start+n); training
    * sequence `s` is the fixed window [s*seqLen, (s+1)*seqLen). The
    * result has one row per (document × sequence it intersects):
    * `seq_id`, `doc_off` (first token of the doc in this chunk),
    * `seq_off` (where it lands in the sequence), `chunk_len`. Docs
    * split across sequence boundaries (standard concat-and-chunk);
    * zero/null-token docs occupy no tokens and are dropped.
    *
    * Scale: the prefix sum is [[tokenStarts]] (one range shuffle +
    * a numPartitions-row collect); the explode is row-local with
    * fan-out ceil(n/seqLen)+1 ≤ 2 for typical docs ≤ seqLen. The
    * result is a pure function of the data — any engine can replay
    * it from the running sum (see the pack_sequences oracle). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      seqLen: Long, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0 (got $seqLen)")
    val n = col(tokenCol).cast("long")
    val start = col("__tok_start")
    val s = col("seq_id")
    // integral `div`, not IEEE `/`: exact past 2^53 cumulative tokens
    tokenStarts(df, idCol, tokenCol, "__tok_start", partitions)
      .filter(n > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"__tok_start div ${seqLen}L"),
        expr(s"(__tok_start + CAST(`$tokenCol` AS BIGINT) - 1L) div ${seqLen}L"))))
      .withColumn("doc_off", greatest(s * seqLen - start, lit(0L)))
      .withColumn("seq_off", greatest(start - s * seqLen, lit(0L)))
      .withColumn("chunk_len",
        least((s + 1) * seqLen, start + n) - greatest(s * seqLen, start))
      .drop("__tok_start")
  }
}
