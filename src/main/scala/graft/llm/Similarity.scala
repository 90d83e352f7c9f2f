package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** Similarity search over an embedding column (north star).
  *
  * Three tiers, trading recall for cost:
  *  - [[bruteForceTopK]]: exact cosine top-k, O(|queries|·n). The
  *    baseline and the re-rank stage of the approximate tiers. The
  *    inner product is the codegen'd [[graft.expr.CosineSimilarity]];
  *    per-query top-k is a window `row_number`, so no global sort and
  *    the shuffle carries only (query, candidate, score).
  *  - [[cosineLshBuckets]] + [[lshTopK]]: random-hyperplane sign LSH.
  *    One projection pass per row; candidates restricted to the
  *    query's bucket. Tunable recall via `planes` (fewer planes =
  *    bigger buckets = higher recall, more work).
  *  - [[ivfTopK]]: IVF — KMeans-partitioned index probing the
  *    `nprobe` nearest centroids. The 100 TB path: index build is one
  *    ML fit + one assignment pass; queries touch nprobe/k of the
  *    corpus.
  */
object Similarity {

  /** Exact cosine top-k of `queries` against `candidates`
    * (self-matches excluded when ids collide). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rn"))
  }

  /** Symmetric per-vector int8 quantization: `q_vec[i] = round(v[i] *
    * 127 / max|v|)` as TINYINT, plus the per-row `q_scale` — a 4x
    * storage and scan-IO cut for a 100 TB float32 embedding table.
    * Cosine similarity is scale-invariant, so quantized cosine
    * differs from exact only by rounding noise (O(1/127) per
    * coordinate, averaging out over dims); `sim_quantized_recall`
    * gates top-k agreement end-to-end. Zero vectors quantize to
    * zeros. Dequantize with `transform(q_vec, b -> b / q_scale)`. */
  def quantizeInt8(emb: DataFrame, vecCol: String): DataFrame = {
    val absMax = greatest(
      array_max(transform(col(vecCol), x => abs(x.cast("double")))),
      lit(1e-30))
    emb.withColumn("q_scale", lit(127.0) / absMax)
      .withColumn("q_vec", transform(col(vecCol),
        x => round(x.cast("double") * col("q_scale")).cast("tinyint")))
  }

  /** Random-hyperplane sign buckets: `planes` pseudo-random
    * hyperplanes (deterministic from `seed`), bucket = sign-bit
    * string. Cosine-similar vectors agree on most signs (Charikar
    * 2002), so near-identical vectors share a bucket with high
    * probability. Output: (id, vec, bucket). */
  def cosineLshBuckets(emb: DataFrame, vecCol: String, idCol: String,
      planes: Int = 12, seed: Long = 42L): DataFrame = {
    // Pseudo-random plane p, dim d gets deterministic coefficient
    // hash(p,d,seed) scaled to [-1,1]; the projection is expressed with
    // higher-order array functions — no UDF, stays in codegen.
    val dims = sequence(lit(0), size(col(vecCol)) - 1)
    val bucketBits = (0 until planes).map { p =>
      val coef = (i: org.apache.spark.sql.Column) =>
        (pmod(xxhash64(lit(seed), lit(p), i), lit(2000001L)).cast("double")
          / lit(1000000.0)) - lit(1.0)
      val dot = aggregate(
        zip_with(col(vecCol), transform(dims, coef), (v, c) => v * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      concat(bucketBits: _*).as("bucket"))
  }

  /** Multi-table sign-LSH buckets: `tables` independent hash tables of
    * `planes` hyperplanes each (the standard OR-of-ANDs construction —
    * per-table precision from `planes`, recall from `tables`; a single
    * table's recall@k collapses for isotropic embeddings). One pass
    * computes all tables×planes projections; output one row per
    * (id, table) with that table's bucket. */
  def cosineLshBucketsMulti(emb: DataFrame, vecCol: String, idCol: String,
      planes: Int, tables: Int, seed: Long = 42L): DataFrame = {
    val dims = sequence(lit(0), size(col(vecCol)) - 1)
    val tableBuckets = (0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val coef = (i: org.apache.spark.sql.Column) =>
          (pmod(xxhash64(lit(seed), lit(t), lit(p), i), lit(2000001L)).cast("double")
            / lit(1000000.0)) - lit(1.0)
        val dot = aggregate(
          zip_with(col(vecCol), transform(dims, coef), (v, c) => v * c),
          lit(0.0), (acc, x) => acc + x)
        when(dot >= 0, lit(1)).otherwise(lit(0)).cast("string")
      }
      struct(lit(t).as("table"), concat(bits: _*).as("bucket"))
    }
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.table"), col("tb.bucket"))
  }

  /** Approximate top-k: candidates = pairs sharing a bucket in ANY of
    * the `tables` hash tables, exact cosine re-rank over the distinct
    * candidate set. Shuffle payload after scoring is only
    * (q_id, n_id, cosine). */
  def lshTopK(emb: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, planes: Int = 6, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val cb = cosineLshBucketsMulti(emb, vecCol, idCol, planes, tables, seed)
    val qb = cosineLshBucketsMulti(queries, vecCol, idCol, planes, tables, seed)
      .select(col("id").as("q_id"), col("vec").as("q_vec"),
        col("table"), col("bucket"))
    val scored = qb.join(cb, Seq("table", "bucket"))
      .filter(col("q_id") =!= col("id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("vec")))
      // a pair colliding in several tables is scored per collision
      // (row-local, codegen'd); dedup on the scored triple
      .select(col("q_id"), col("id").as("n_id"), col("cosine"))
      .distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rn"))
  }

  /** IVF index: KMeans cluster assignment per row. Returns
    * (centroids model output) DataFrame with `cluster` column added. */
  def ivfAssign(emb: DataFrame, vecCol: String, nlist: Int = 16,
      seed: Long = 42L): (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    val withVec = emb.withColumn("__mlvec", array_to_vector(col(vecCol)))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__mlvec").setPredictionCol("cluster")
    val model = km.fit(withVec)
    (model.transform(withVec).drop("__mlvec"), model)
  }

  /** A built IVF index: the per-row inverted-list assignment
    * (`n_id`, `n_vec`, `cluster`) and the tiny centroid table. Build
    * ONCE with [[ivfBuild]] (one KMeans fit + one assignment pass over
    * the corpus — [[ivfSave]]/[[ivfLoad]] persist it for reuse), then
    * serve any number of query batches with [[ivfProbe]]. At 100 TB
    * the build is a batch job and the probe touches ~nprobe/nlist of
    * the corpus; re-fitting per query would re-read the corpus every
    * call. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame, nlist: Int)

  /** Standard IVF sizing, nlist ≈ √n: balances inverted-list length
    * (n/nlist rows scanned per probed list) against centroid fan-out
    * (nlist distances per query), with a floor for tiny corpora.
    * Measured on the sf0.1 fixture (2000×64d): recall@5 0.69 at
    * nlist=45/nprobe=12 vs 1.0 brute force. */
  def ivfAutoNlist(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** nprobe companion to [[ivfAutoNlist]]: ~nlist/4 holds recall@5 at
    * ~0.7 on near-isotropic embeddings (the fixture's worst case — a
    * fixed nprobe=4 drops to 0.39 recall once nlist scales to √n).
    * Real, clusterable corpora sustain much smaller fractions; treat
    * this as the conservative default, not the floor. */
  def ivfAutoNprobe(nlist: Int): Int =
    math.max(4, math.ceil(nlist / 4.0).toInt)

  /** Persist a built index as two parquet tables (the build-once
    * artifact a production deployment writes next to the corpus). */
  def ivfSave(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reload a persisted index; the centroid table is tiny (nlist
    * rows), the assigned lists load lazily like any parquet scan. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
    IvfIndex(spark.read.parquet(s"$path/assigned"), centroids,
      centroids.count().toInt)
  }

  /** Build the IVF index (the expensive, do-once half). */
  def ivfBuild(emb: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    val spark = emb.sparkSession
    val (assigned, model) = ivfAssign(emb, vecCol, nlist, seed)
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat))
    }.toSeq.toDF("cluster", "centroid")
    IvfIndex(
      assigned.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cluster")),
      cents, nlist)
  }

  /** Incremental index maintenance: assign NEW vectors to the nearest
    * EXISTING centroid and union them into the inverted lists — no
    * KMeans re-fit, no touch of the already-assigned corpus. This is
    * the warehouse append path: a daily ingest adds rows with one
    * broadcast-join pass over the new rows only, and the index stays
    * probe-identical in shape. The quantization error for appended
    * rows is bounded by the existing centroid geometry (they route to
    * their true nearest list, same rule the builder applied), so
    * recall degrades only as far as the corpus DRIFTS from the
    * centroids' training distribution — `sim_ivf_append_recall` gates
    * parity against a full rebuild. Re-fit on schedule when drift
    * accumulates; that is a policy knob, not a per-batch cost. */
  def ivfAppend(index: IvfIndex, newRows: DataFrame, vecCol: String,
      idCol: String): IvfIndex = {
    // KMeans assigned the original corpus by EUCLIDEAN distance; the
    // append must apply the identical rule or identical vectors could
    // land in different lists than their build-time twins.
    val euclid2 = aggregate(
      zip_with(col("n_vec"), col("centroid"),
        (v, c) => (v.cast("double") - c.cast("double"))
          * (v.cast("double") - c.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val scored = newRows
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("cdist", euclid2)
    val w = Window.partitionBy(col("n_id"))
      .orderBy(col("cdist").asc, col("cluster"))
    val assignedNew = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_id"), col("n_vec"), col("cluster"))
    IvfIndex(index.assigned.unionByName(assignedNew), index.centroids,
      index.nlist)
  }

  /** Probe a built index: route each query to its `nprobe` nearest
    * centroids (broadcast — nlist rows), exact cosine re-rank within
    * those inverted lists. The cheap, repeatable half. */
  def ivfProbe(index: IvfIndex, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val qCents = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("cdist", cosine_similarity(col("q_vec"), col("centroid")))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cdist").desc, col("cluster"))
    val probes = qCents.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cluster"))
    val scored = probes.join(index.assigned, "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rn"))
  }

  /** Build + probe in one call (small/one-shot use; for anything
    * repeated, hold the [[IvfIndex]] and call [[ivfProbe]]). */
  def ivfTopK(emb: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame =
    ivfProbe(ivfBuild(emb, vecCol, idCol, nlist, seed), queries, vecCol, idCol, k, nprobe)
}
