package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary overlap (north star; no analogue in the
  * 2016 reference): how much do two data sources share, measured as
  * Jaccard similarity of their token n-gram vocabularies? This is the
  * planning step BEFORE cross-corpus dedup/decontamination — "is
  * source B worth ingesting, or is it 80% of what source A already
  * gave us?"
  *
  * Two tiers, mirroring the dedup family's exact/approximate split:
  *  - [[exact]]: one gram-keyed shuffle per corpus. Grams are hashed
  *    to md5 BEFORE the distinct so the exchange carries 16-byte keys,
  *    never gram text — md5 rather than xxhash64 because an external
  *    engine can replay it bit-for-bit (the DuckDB oracle does).
  *  - [[kmvEstimate]]: a bottom-k (KMV) sketch per corpus — two
  *    scans, two k-row `TakeOrdered` merges, and a driver-scale
  *    combine. At 100 TB this is the production path: the full
  *    distinct-vocabulary shuffle never happens, and the estimate's
  *    error is O(1/sqrt(k)) (Bar-Yossef et al. 2002; Beyer et al.,
  *    SIGMOD'07 for the Jaccard form used here).
  */
object CorpusOverlap {

  private def gramKeys(df: DataFrame, textCol: String, n: Int) =
    df.select(explode(array_distinct(
        TextAnalysis.tokenGrams(col(textCol), n))).as("gram"))

  /** Exact n-gram vocabulary Jaccard. One row:
    * (n_grams_a, n_grams_b, n_shared, jaccard). Set membership is
    * computed over md5(gram) (collision odds ~2^-128 — negligible
    * against any corpus size, and exactly replayable by an external
    * oracle engine). The only wide exchange carries the 16-byte key and
    * two booleans. */
  def exact(a: DataFrame, b: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    // unhex packs the key to 16 raw bytes — same membership sets as the
    // hex string an external oracle groups by, half the exchange width
    val tagged = gramKeys(a, textCol, n).select(unhex(md5(col("gram"))).as("k"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .union(gramKeys(b, textCol, n).select(unhex(md5(col("gram"))).as("k"),
        lit(0).as("in_a"), lit(1).as("in_b")))
    tagged.groupBy(col("k"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .agg(
        sum(col("in_a")).cast("long").as("n_grams_a"),
        sum(col("in_b")).cast("long").as("n_grams_b"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_shared"))
      .select(col("n_grams_a"), col("n_grams_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("n_grams_a") + col("n_grams_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** KMV (bottom-k minimum values) Jaccard estimate. One row:
    * (est_jaccard). Per corpus: hash every distinct gram with xxhash64
    * and keep the k smallest hashes — a per-partition top-k plus one
    * merge, no vocabulary-wide shuffle of gram text. Combine: with
    * S = bottom-k of the union of both sketches, the fraction of S
    * present in BOTH sketches is an unbiased Jaccard estimator.
    * Everything after the two scans operates on <= 2k rows. */
  def kmvEstimate(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3, k: Int = 1024): DataFrame = {
    require(k > 0, s"k must be > 0 (got $k)")
    def sketch(df: DataFrame) =
      gramKeys(df, textCol, n)
        .select(xxhash64(col("gram")).as("h")).distinct()
        .orderBy(col("h")).limit(k)
    val sa = sketch(a).withColumn("in_a", lit(1)).withColumn("in_b", lit(0))
    val sb = sketch(b).withColumn("in_a", lit(0)).withColumn("in_b", lit(1))
    sa.union(sb)
      .groupBy(col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .orderBy(col("h")).limit(k)
      .agg((sum(col("in_a") * col("in_b")).cast("double") /
        count(lit(1)).cast("double")).as("est_jaccard"))
  }
}
