package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023
  * — public method): pick raw-pool documents whose token distribution
  * looks like a small TARGET corpus, by scoring each document with the
  * log-likelihood ratio of its tokens under the target's unigram model
  * vs the raw pool's own.
  *
  *   weight(d) = Σ_tok∈d  ln p_target(tok) − ln p_raw(tok)
  *
  * both models add-one smoothed over the UNION vocabulary, so a token
  * the target never saw contributes a finite negative vote instead of
  * −∞. Per-token log-ratios are quantized to integer micro-nats the
  * same way as [[TextAnalysis.unigramNll]] (each model's log-prob
  * rounded separately, then differenced as exact integers), so the
  * per-document sum is order-independent and replayable by any engine.
  *
  * Scale shape (the same one unigramNll proved out): one explode per
  * corpus, two token-keyed hash-aggs (raw counts, target counts), the
  * vocabulary size and both totals as 1-row broadcasts, one
  * token-keyed join of the raw exploded stream against the per-token
  * score dim, and a per-doc re-agg. Nothing but (id, token) ever
  * shuffles; the target corpus is the small side by construction.
  * At 100 TB the paper's hashed-feature trick (`hashBuckets`) caps the
  * score dim at a fixed size regardless of vocabulary growth — token
  * strings collapse to xxhash64 buckets BEFORE any shuffle, so the
  * join key is 8 bytes and collisions only blur scores (the paper's
  * own trade), never corrupt them.
  */
object Dsir {

  private def toks(df: DataFrame, textCol: String, keep: Seq[Column],
      hashBuckets: Option[Int]): DataFrame = {
    val t = df.select(keep :+ explode(split(col(textCol), "\\s+")).as("__tok"): _*)
      .filter(col("__tok") =!= "")
    hashBuckets match {
      case Some(b) =>
        require(b > 0, "hashBuckets must be positive")
        t.withColumn("__tok",
          pmod(xxhash64(col("__tok")), lit(b.toLong)).cast("string"))
      case None => t
    }
  }

  /** Per-document importance weight: (idCol, n_tok, dsir_micros).
    * Positive = more target-like than pool-average. Docs with no
    * tokens drop out (no evidence either way). */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hashBuckets: Option[Int] = None): DataFrame = {
    val rawToks = toks(raw, textCol, Seq(col(idCol)), hashBuckets)
    val tgtToks = toks(target, textCol, Seq.empty, hashBuckets)
    val cr = rawToks.groupBy(col("__tok")).agg(count(lit(1)).as("__cr"))
    val ct = tgtToks.groupBy(col("__tok")).agg(count(lit(1)).as("__ct"))
    // union vocabulary + corpus totals: three 1-row broadcasts
    val v = cr.select(col("__tok")).unionByName(ct.select(col("__tok")))
      .distinct().agg(count(lit(1)).as("__v"))
    val nr = cr.agg(sum(col("__cr")).as("__nr"))
    val nt = ct.agg(sum(col("__ct")).as("__nt"))
    // tokens absent from the target still score (add-one): left join,
    // zero-fill. Each model's log-prob rounds to micro-nats on its
    // own (the unigramNll-proven replayable shape); the difference is
    // then exact integer arithmetic.
    val scored = cr.join(ct, Seq("__tok"), "left_outer")
      .na.fill(0L, Seq("__ct"))
      .crossJoin(broadcast(v)).crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .withColumn("__lr_micros",
        (round(log((col("__ct") + lit(1)).cast("double") /
            (col("__nt") + col("__v")).cast("double")) * 1e6) -
         round(log((col("__cr") + lit(1)).cast("double") /
            (col("__nr") + col("__v")).cast("double")) * 1e6)).cast("long"))
      .select(col("__tok"), col("__lr_micros"))
    rawToks.join(scored, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("n_tok"),
        sum(col("__lr_micros")).cast("bigint").as("dsir_micros"))
  }

  /** Greedy selection: the k most target-like documents, ties broken
    * by id. Plans as TakeOrderedAndProject — never a global sort. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, hashBuckets: Option[Int] = None): DataFrame =
    importanceWeights(raw, target, idCol, textCol, hashBuckets)
      .orderBy(desc("dsir_micros"), col(idCol))
      .limit(k)

  /** The paper's actual RESAMPLING: Gumbel-top-k over the importance
    * weights — k draws without replacement where a document's selection
    * probability is proportional to exp(weight / temperature). The
    * Gumbel noise comes from a seeded per-document hash, so the draw
    * is exactly reproducible (and replayable across cluster sizes):
    * u = hash(id, seed) mapped into (0,1), g = −ln(−ln u). Temperature
    * in micro-nats; higher = flatter (more diversity), lower → the
    * greedy [[selectTopK]]. */
  def resampleGumbel(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, temperatureMicros: Long, seed: Long = 42L,
      hashBuckets: Option[Int] = None): DataFrame = {
    require(temperatureMicros > 0, "temperatureMicros must be positive")
    val w = importanceWeights(raw, target, idCol, textCol, hashBuckets)
    // 53-bit uniform in (0,1) — open on both ends so the Gumbel
    // transform never sees ln(0) or ln(1)
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 53)) + lit(1))
      .cast("double") / lit((1L << 53).toDouble + 2.0)
    w.withColumn("__key",
        col("dsir_micros").cast("double") / lit(temperatureMicros.toDouble) -
          log(-log(u)))
      .orderBy(desc("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }
}
