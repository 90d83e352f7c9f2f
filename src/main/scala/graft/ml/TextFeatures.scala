package graft.ml

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Word2Vec, Word2VecModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text/ML feature operators (reference theme P5, README.md:274-422),
  * on spark.ml (DataFrame-native) rather than the reference's
  * RDD-based mllib.
  *
  * The reference's TF-IDF uses 2^20 hashed features (README.md:298,306)
  * and its Word2Vec uses minCount=2 (README.md:386); both defaults are
  * kept. `.cache()` before the IDF/Word2Vec fit mirrors the
  * reference's `tf.cache()` (README.md:299) — these are multi-pass
  * fits, so recomputing the upstream scan per pass would double-read
  * the corpus at 100 TB.
  */
object TextFeatures {

  def tokenize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens", split(lower(col(textCol)), "\\s+"))

  /** HashingTF(2^20) + IDF, the reference pipeline README.md:292-307.
    * Returns (df with `tf` and `tfidf` vector columns, idf model). */
  def tfidf(df: DataFrame, textCol: String,
      numFeatures: Int = 1 << 20): (DataFrame, IDFModel) = {
    val toks = tokenize(df, textCol)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    val tfd = tf.transform(toks).cache()
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    val model = idf.fit(tfd)
    (model.transform(tfd), model)
  }

  /** Seeded Word2Vec (reference README.md:383-392). One fit partition
    * keeps training deterministic for the spec suite; real corpora
    * raise `numPartitions` and accept run-to-run drift. */
  def word2vec(df: DataFrame, textCol: String, vecSize: Int = 32,
      minCount: Int = 2, seed: Long = 42L): Word2VecModel = {
    val toks = tokenize(df, textCol).select("tokens").cache()
    new Word2Vec().setInputCol("tokens").setOutputCol("w2v")
      .setVectorSize(vecSize).setMinCount(minCount)
      .setSeed(seed).setNumPartitions(1).setMaxIter(1)
      .fit(toks)
  }

  /** `findSynonyms` as a DataFrame (word, similarity) — the
    * reference's `model.findSynonyms('revenge', 10)` README.md:388. */
  def synonyms(model: Word2VecModel, word: String, k: Int): DataFrame =
    model.findSynonyms(word, k)
}
