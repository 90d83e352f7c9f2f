package graft

import org.apache.spark.sql.functions._
import graft.ml.{Projection, TextFeatures}

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf: term present in every doc gets ~zero weight (metamorphic)") {
    val df = Seq(
      (1L, "common alpha"), (2L, "common beta"), (3L, "common gamma"))
      .toDF("doc_id", "text")
    val (out, model) = TextFeatures.tfidf(df, "text", numFeatures = 1 << 12)
    // 'common' appears in all 3 docs -> idf = ln((3+1)/(3+1)) = 0
    val hasher = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(1 << 12)
    val idx = hasher.indexOf("common")
    assert(model.idf(idx) == 0.0)
    // each doc's tfidf at 'common' index is 0
    val vecs = out.select("tfidf").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    vecs.foreach(v => assert(v(idx) == 0.0))
  }

  test("word2vec: synonyms exclude query word, sims in [-1,1] descending") {
    val docs = Tables.documents(spark, sf0001)
    val model = TextFeatures.word2vec(docs, "text")
    val syn = TextFeatures.synonyms(model, "the", 5).collect()
    assert(syn.length == 5)
    assert(!syn.map(_.getString(0)).contains("the"))
    val sims = syn.map(_.getDouble(1))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("word2vec deterministic under fixed seed") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val a = TextFeatures.word2vec(docs, "text").getVectors
      .collect().map(r => r.getString(0) -> r.get(1).toString).toMap
    val b = TextFeatures.word2vec(docs, "text").getVectors
      .collect().map(r => r.getString(0) -> r.get(1).toString).toMap
    assert(a == b)
  }

  test("pca: output dim k, variance concentrated in leading components") {
    val (projected, model) = Projection.pca(Tables.embeddings(spark, sf0001), "embedding", k = 8)
    val row = projected.select("pca").head().getSeq[Double](0)
    assert(row.length == 8)
    val ev = model.explainedVariance.toArray
    assert(ev.length == 8)
    ev.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) case _ => }
  }
}
