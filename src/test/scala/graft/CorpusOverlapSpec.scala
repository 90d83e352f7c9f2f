package graft

import org.apache.spark.sql.functions._
import graft.llm.CorpusOverlap

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("exact: hand-computed 2-gram Jaccard on tiny corpora") {
    // A grams: {a b, b c, c d}; B grams: {b c, c d, d e}
    // shared = {b c, c d} = 2; union = 4 -> jaccard 0.5
    val a = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val b = Seq((2L, "b c d e")).toDF("doc_id", "text")
    val r = CorpusOverlap.exact(a, b, "text", n = 2).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.5)
  }

  test("exact: identical corpora give jaccard 1, disjoint give 0") {
    val a = Seq((1L, "x y z w")).toDF("doc_id", "text")
    val c = Seq((3L, "p q r s")).toDF("doc_id", "text")
    assert(CorpusOverlap.exact(a, a, "text", 2).collect()(0).getDouble(3) == 1.0)
    assert(CorpusOverlap.exact(a, c, "text", 2).collect()(0).getDouble(3) == 0.0)
  }

  test("kmvEstimate is exact when both vocabularies fit inside k") {
    // vocab far below k=1024: the bottom-k sets ARE the full hash sets,
    // so the estimator degenerates to the exact Jaccard
    val a = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val b = Seq((2L, "c d e f g h")).toDF("doc_id", "text")
    val exact = CorpusOverlap.exact(a, b, "text", 2).collect()(0).getDouble(3)
    val est = CorpusOverlap.kmvEstimate(a, b, "text", 2, k = 1024)
      .collect()(0).getDouble(0)
    assert(est == exact, s"est $est vs exact $exact")
  }

  test("kmvEstimate tracks exact within O(1/sqrt(k)) on the documents table") {
    val docs = Tables.documents(spark, sf001)
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val exact = CorpusOverlap.exact(a, b, "text", 3).collect()(0).getDouble(3)
    val est = CorpusOverlap.kmvEstimate(a, b, "text", 3, k = 512)
      .collect()(0).getDouble(0)
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }
}
