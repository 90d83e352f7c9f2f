package graft

import org.apache.spark.sql.functions._
import graft.llm.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val target = docs.filter($"lang" === "en")

  test("weights: one row per non-empty doc, n_tok matches the tokenizer") {
    val w = Dsir.importanceWeights(docs, target, "doc_id", "text")
    val expected = docs
      .select($"doc_id", size(filter(split($"text", "\\s+"), t => t =!= ""))
        .as("n"))
      .filter($"n" > 0)
    assert(w.count() == expected.count())
    val joined = w.join(expected, "doc_id")
      .filter($"n_tok" =!= $"n").count()
    assert(joined == 0)
  }

  test("a target document outscores an off-target one") {
    // hand corpus: target speaks of cats, the pool has a cat doc and a
    // zx-jargon doc — the cat doc must carry the higher weight
    val pool = Seq((1L, "the cat sat on the mat"),
      (2L, "zx qq ww zz xx yy")).toDF("doc_id", "text")
    val tgt = Seq((10L, "cat mat cat the the on sat")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(pool, tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) > w(2L))
    assert(w(1L) > 0 && w(2L) < 0)
  }

  test("weights are translation-consistent: duplicate texts tie exactly") {
    val pool = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon")).toDF("doc_id", "text")
    val tgt = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(pool, tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) == w(2L))
  }

  test("selectTopK is deterministic and ranked") {
    val a = Dsir.selectTopK(docs, target, "doc_id", "text", 20).collect()
    val b = Dsir.selectTopK(docs, target, "doc_id", "text", 20).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val ws = a.map(_.getLong(2)).toSeq
    assert(ws == ws.sorted.reverse)
    // the top of an en-targeted ranking should be visibly en-enriched
    // over the pool's base rate (the synthetic corpus shares vocabulary
    // across languages, so dominance — not purity — is the contract)
    val topIds = a.map(_.getLong(0)).toSet
    val enFrac = docs.filter($"doc_id".isin(topIds.toSeq: _*))
      .filter($"lang" === "en").count().toDouble / topIds.size
    val baseRate = docs.filter($"lang" === "en").count().toDouble / docs.count()
    assert(enFrac >= baseRate + 0.15,
      s"en fraction of top-20 = $enFrac vs base rate $baseRate")
  }

  test("hashed features keep the scale contract without wrecking the signal") {
    val plain = Dsir.selectTopK(docs, target, "doc_id", "text", 20)
      .select($"doc_id").as[Long].collect().toSet
    val hashed = Dsir.selectTopK(docs, target, "doc_id", "text", 20,
        hashBuckets = Some(4096))
      .select($"doc_id").as[Long].collect().toSet
    // collisions blur, they don't invert: large overlap with the exact cut
    assert((plain intersect hashed).size >= 12,
      s"overlap = ${(plain intersect hashed).size}")
  }

  test("gumbel resample: seeded determinism, k rows, seed sensitivity") {
    val d1 = Dsir.resampleGumbel(docs, target, "doc_id", "text", 30,
      temperatureMicros = 200000L, seed = 7L).select($"doc_id").as[Long].collect()
    val d2 = Dsir.resampleGumbel(docs, target, "doc_id", "text", 30,
      temperatureMicros = 200000L, seed = 7L).select($"doc_id").as[Long].collect()
    val d3 = Dsir.resampleGumbel(docs, target, "doc_id", "text", 30,
      temperatureMicros = 200000L, seed = 8L).select($"doc_id").as[Long].collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.length == 30)
    assert(d1.toSet != d3.toSet) // a different seed draws a different sample
  }
}
