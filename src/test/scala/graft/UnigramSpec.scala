package graft

import graft.llm.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the table scan reads the table"),
    (2L, "table scan and table merge"),
    (3L, "the merge reads the scan"),
    (4L, "scan scan scan table table the"))
    .toDF("doc_id", "text")

  test("train is deterministic; frequent words become single pieces") {
    val m1 = Unigram.train(corpus, "text", vocabSize = 40, iters = 3)
    val m2 = Unigram.train(corpus, "text", vocabSize = 40, iters = 3)
    assert(m1 == m2) // pure function of (corpus, params)
    assert(m1.vocabSize <= 40 + 26)
    val lp = m1.lpMap
    // the dominant whole words survive EM as single pieces
    for (w <- Seq("table", "scan", "the"))
      assert(lp.contains(w), s"'$w' missing from ${lp.keys.toSeq.sorted}")
    // and Viterbi actually uses them: one piece per frequent word
    assert(Unigram.viterbi("table", lp, m1.maxPieceLen) == Vector("table"))
    assert(Unigram.viterbi("scan", lp, m1.maxPieceLen) == Vector("scan"))
  }

  test("encode round-trips: pieces concatenate to the normalized text") {
    val m = Unigram.train(corpus, "text", vocabSize = 40, iters = 3)
    val enc = Unigram.encode(corpus, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = corpus.collect().map(r =>
      r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).mkString).toMap
    enc.foreach { case (id, pieces) =>
      assert(pieces.mkString == want(id), s"doc $id")
    }
    // unseen characters fall back to single-char pieces, still exact
    val odd = Seq((9L, "table zq7 scan")).toDF("doc_id", "text")
    val oddEnc = Unigram.encode(odd, "text", "doc_id", m)
      .collect().head.getSeq[String](1)
    assert(oddEnc.mkString == "tablezq7scan")
    assert(oddEnc.contains("table") && oddEnc.contains("scan"))
  }

  test("viterbi: probabilities, not greed, decide the segmentation") {
    // 'ab' is much likelier than 'a'+'b'; 'abc' as a piece beats both
    val lp = Map("a" -> -5000000L, "b" -> -5000000L, "ab" -> -2000000L,
      "c" -> -3000000L, "abc" -> -1000000L)
    assert(Unigram.viterbi("ab", lp, 6) == Vector("ab"))
    assert(Unigram.viterbi("abc", lp, 6) == Vector("abc"))
    // without the big pieces the char path is the only one
    assert(Unigram.viterbi("ba", lp, 6) == Vector("b", "a"))
    // tie: equal scores keep the longer piece ending at the boundary
    val tied = Map("x" -> -1000000L, "xx" -> -2000000L)
    assert(Unigram.viterbi("xx", tied, 6) == Vector("xx"))
  }

  test("save/load round-trips the model") {
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString + "/m"
    val m = Unigram.train(corpus, "text", vocabSize = 40, iters = 2)
    Unigram.save(m, spark, dir)
    assert(Unigram.load(spark, dir) == m)
  }
}
