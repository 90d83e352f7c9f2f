package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** BPE tokenizer: the Sennrich training loop on the Zipf word table,
  * greedy lowest-rank encode, and the round-trip/compression
  * contracts `bpe_gate` grades at the driver. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE corpus: 'est' and 'lo' pairs dominate
  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("training is deterministic and learns the frequent pairs first") {
    val m1 = Bpe.train(corpus, "text", nMerges = 10, minPairCount = 2)
    val m2 = Bpe.train(corpus, "text", nMerges = 10, minPairCount = 2)
    assert(m1.merges == m2.merges, "same corpus must learn the same merges")
    assert(m1.merges.nonEmpty)
    // 'e'+'s' has count 9 (newest x6 + widest x3) — the top first merge
    assert(m1.merges.head == ("e", "s"), s"got ${m1.merges.head}")
    // 's'+'t' merges next as 'es'+'t' (count 9)
    assert(m1.merges(1) == ("es", "t"), s"got ${m1.merges(1)}")
  }

  test("encode: frequent words collapse to few tokens, round-trip holds") {
    val model = Bpe.train(corpus, "text", nMerges = 50, minPairCount = 2)
    val enc = Bpe.encode(corpus, "text", "doc_id", model)
      .select($"doc_id", $"tokens", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // 'newest' appears 6x — after 50 merges it is one token
    val newest = enc(3L)
    assert(newest.distinct == Vector("newest" + Bpe.EndOfWord),
      s"got $newest")
    // round-trip: strip the terminal, concat == the source words
    corpus.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val rebuilt = enc(id).map(_.replace(Bpe.EndOfWord, "")).mkString
      assert(rebuilt == text.toLowerCase.split("\\s+").mkString, s"doc $id")
    }
  }

  test("zero merges = character tokenization; OOV chars pass through") {
    val model = Bpe.BpeModel(Seq.empty, Set("a", "b", Bpe.EndOfWord))
    val enc = Bpe.encode(Seq((1L, "ab zq")).toDF("doc_id", "text"),
      "text", "doc_id", model).select($"tokens").head().getSeq[String](0)
    assert(enc == Seq("a", "b", Bpe.EndOfWord, "z", "q", Bpe.EndOfWord))
  }

  test("mergePair is greedy left-to-right on overlaps") {
    assert(Bpe.mergePair(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergePair(Vector("a", "b", "a", "b"), "a", "b") ==
      Vector("ab", "ab"))
  }

  test("encodeWord applies lowest rank first, not leftmost pair") {
    // ranks: ('s','t') rank 0, ('e','s') rank 1 — encode must do 'st'
    // FIRST even though 'es' appears earlier in the word
    val ranks = Map(("s", "t") -> 0, ("e", "s") -> 1)
    val got = Bpe.encodeWord("est", ranks)
    assert(got == Vector("e", "st", Bpe.EndOfWord), s"got $got")
  }

  test("save/load round-trips the model; ids are stable and reversible") {
    val model = Bpe.train(corpus, "text", nMerges = 30, minPairCount = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/m"
    Bpe.save(model, spark, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded.merges == model.merges, "merge order must survive parquet")
    assert(loaded.baseSymbols == model.baseSymbols)
    // ids: deterministic, dense, reversible through the sorted vocab
    val ids = Bpe.vocabIds(model)
    assert(ids.values.toSeq.sorted == (0 until model.vocabSize))
    val rev = ids.map(_.swap)
    val encIds = Bpe.encodeToIds(corpus, "text", "doc_id", model)
      .select($"doc_id", $"token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val encToks = Bpe.encode(corpus, "text", "doc_id", model)
      .select($"doc_id", $"tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    encIds.foreach { case (id, seq) =>
      assert(seq.forall(_ >= 0), "training corpus has no OOV")
      assert(seq.map(rev) == encToks(id), s"doc $id ids != tokens")
    }
    // OOV chars emit byte-fallback ids (vocabSize + UTF-8 byte), not
    // UnkId, and decode losslessly
    val oov = Bpe.encodeToIds(Seq((9L, "☃")).toDF("doc_id", "text"),
      "text", "doc_id", model).select($"token_ids").head().getSeq[Int](0)
    assert(!oov.contains(Bpe.UnkId))
    assert(oov.forall(i => i >= 0 && i < Bpe.idSpaceSize(model)))
    // ☃ = 3 UTF-8 bytes, then the in-vocab terminal marker
    assert(oov.count(_ >= model.vocabSize) == 3)
    assert(Bpe.decodeIdSeq(oov, model) == "☃")
  }

  test("byte fallback round-trips marker/escape/astral chars losslessly") {
    val model = Bpe.train(corpus, "text", nMerges = 30, minPairCount = 2)
    // NUL (the terminal marker), SOH (the escape char), literal '</w>'
    // (the forgeable old marker), and an astral code point — all must
    // survive encode -> decode exactly (whitespace-normalized, lowercased)
    val nasty = Seq(
      (1L, "low\u0000mid\u0001end"),
      (2L, "a</w>b \u0000\u0001 \u00010"),
      (3L, "𝄞 clef 𝄞x"),
      (4L, "newest widest plain"))
    val df = nasty.toDF("doc_id", "text")
    val ids = Bpe.encodeToIds(df, "text", "doc_id", model)
    val dec = Bpe.decodeIds(ids, "token_ids", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.foreach { case (id, text) =>
      val expect = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
      assert(dec(id) == expect, s"doc $id: ${dec(id)} != $expect")
    }
    // zero UnkId anywhere
    val allIds = ids.select($"token_ids").collect()
      .flatMap(_.getSeq[Int](0))
    assert(!allIds.contains(Bpe.UnkId))
  }

  test("unescape inverts the escape prefix code, unit-aligned") {
    // raw SOH followed by raw '0' must NOT collapse into NUL
    val tricky = Seq("\u0000", "\u0001", "\u00010", "\u0001\u0000",
      "\u0000\u0001", "a\u0000b", "</w>", "plain", "")
    tricky.foreach { raw =>
      val escaped = raw.flatMap(c =>
        if (c == '\u0000') "\u00010"
        else if (c == '\u0001') "\u0001\u0001"
        else c.toString)
      assert(Bpe.unescape(escaped) == raw, s"raw=${raw.toList}")
      // escaped text never contains the terminal marker
      assert(!escaped.contains(Bpe.EndOfWord))
    }
  }

  test("vocab: base alphabet + merge products, bounded by nMerges") {
    val m = Bpe.train(corpus, "text", nMerges = 20, minPairCount = 2)
    assert(m.vocabSize <= m.baseSymbols.size + 20)
    assert(m.vocab.contains("est"))
    assert(m.baseSymbols.contains(Bpe.EndOfWord))
  }
}
