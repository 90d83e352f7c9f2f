package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — train + encode, the real version of
  * the `n_bpe_chunks` regex estimate in [[TextAnalysis.tokenCounts]]
  * (north star: a training pipeline needs actual token ids and
  * boundaries, not an estimate).
  *
  * Scale shape, 100 TB posture:
  *  - TRAIN touches the corpus ONCE: a word-frequency aggregation
  *    (word-keyed shuffle — words are short bounded strings, and the
  *    agg is map-side combined, so the exchange carries the distinct
  *    vocabulary, not the corpus). The merge loop then runs on the
  *    collected top-`maxVocabWords` frequency table — the
  *    Zipf-compressed training set every production BPE trainer holds
  *    in memory (HuggingFace/SentencePiece do exactly this); the
  *    corpus itself NEVER collects. The collect is bounded by
  *    construction: `maxVocabWords` rows of (word, count).
  *  - ENCODE is row-local: merge ranks broadcast once (≤ `nMerges`
  *    entries), each document tokenized independently in
  *    `mapPartitions` with the standard greedy lowest-rank-first
  *    algorithm. No shuffles at all.
  *
  * Determinism: pair counting breaks ties (count, then lexicographic
  * pair), so the same corpus always learns the same merge table.
  * Words are whitespace tokens of the lowercased text; each word ends
  * with the terminal symbol [[EndOfWord]] so token sequences are
  * word-reversible (round-trip gated in `bpe_gate`).
  *
  * Marker forgery-proofing: the terminal symbol is the single char
  * U+0000, and input text is escaped so NUL (and the escape char
  * U+0001) NEVER appear in symbol content — NUL becomes SOH+'0',
  * SOH becomes SOH+SOH — a prefix code undone by [[unescape]]. A merged
  * token therefore contains NUL iff it absorbed the terminal marker
  * (always as suffix), so substring tests (`endsWith`, `replace`) in
  * the round-trip gate are exact on ARBITRARY corpus text — an
  * earlier `</w>` marker could be reassembled from a document that
  * literally contained "</w>".
  */
object Bpe {

  /** Terminal (end-of-word) symbol. Unforgeable: [[wordSymbols]]
    * escapes NUL out of input, so no concatenation of input symbols
    * can ever equal it. */
  final val EndOfWord = "\u0000"

  /** Escape lead-in char; also escaped out of input. */
  private final val Esc = '\u0001'

  /** Per-code-point escape of one input char (see object doc). */
  private def escapedSymbol(cp: Int): String = cp match {
    case 0 => "\u00010"     // NUL -> SOH '0'
    case 1 => "\u0001\u0001" // SOH -> SOH SOH
    case _ => new String(Character.toChars(cp))
  }

  /** Invert the escape: SOH + c decodes to (c == '0' ? NUL : c).
    * Left-to-right unit parse — a plain String.replace would match
    * across unit boundaries (e.g. raw SOH followed by raw '0'). */
  private[graft] def unescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == Esc && i + 1 < s.length) {
        b.append(if (s.charAt(i + 1) == '0') '\u0000' else s.charAt(i + 1))
        i += 2
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  /** A trained tokenizer: ordered merge table (rank = position) plus
    * the vocabulary it induces (base characters + one entry per
    * merge). */
  final case class BpeModel(merges: Seq[(String, String)],
      baseSymbols: Set[String]) {
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def vocab: Set[String] =
      baseSymbols ++ merges.map { case (a, b) => a + b }
    def vocabSize: Int = vocab.size
  }

  /** Symbolize one word: one symbol per CODE POINT (astral chars stay
    * whole, so every symbol is UTF-8-encodable for the byte-fallback
    * id path), escaped per [[escapedSymbol]], terminal marker last. */
  private[graft] def wordSymbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += escapedSymbol(cp)
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.result()
  }

  /** Distributed word-frequency table: the one corpus pass of
    * training. Lowercased whitespace words, capped to the
    * `maxVocabWords` most frequent (deterministic count-then-word
    * tiebreak) — the Zipf head carries virtually all pair mass. */
  def wordCounts(df: DataFrame, textCol: String,
      maxVocabWords: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocabWords)

  /** Train `nMerges` merges. `minPairCount` stops early once the best
    * remaining pair is too rare to matter (prevents memorizing
    * singleton typos as merges). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxVocabWords: Int = 1000000, minPairCount: Long = 2L): BpeModel = {
    require(nMerges >= 0, s"nMerges must be >= 0 (got $nMerges)")
    // BOUNDED collect: maxVocabWords (word, count) rows — the
    // documented vocab-scale driver step, never the corpus.
    val freq: Array[(String, Long)] =
      wordCounts(df, textCol, maxVocabWords)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    val baseSymbols =
      freq.iterator.flatMap(p => wordSymbols(p._1)).toSet

    var words: Array[(Vector[String], Long)] =
      freq.map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then lexicographic pair
        val best = pairCounts.maxBy { case ((a, b), n) => (n, a, b) }(
          Ordering.Tuple3(Ordering.Long,
            Ordering.String.reverse, Ordering.String.reverse))
        if (best._2 < minPairCount) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          words = words.map { case (syms, n) => (mergePair(syms, a, b), n) }
          i += 1
        }
      }
    }
    BpeModel(merges.result(), baseSymbols)
  }

  /** One left-to-right greedy replacement pass of adjacent (a, b) →
    * ab — the training-side merge application. */
  private[graft] def mergePair(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Standard greedy BPE encode of one word: repeatedly merge the
    * present pair with the LOWEST rank until none applies. */
  private[graft] def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(w)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair._1, bestPair._2)
    }
    syms
  }

  /** Persist a trained model as two parquet tables (ordered merge
    * table + base alphabet) — the build-once artifact a production
    * pipeline writes next to the corpus, like the IVF index. */
  def save(model: BpeModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    model.baseSymbols.toSeq.sorted.toDF("symbol")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/alphabet")
  }

  /** Reload a persisted model (rank order restored). */
  def load(spark: SparkSession, path: String): BpeModel = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val alphabet = spark.read.parquet(s"$path/alphabet")
      .collect().map(_.getString(0)).toSet
    BpeModel(merges, alphabet)
  }

  /** Deterministic token-id assignment: vocabulary sorted
    * lexicographically, ids = positions 0..vocabSize-1. Ids
    * vocabSize..vocabSize+255 are BYTE-FALLBACK tokens (UTF-8 byte b
    * = id vocabSize+b): an OOV symbol encodes as its UTF-8 bytes, so
    * NO text is unrepresentable and [[decodeIds]] is lossless —
    * the GPT-2/SentencePiece byte-fallback contract. [[UnkId]] is
    * retained for API compatibility but no longer emitted. */
  final val UnkId = -1
  def vocabIds(model: BpeModel): Map[String, Int] =
    model.vocab.toSeq.sorted.zipWithIndex.toMap

  /** Id-space size including the 256 byte-fallback ids. */
  def idSpaceSize(model: BpeModel): Int = model.vocabSize + 256

  /** [[encode]] to integer ids — what a training loader consumes.
    * Same row-local shape; OOV tokens (symbols outside the training
    * vocabulary) emit their UTF-8 bytes as byte-fallback ids (see
    * [[vocabIds]]), never [[UnkId]]. */
  def encodeToIds(df: DataFrame, textCol: String, idCol: String,
      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bcRanks = spark.sparkContext.broadcast(model.ranks)
    val bcIds = spark.sparkContext.broadcast(vocabIds(model))
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val (ranks, ids) = (bcRanks.value, bcIds.value)
        val nVocab = ids.size
        rows.map { case (id, text) =>
          val toks =
            if (text == null) Vector.empty[Int]
            else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
              .filter(_.nonEmpty)
              .flatMap(w => encodeWord(w, ranks))
              .flatMap { t =>
                ids.get(t) match {
                  case Some(i) => Iterator.single(i)
                  case None => t.getBytes(
                      java.nio.charset.StandardCharsets.UTF_8)
                    .iterator.map(b => nVocab + (b & 0xFF))
                }
              }.toVector
          (id, toks, toks.length)
        }
      }
      .toDF(idCol, "token_ids", "n_tokens")
  }

  /** Local inverse of [[encodeToIds]]: vocab ids resolve through the
    * sorted vocabulary, byte-fallback runs UTF-8-decode, the symbol
    * stream splits into words at the terminal markers, and each word
    * unescapes. Output is the whitespace-normalized lowercased source
    * (single spaces) — the exact round-trip `bpe_byte_fallback_gate`
    * pins. */
  def decodeIdSeq(ids: Seq[Int], model: BpeModel): String = {
    val rev = vocabIds(model).map(_.swap)
    decodeWith(ids, rev)
  }

  private def decodeWith(ids: Seq[Int], rev: Map[Int, String]): String = {
    val nVocab = rev.size
    val sb = new java.lang.StringBuilder
    val bytes = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (bytes.size > 0) {
      sb.append(new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    ids.foreach { i =>
      if (i >= nVocab) bytes.write(i - nVocab)
      else { flush(); sb.append(rev(i)) }
    }
    flush()
    // escaped symbol stream -> words at the NUL markers -> unescape.
    // (Byte-fallback content is in escaped space too, so it cannot
    // contain a spurious NUL; -1 keeps the trailing empty segment,
    // dropRight removes it so "" decodes to "".)
    sb.toString.split(EndOfWord, -1).dropRight(1)
      .map(unescape).mkString(" ")
  }

  /** Distributed [[decodeIdSeq]]: one row per document, reversing an
    * `encodeToIds` output column. Row-local mapPartitions over the
    * broadcast reverse vocabulary — zero shuffles, like encode. */
  def decodeIds(df: DataFrame, idsCol: String, idCol: String,
      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bcRev = spark.sparkContext.broadcast(vocabIds(model).map(_.swap))
    df.select(col(idCol).cast("long"), col(idsCol).cast("array<int>"))
      .as[(Long, Seq[Int])]
      .mapPartitions { rows =>
        val rev = bcRev.value
        rows.map { case (id, ids) => (id, decodeWith(ids, rev)) }
      }
      .toDF(idCol, "decoded")
  }

  /** Tokenize a corpus with a trained model: row-local mapPartitions
    * over a broadcast merge table; output one row per document with
    * the token array and its length. OOV characters (absent from the
    * training alphabet) pass through as single-character tokens —
    * encode never fails, it just doesn't compress them. */
  def encode(df: DataFrame, textCol: String, idCol: String,
      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = bc.value
        rows.map { case (id, text) =>
          val toks =
            if (text == null) Vector.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
              .filter(_.nonEmpty)
              .flatMap(w => encodeWord(w, ranks)).toVector
          (id, toks, toks.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }
}
