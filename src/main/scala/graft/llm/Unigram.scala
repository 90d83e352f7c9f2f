package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM language-model tokenizer (Kudo 2018,
  * *Subword Regularization* — the other real-world tokenizer family
  * next to [[Bpe]]): a vocabulary of pieces with log-probabilities;
  * encoding is the VITERBI segmentation maximizing Σ log P(piece).
  * Unlike BPE's greedy merge order, segmentation is globally optimal
  * for the learned piece distribution.
  *
  * Training here is frequency-EM, a documented simplification of the
  * paper's likelihood-loss pruning (same posture as the NER-lite
  * approximation): seed with all substrings of the frequent-word
  * table, iterate [Viterbi-segment → piece-usage counts → re-estimate
  * log-probs → prune rare pieces], keep the `vocabSize` most used.
  * Everything is integer micro-nat log-probs with a fixed
  * deterministic tie-break, so training is a pure function of
  * (corpus, params) — two runs produce the identical model, which the
  * `unigram_gate` contract pins.
  *
  * Scale shape (the [[Bpe]] contract): ONE word-count shuffle over
  * the corpus; the EM loop runs on the BOUNDED (maxVocabWords)
  * frequency table on the driver — model-scale, never corpus-scale.
  * Encode is row-local mapPartitions under a broadcast model:
  * zero-shuffle, linear in text length (the Viterbi window is
  * `maxPieceLen` wide).
  */
object Unigram {

  /** Piece → log-prob in integer micro-nats (negative), sorted by
    * piece string: a deterministic, persistable model. */
  final case class UnigramModel(pieces: Vector[(String, Long)],
      maxPieceLen: Int) {
    def lpMap: Map[String, Long] = pieces.toMap
    def vocabSize: Int = pieces.size
  }

  /** Log-prob assigned to a character absent from the vocabulary —
    * the char-fallback floor that makes every string segmentable
    * (the [[Bpe]] byte-fallback analogue). Far below any trained
    * piece (ln P = -20 nats ≈ P = 2e-9). */
  val UnkLpMicros: Long = -20000000L

  /** Deterministic Viterbi segmentation: maximize the summed
    * micro-nat log-prob; on score ties the LONGEST piece ending at
    * each boundary wins (the earlier split point is kept, later ones
    * must beat it strictly). Characters not in the vocabulary segment
    * as single-char pieces at [[UnkLpMicros]]. */
  private[graft] def viterbi(word: String, lp: Map[String, Long],
      maxPieceLen: Int): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Long.MinValue / 4)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val piece = word.substring(i, j)
        val plp = lp.get(piece) match {
          case Some(v) => Some(v)
          case None if j - i == 1 => Some(UnkLpMicros)
          case None => None
        }
        plp.foreach { v =>
          if (best(i) > Long.MinValue / 4 && best(i) + v > best(j)) {
            best(j) = best(i) + v
            back(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    // reconstruct
    var pos = n
    var acc = List.empty[String]
    while (pos > 0) {
      val i = back(pos)
      acc = word.substring(i, pos) :: acc
      pos = i
    }
    acc.toVector
  }

  /** Train on the corpus's frequent-word table. Pure function of
    * (corpus, params); see object doc for the EM shape. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, iters: Int = 3,
      maxVocabWords: Int = 1000000, seedSize: Int = 20000): UnigramModel = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && iters >= 1)
    // BOUNDED collect: the documented vocab-scale driver step.
    val freq: Array[(String, Long)] =
      Bpe.wordCounts(df, textCol, maxVocabWords)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars: Set[String] =
      freq.iterator.flatMap(_._1.iterator).map(_.toString).toSet

    // seed candidates: every substring up to maxPieceLen, weighted by
    // word frequency per occurrence
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    freq.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val p = w.substring(i, j)
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
          j += 1
        }
        i += 1
      }
    }
    // cap to the seedSize heaviest (count desc, piece asc) + all chars
    val capped = seedCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize).toMap
    var counts: Map[String, Long] =
      capped ++ chars.iterator.map(ch =>
        ch -> math.max(1L, seedCounts.getOrElse(ch, 1L))).toMap

    def toLp(cs: Map[String, Long]): Map[String, Long] = {
      val total = cs.values.sum.toDouble
      cs.map { case (p, c) =>
        p -> math.round(math.log(c.toDouble / total) * 1e6) }
    }

    var iter = 0
    while (iter < iters) {
      val lp = toLp(counts)
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      freq.foreach { case (w, n) =>
        viterbi(w, lp, maxPieceLen).foreach { p =>
          usage.update(p, usage.getOrElse(p, 0L) + n)
        }
      }
      // re-estimate; single chars survive at a floor so every string
      // stays segmentable; prune multi-char pieces the EM stopped
      // using, then keep the vocabSize heaviest
      val kept = usage.toSeq
        .filter { case (p, c) => c > 0L || p.length == 1 }
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(vocabSize, chars.size))
      counts = kept.toMap ++ chars.iterator.map(ch =>
        ch -> math.max(1L, usage.getOrElse(ch, 0L))).toMap
      iter += 1
    }
    UnigramModel(
      toLp(counts).toVector.sortBy(_._1), maxPieceLen)
  }

  /** Row-local Viterbi encode under the broadcast model: (idCol,
    * pieces, n_pieces). Lowercased whitespace words, matching the
    * training normalization; pieces concatenate back to the
    * whitespace-normalized word exactly (the round-trip the gate
    * pins). */
  def encode(df: DataFrame, textCol: String, idCol: String,
      model: UnigramModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.lpMap, model.maxPieceLen))
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val (lp, mpl) = bc.value
        rows.map { case (id, text) =>
          val pieces =
            if (text == null) Vector.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
              .filter(_.nonEmpty)
              .flatMap(w => viterbi(w, lp, mpl)).toVector
          (id, pieces, pieces.length)
        }
      }
      .toDF(idCol, "pieces", "n_pieces")
  }

  /** Persist / reload: two-column parquet, model-scale. */
  def save(model: UnigramModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.pieces.toDF("piece", "lp_micros")
      .coalesce(1).write.mode("overwrite").parquet(path)
    spark.createDataset(Seq(model.maxPieceLen))
      .write.mode("overwrite").json(path + "__meta")
  }

  def load(spark: SparkSession, path: String): UnigramModel = {
    val pieces = spark.read.parquet(path)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .toVector.sortBy(_._1)
    val mpl = spark.read.json(path + "__meta")
      .collect().head.getLong(0).toInt
    UnigramModel(pieces, mpl)
  }
}
