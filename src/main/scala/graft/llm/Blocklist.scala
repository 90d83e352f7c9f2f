package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning — the bad-content filter stage of
  * a corpus pipeline (profanity/PII-keyword/boilerplate lists run to
  * thousands of patterns). One Aho-Corasick automaton pass per
  * document (Aho & Corasick 1975, *Efficient String Matching*) instead
  * of N `contains` scans: cost O(len(text) + matches) regardless of
  * pattern count — at 10³ patterns over 100 TB of text the naive
  * per-pattern scan is 10³ reads of the corpus, the automaton is one.
  *
  * Matching is SUBSTRING containment (no word boundaries), exactly
  * `text.contains(pattern)` per pattern — which is what makes the
  * operator oracle-replayable: the match set equals a per-pattern
  * `contains` disjunction, only the cost differs.
  */
object Blocklist {

  /** Serializable Aho-Corasick automaton. Built once per PARTITION
    * (the builder ships the pattern array, each task builds locally —
    * same posture as [[Multimodal]]'s per-partition codec init); the
    * build is O(Σ pattern lengths), trivial next to scanning. */
  private[llm] final class Aho(patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    // trie over chars with BFS fail links; output = pattern indexes
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(
      Set.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = goto_(s).getOrElseUpdate(ch, {
          goto_ += scala.collection.mutable.Map.empty[Char, Int]
          out += Set.empty[Int]
          goto_.length - 1
        })
      }
      out(s) = out(s) + pi
    }
    private val fail = Array.fill(goto_.length)(0)
    private val queue = scala.collection.mutable.Queue.empty[Int]
    goto_(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto_(r).foreach { case (ch, s) =>
        queue.enqueue(s)
        var f = fail(r)
        while (f != 0 && !goto_(f).contains(ch)) f = fail(f)
        val cand = goto_(f).getOrElse(ch, 0)
        fail(s) = if (cand == s) 0 else cand
        out(s) = out(s) ++ out(fail(s))
      }
    }

    /** Distinct matched pattern indexes, ascending. */
    def matchIndexes(text: String): Seq[Int] = {
      var s = 0
      val hits = scala.collection.mutable.SortedSet.empty[Int]
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !goto_(s).contains(ch)) s = fail(s)
        s = goto_(s).getOrElse(ch, 0)
        if (out(s).nonEmpty) hits ++= out(s)
        i += 1
      }
      hits.toSeq
    }
  }

  /** Scan `textCol` against `patterns`; returns (idCol, matches,
    * flagged) with `matches` the matched patterns IN PATTERN-LIST
    * ORDER (the deterministic order a per-pattern `contains` oracle
    * reproduces). `idCol` must be long-castable. Row-local
    * mapPartitions — no shuffle, text never moves; the automaton is
    * rebuilt per partition from the broadcast pattern array. */
  def scanBlocklist(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pats = patterns.toArray
    val scanned = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val aho = new Aho(pats) // per-partition automaton build
        it.map { case (id, t) =>
          val m = if (t == null) Seq.empty[Int] else aho.matchIndexes(t)
          (id, m.map(pats(_)))
        }
      }
      .toDF(idCol, "matches")
    scanned.withColumn("flagged", size(col("matches")) > 0)
  }
}
