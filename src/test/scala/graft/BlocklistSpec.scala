package graft

import scala.util.Random

import graft.llm.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("scanBlocklist: overlapping/nested patterns match exactly like contains") {
    val docs = Seq(
      (1L, "the sharkspark sparks here"),   // overlap: shark|spark share 'ark'
      (2L, "ab abc abcd"),                  // nested prefixes
      (3L, "no hits at all"),
      (4L, "xabcx")).toDF("doc_id", "text")
    val pats = Seq("spark", "abc", "ab", "bcd", "shark")
    val got = Blocklist.scanBlocklist(docs, "doc_id", "text", pats)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1).toList, r.getBoolean(2)))).toMap
    // matches come out in pattern-list order
    assert(got(1L) == ((List("spark", "shark"), true)))
    assert(got(2L) == ((List("abc", "ab", "bcd"), true)))
    assert(got(3L) == ((Nil, false)))
    assert(got(4L) == ((List("abc", "ab"), true)))
  }

  test("scanBlocklist: random fuzz equals the naive contains set") {
    val rnd = new Random(19)
    val alpha = "abcab" // tiny alphabet forces heavy fail-link traffic
    def randStr(n: Int) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 5) {
      val pats = (1 to 8).map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val docs = (1L to 40L).map(i => (i, randStr(rnd.nextInt(30))))
      val got = Blocklist.scanBlocklist(docs.toDF("doc_id", "text"),
          "doc_id", "text", pats)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
        .toMap
      docs.foreach { case (id, t) =>
        val want = pats.filter(t.contains(_)).toList
        assert(got(id) == want, s"trial $trial doc '$t' pats $pats")
      }
    }
  }
}
