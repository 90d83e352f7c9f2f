package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage
import graft.operators.Linkage.FsField

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def w(m: Long, u: Long): Long =
    math.round(math.log(m.toDouble / u.toDouble) * 1e6)
  private def dw(m: Long, u: Long): Long =
    math.round(math.log((1000000L - m).toDouble / (1000000L - u).toDouble) * 1e6)

  test("fellegiSunter: weights are ln(m/u) micro constants; NULL agreement contributes zero") {
    val pairs = Seq(
      (1L, Option(true), Option(true)),
      (2L, Option(true), Option(false)),
      (3L, Option(false), Option(false)),
      (4L, Option.empty[Boolean], Option(true)))
      .toDF("id", "a1", "a2")
    val fields = Seq(
      FsField("f1", col("a1"), mPpm = 900000L, uPpm = 100000L),
      FsField("f2", col("a2"), mPpm = 800000L, uPpm = 400000L))
    val upper = w(900000L, 100000L) // one strong agreement = match
    val got = Linkage.fellegiSunter(pairs, fields,
        upperMicros = upper, lowerMicros = -1000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("match_weight_micros"),
          r.getAs[String]("decision")))).toMap
    val (a1, d1) = (w(900000L, 100000L), dw(900000L, 100000L))
    val (a2, d2) = (w(800000L, 400000L), dw(800000L, 400000L))
    assert(got(1L) == ((a1 + a2, "match")), got.toString)
    assert(got(2L)._1 == a1 + d2)
    assert(got(3L) == ((d1 + d2, "non_match")))
    // null agreement: zero evidence from f1, only f2 counts
    assert(got(4L)._1 == a2)
    // decisions are total: every row classified
    assert(got.values.forall(v =>
      Set("match", "possible", "non_match")(v._2)))
  }

  test("survivorship: latest non-null per field, deterministic ties, member count") {
    val rows = Seq(
      // cluster 1: newest row has NULL name — the older name survives;
      // newest city wins
      (1L, 10L, 3L, Option("alice"), Option("york")),
      (1L, 20L, 4L, Option.empty[String], Option("leeds")),
      // cluster 2: two rows at the SAME order value — higher id wins
      (2L, 5L, 1L, Option("bob"), Option.empty[String]),
      (2L, 5L, 2L, Option("bobby"), Option.empty[String]),
      // cluster 3: all-null field stays null
      (3L, 7L, 9L, Option.empty[String], Option("hull")))
      .toDF("cluster", "ver", "id", "name", "city")
    val got = Linkage.survivorship(rows, "cluster", "ver", "id",
        Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((Some("alice"), Some("leeds"), 2L, 20L)), got.toString)
    assert(got(2L) == ((Some("bobby"), None, 2L, 5L))) // id 2 > id 1
    assert(got(3L) == ((None, Some("hull"), 1L, 7L)))
  }

  test("fellegiSunter: uninformative field (u >= m) and empty field list fail loudly") {
    val e = intercept[IllegalArgumentException] {
      FsField("bad", col("x"), mPpm = 300000L, uPpm = 300000L)
    }
    assert(e.getMessage.contains("linkage evidence"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(Seq((1L, true)).toDF("id", "a"), Seq.empty,
        0L, 0L)
    }
    assert(e2.getMessage.contains("non-empty"))
  }
}
