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
