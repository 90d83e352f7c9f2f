package graft

import graft.operators.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("radiusJoin: cross-cell neighbors found, boundary inclusive, far pairs absent") {
    // radius 10 -> cells of side 10. Pairs straddle cell boundaries
    // deliberately: (9,9) and (11,11) live in different cells but are
    // sqrt(8) apart — the 3x3 probe must find them.
    val a = Seq((1L, 9L, 9L), (2L, 50L, 50L), (3L, 0L, 0L))
      .toDF("a_id", "x", "y")
    val b = Seq((10L, 11L, 11L), (20L, 58L, 44L), (30L, 100L, 100L),
      (40L, 10L, 0L)).toDF("b_id", "x", "y")
    val got = Geo.radiusJoin(a, "a_id", b, "b_id", "x", "y", radius = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // (1,10): dist2 = 8 across a cell corner; (2,20): dist2 = 100 ==
    // r² — INCLUSIVE boundary; (3,40) and (1,40): both in range
    assert(got == Map((1L, 10L) -> 8L, (2L, 20L) -> 100L,
      (3L, 40L) -> 100L, (1L, 40L) -> 82L), got.toString)
    // degenerate b (all points one cell) trips the occupancy guard
    val dense = (1L to 5L).map(i => (i, 2L, 3L)).toDF("b_id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Geo.radiusJoin(a, "a_id", dense, "b_id", "x", "y", radius = 10L,
        maxCellPoints = 4L)
    }
    assert(e.getMessage.contains("grid cell"), e.getMessage)
    // negative coordinates refuse loudly (trunc-vs-floor trap)
    val neg = Seq((1L, -5L, 3L)).toDF("a_id", "x", "y")
    val e2 = intercept[IllegalArgumentException] {
      Geo.radiusJoin(neg, "a_id", b, "b_id", "x", "y", radius = 10L)
    }
    assert(e2.getMessage.contains("non-negative"), e2.getMessage)
  }

  test("radiusJoin equals the brute-force filter on a random grid") {
    val rng = new scala.util.Random(7)
    val a = Seq.tabulate(60)(i => (i.toLong, rng.nextInt(200).toLong,
      rng.nextInt(200).toLong)).toDF("a_id", "x", "y")
    val bPts = Seq.tabulate(60)(i => (i + 1000L, rng.nextInt(200).toLong,
      rng.nextInt(200).toLong))
    val b = bPts.toDF("b_id", "x", "y")
    val got = Geo.radiusJoin(a, "a_id", b, "b_id", "x", "y", radius = 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val aPts = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for ((ai, ax, ay) <- aPts; (bi, bx, by) <- bPts) yield {
      val d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if (d2 <= 625L) Some((ai, bi, d2)) else None
    }).flatten.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
