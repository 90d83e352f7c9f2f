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

  test("hotspot: dense cell flagged with mirrored z, sparse cells below, neighborhood count, degenerates") {
    import spark.implicits._
    // 8 points in cell (0,0), singles in (5,5) and (9,0): grid T =
    // 10*6 = 60 cells, N = 10, Q = 66 -> z(0,0) = 470/sqrt(3860)
    val pts = (1 to 8).map(i => (i.toLong, 1L)) ++
      Seq((55L, 55L), (95L, 5L))
    val df = pts.toDF("x", "y")
    val got = Geo.hotspot(df, "x", "y", cellSize = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val zExp = (8.0 * 60 - 10) / math.sqrt((60.0 * 66 - 100))
    assert(got.toSeq ==
      Seq((0L, 0L, 8L, 8L, math.round(zExp * 1e6))), got.mkString(", "))
    // adjacent mass shows in n_nbhd: move the (5,5) point next door
    val near = ((1 to 8).map(i => (i.toLong, 1L)) ++
      Seq((15L, 5L), (95L, 5L))).toDF("x", "y")
    val n2 = Geo.hotspot(near, "x", "y", cellSize = 10L).collect()
    assert(n2.head.getLong(3) == 9L) // 8 own + 1 neighbor
    // uniform occupancy (zero variance) -> empty, not 0/0
    val flat = Seq((1L, 1L), (11L, 1L)).toDF("x", "y")
    assert(Geo.hotspot(flat, "x", "y", cellSize = 10L).count() == 0L)
    // negative coordinates refused loudly
    assertThrows[IllegalArgumentException] {
      Geo.hotspot(Seq((-1L, 2L)).toDF("x", "y"), "x", "y", 10L)
    }
  }

  test("nearestNeighbor: closest wins, ties to smallest id, isolated points keep a NULL row") {
    // a1 at (10,10): b1 at (13,14) dist2=25 beats b2 at (16,18) dist2=100
    // a2 at (50,50): b3 and b4 both at dist2=25 -> the SMALLER id wins
    // a3 at (500,500): nothing within 20 -> explicit NULL row
    val a = Seq((1L, 10L, 10L), (2L, 50L, 50L), (3L, 500L, 500L))
      .toDF("aid", "x", "y")
    val b = Seq((1L, 13L, 14L), (2L, 16L, 18L),
      (3L, 53L, 54L), (4L, 47L, 46L)).toDF("bid", "x", "y")
    val got = Geo.nearestNeighbor(a, "aid", b, "bid", "x", "y",
        maxRadius = 20L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(3)))).toMap
    assert(got.size == 3)
    assert(got(1L) == ((Some(1L), Some(25L), true)), got(1L).toString)
    assert(got(2L) == ((Some(3L), Some(25L), true)), got(2L).toString)
    assert(got(3L) == ((None, None, false)), got(3L).toString)
    // boundary inclusive: exactly maxRadius away still matches
    val edge = Geo.nearestNeighbor(
      Seq((9L, 0L, 0L)).toDF("aid", "x", "y"), "aid",
      Seq((8L, 20L, 0L)).toDF("bid", "x", "y"), "bid", "x", "y",
      maxRadius = 20L)
    assert(edge.collect().head.getBoolean(3))
    // negative coordinates refuse loudly (the radiusJoin contract)
    assertThrows[IllegalArgumentException] {
      Geo.nearestNeighbor(Seq((1L, -5L, 0L)).toDF("aid", "x", "y"),
        "aid", b, "bid", "x", "y", maxRadius = 10L).collect()
    }
  }
}
