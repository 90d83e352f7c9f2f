package graft

import org.apache.spark.sql.functions._
import graft.operators.Survival

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring, risk-set accounting, micro-nat terms") {
    // subjects: events at 1, 2, 4; censored at 2, 3, 5
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, false),
      (4L, true), (5L, false)).toDF("dur", "obs")
    val got = Survival.kaplanMeier(df, $"dur", $"obs").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))))
    // curve steps at EVENT times only (t = 1, 2, 4)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L))
    val m = got.toMap
    def lnTerm(d: Long, n: Long) = math.round(math.log(1.0 - d.toDouble / n) * 1e6)
    def hz(d: Long, n: Long) = math.round(d.toDouble / n * 1e6)
    // t=1: 6 at risk, 1 event; t=2: 5 at risk, 1 event + 1 censored;
    // t=4: 2 at risk (the t=3 censor left), 1 event
    assert(m(1L) == ((6L, 1L, 0L, Some(lnTerm(1, 6)), hz(1, 6))))
    assert(m(2L) == ((5L, 1L, 1L, Some(lnTerm(1, 6) + lnTerm(1, 5)),
      hz(1, 6) + hz(1, 5))))
    assert(m(4L) == ((2L, 1L, 0L,
      Some(lnTerm(1, 6) + lnTerm(1, 5) + lnTerm(1, 2)),
      hz(1, 6) + hz(1, 5) + hz(1, 2))))
    // survival is monotone non-increasing in ln space
    val lns = got.flatMap(_._2._4)
    assert(lns.sameElements(lns.sorted.reverse))
  }

  test("kaplanMeier: survival hitting zero NULLs the curve from that row, hazard continues") {
    val df = Seq((1L, true), (2L, true), (2L, true)).toDF("dur", "obs")
    val got = Survival.kaplanMeier(df, $"dur", $"obs").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))))
      .toMap
    val t1 = math.round(math.log(2.0 / 3.0) * 1e6)
    assert(got(1L) == ((3L, 1L, Some(t1), math.round(1e6 / 3))))
    // d = n at t=2: ln(0) has no finite value -> NULL by flag, and the
    // Nelson-Aalen hazard still accumulates its exact d/n term
    assert(got(2L) == ((2L, 2L, None, math.round(1e6 / 3) + 1000000L)))
  }

  test("logRank: hand O/E/V on a separated pair of groups; censoring keeps at-risk; degenerates empty") {
    // group 1 = {1, 2} observed, group 2 = {3, 4} observed:
    // t=1: n=4, n1=2, d=1 -> E += (1*2*1e12) div 4,
    //   V += (1*2*2*3*1e12) div 48; t=2: n=3, n1=1 ->
    //   E += 1e12 div 3, V += 4e12 div 18; t=3,4: n1=0 -> 0
    val df = Seq((1L, true, true), (2L, true, true),
      (3L, true, false), (4L, true, false)).toDF("dur", "obs", "g")
    val r = Survival.logRank(df, $"dur", $"obs", $"g").collect().head
    val ep = 500000000000L + 333333333333L
    val vp = 250000000000L + 222222222222L
    val zExp = (2000000000000L - ep).toDouble /
      (1e6 * math.sqrt(vp.toDouble))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, ep / 1000000L)))
    assert(r.getLong(4) == math.round(zExp * 1e6))
    assert(r.getLong(5) > 0L && r.getLong(5) < 150000L) // p ~ 0.09
    // censored subject at an event time stays at risk AT that time:
    // group1 = {1 obs}, group2 = {1 censored, 2 obs} -> t=1 sees n=3
    val cen = Seq((1L, true, true), (1L, false, false),
      (2L, true, false)).toDF("dur", "obs", "g")
    val c = Survival.logRank(cen, $"dur", $"obs", $"g").collect().head
    val epC = 333333333333L // (1*1*1e12) div 3
    val vpC = 222222222222L // (1*1*2*2*1e12) div (9*2)
    val zC = (1000000000000L - epC).toDouble /
      (1e6 * math.sqrt(vpC.toDouble))
    assert(c.getLong(2) == 1L && c.getLong(3) == epC / 1000000L)
    assert(c.getLong(4) == math.round(zC * 1e6))
    // one-group input, and zero-variance input, return empty
    assert(Survival.logRank(df.filter($"g"), $"dur", $"obs", $"g")
      .count() == 0L)
    val noOverlap = Seq((1L, false, true), (2L, true, false))
      .toDF("dur", "obs", "g")
    // only event time t=2 has n1=0 -> V = 0 -> empty, not 0/0
    assert(Survival.logRank(noOverlap, $"dur", $"obs", $"g")
      .count() == 0L)
  }

  test("kmBands: mirrored Greenwood closed form; clamping; bands NULL once S hits zero") {
    // one event at t=1, one censor at t=2: single event row with
    // n=2, d=1 — every quantity computable by the same mirrored tree
    val df = Seq((1L, true), (2L, false)).toDF("dur", "obs")
    val r = Survival.kmBands(df, col("dur"), col("obs")).collect()
    assert(r.length == 1)
    val lns = math.round(math.log(1.0 - 1.0 / 2.0) * 1e6)
    val s = math.round(math.exp(lns.toDouble / 1e6) * 1e6)
    val cg = math.round(1.0 / (2.0 * 1.0) * 1e12)
    val half = math.round(1.959964 * math.exp(lns.toDouble / 1e6) *
      math.sqrt(cg.toDouble / 1e12) * 1e6)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1L, 2L, 1L)))
    assert(row.getLong(3) == s)
    assert(row.getLong(4) == math.max(0L, s - half))
    assert(row.getLong(5) == math.min(1000000L, s + half))
    // lower band clamps at 0 when the half-width exceeds S (tiny n,
    // deep curve): 3 events at distinct times, last row S-hits-zero
    // so its S and bands are NULL; earlier rows carry finite bands
    val df2 = Seq((1L, true), (2L, true), (3L, true)).toDF("dur", "obs")
    val rows = Survival.kmBands(df2, col("dur"), col("obs"))
      .orderBy(col("t")).collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(x => !x.isNullAt(3) &&
      x.getLong(4) >= 0L && x.getLong(5) <= 1000000L &&
      x.getLong(4) <= x.getLong(3) && x.getLong(3) <= x.getLong(5)))
    assert(rows.last.isNullAt(3) && rows.last.isNullAt(4) &&
      rows.last.isNullAt(5))
  }

  test("rmst: hand step integral; horizon before first event; all-censored = full horizon") {
    import graft.operators.Survival
    // events at t=2 (3 at risk) and t=4 (2 at risk); censor at 6
    val rows = Seq((2L, true), (4L, true), (6L, false)).toDF("t", "obs")
    val r = Survival.rmst(rows, $"t", $"obs", horizonT = 10L)
      .collect().head
    val ln2 = math.round(math.log(1.0 - 1.0 / 3.0) * 1e6)
    val ln4 = ln2 + math.round(math.log(1.0 - 1.0 / 2.0) * 1e6)
    val expected = 2L * 1000000L +
      math.round(math.exp(ln2 / 1e6) * 2.0 * 1e6) +
      math.round(math.exp(ln4 / 1e6) * 6.0 * 1e6)
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L)
    assert(r.getLong(2) == expected, r.toString)
    // horizon before the first event: S = 1 throughout
    val r2 = Survival.rmst(rows, $"t", $"obs", horizonT = 1L)
      .collect().head
    assert(r2.getLong(2) == 1000000L)
    // nobody ever observed: rmst = horizon exactly
    val cens = Seq((2L, false), (4L, false)).toDF("t", "obs")
    val r3 = Survival.rmst(cens, $"t", $"obs", horizonT = 7L)
      .collect().head
    assert(r3.getLong(1) == 0L && r3.getLong(2) == 7000000L)
    val e = intercept[IllegalArgumentException] {
      Survival.rmst(rows, $"t", $"obs", horizonT = 0L)
    }
    assert(e.getMessage.contains("> 0"))
  }

  test("competingRisks: hand grid, first increment exact, monotone, sums bound 1-S") {
    // durations/causes: (1, c1), (2, c2), (3, censored), (4, c1)
    val df = Seq((1L, Some(1L)), (2L, Some(2L)), (3L, Option.empty[Long]),
      (4L, Some(1L))).toDF("dur", "cause")
    val got = Survival.competingRisks(df, $"dur", $"cause").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))) // (cause, t, n_risk, n_events, cif)
    // grid: every cause gets a row at EVERY event time (1, 2, 4);
    // the censor-only time 3 creates no row
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(1L, 2L, 4L))
    assert(got.length == 6)
    val c1 = got.filter(_._1 == 1L).sortBy(_._2)
    val c2 = got.filter(_._1 == 2L).sortBy(_._2)
    // first event time: S(u-) = 1 exactly, inc = 1/4 -> 250000 micros
    assert(c1.head == ((1L, 1L, 4L, 1L, 250000L)))
    assert(c2.head == ((2L, 1L, 4L, 0L, 0L)))
    // double-entry replay of the remaining curve (mirrored formula)
    val term1 = math.round(math.log(1.0 - 1.0 / 4.0) * 1e6)
    val term2 = math.round(math.log(1.0 - 1.0 / 3.0) * 1e6)
    val sPrev2 = math.exp(term1.toDouble / 1e6)
    val sPrev4 = math.exp((term1 + term2).toDouble / 1e6)
    val incC2t2 = math.round(sPrev2 * 1.0 / 3.0 * 1e12)
    val incC1t4 = math.round(sPrev4 * 1.0 / 1.0 * 1e12)
    assert(c2(1)._5 == incC2t2 / 1000000L)
    assert(c1(2)._5 == (250000000000L + incC1t4) / 1000000L)
    // monotone per cause; total incidence bounded by 1
    assert(c1.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    assert(c2.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    assert(c1.last._5 + c2.last._5 <= 1000000L)
  }
}
