package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("joinAsOf picks latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, t(10)), (2L, 10L, t(30)), (3L, 10L, t(5)),
      (4L, 20L, t(15)), (5L, 30L, t(50)))
      .toDF("l_id", "key", "lts")
    val right = Seq(
      (10L, t(0), "a"), (10L, t(20), "b"), (10L, t(30), "c"),
      (20L, t(100), "z"))
      .toDF("key", "rts", "tag")
    val got = AsOf.joinAsOf(left, right, "key", "lts", "rts", Seq("tag"))
      .select($"l_id", $"tag").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "a")   // t10 -> a (t0)
    assert(got(2L) == "c")   // t30 -> c (t30, <= inclusive)
    assert(got(3L) == "a")   // t5 -> a
    assert(got(4L) == null)  // right at t100 is after t15
    assert(got(5L) == null)  // no right rows for key 30
    // all left rows survive
    assert(AsOf.joinAsOf(left, right, "key", "lts", "rts", Seq("tag")).count() == 5)
  }

  test("forward direction picks earliest right row at-or-after, per key") {
    val left = Seq(
      (1L, 10L, t(10)), (2L, 10L, t(30)), (3L, 10L, t(35)),
      (4L, 20L, t(150)), (5L, 30L, t(50)))
      .toDF("l_id", "key", "lts")
    val right = Seq(
      (10L, t(0), "a"), (10L, t(20), "b"), (10L, t(30), "c"),
      (20L, t(100), "z"))
      .toDF("key", "rts", "tag")
    val got = AsOf.joinAsOf(left, right, "key", "lts", "rts", Seq("tag"),
        direction = "forward")
      .select($"l_id", $"tag").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "b")   // t10 -> b (t20)
    assert(got(2L) == "c")   // t30 -> c (>= inclusive)
    assert(got(3L) == null)  // t35: nothing after
    assert(got(4L) == null)  // right t100 is before t150
    assert(got(5L) == null)  // no right rows for key 30
  }

  test("tolerance nulls matches farther than the bound, keeps the row") {
    val left = Seq((1L, 10L, t(10)), (2L, 10L, t(100))).toDF("l_id", "key", "lts")
    val right = Seq((10L, t(0), "a")).toDF("key", "rts", "tag")
    val got = AsOf.joinAsOf(left, right, "key", "lts", "rts", Seq("tag"),
        toleranceSeconds = Some(15 * 60L))
      .select($"l_id", $"tag").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // t10 is 10 min after a (within 15 min); t100 is 100 min after (nulled)
    assert(got == Map(1L -> "a", 2L -> null))
    assert(got.size == 2)
  }

  test("joinAsOfBucketed equals joinAsOf: property over directions, slices, tolerance") {
    // deterministic pseudo-random data with a HOT key (0) and
    // cross-slice gaps: unique (key, ts) pairs per side so both forms
    // are tie-free and must agree row-for-row
    def lcg(seed: Long): LazyList[Long] =
      LazyList.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
    val rnd = lcg(42L).map(x => math.abs(x % 100000L))
    val left = (0 until 300).map { i =>
      val key = if (i % 3 == 0) 0L else rnd(i) % 7
      (i.toLong, key, t(rnd(i + 1000).toInt % 2000))
    }.toDF("l_id", "key", "lts")
    val right = (0 until 200).map { i =>
      val key = if (i % 4 == 0) 0L else rnd(i + 5000) % 7
      // i*13 + jitter<13 → globally unique minutes: both forms are
      // tie-free and must agree exactly
      (key, t(i * 13 + (rnd(i + 7000) % 7).toInt), s"tag$i")
    }.toDF("key", "rts", "tag")
    for {
      dir <- Seq("backward", "forward")
      sliceSecs <- Seq(600L, 3600L, 7L * 24 * 3600)
      tol <- Seq(None, Some(1800L))
    } {
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select($"l_id", $"key", $"lts", $"tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSet
      val plain = canon(AsOf.joinAsOf(left, right, "key", "lts", "rts",
        Seq("tag"), dir, tol))
      val bucketed = canon(AsOf.joinAsOfBucketed(left, right, "key",
        "lts", "rts", Seq("tag"), sliceSecs, dir, tol))
      assert(bucketed == plain,
        s"dir=$dir slice=$sliceSecs tol=$tol: " +
          s"missing=${(plain -- bucketed).take(3)} " +
          s"extra=${(bucketed -- plain).take(3)}")
    }
  }

  test("joinAsOfBucketed: sub-second right rows at a slice boundary still carry") {
    // right row 500ms BEFORE the slice start must be visible to a
    // left probe in the next slice (the 1-microsecond probe contract)
    val left = Seq((1L, 10L, new Timestamp(3600_000L + 1000L)))
      .toDF("l_id", "key", "lts") // 1s into slice 1 (3600s slices)
    val right = Seq((10L, new Timestamp(3600_000L - 500L), "edge"))
      .toDF("key", "rts", "tag") // 500ms before slice 1 starts
    val got = AsOf.joinAsOfBucketed(left, right, "key", "lts", "rts",
        Seq("tag"), sliceSeconds = 3600L)
      .select($"tag").head()
    assert(got.getString(0) == "edge")
  }

  test("asof_signup_value: every purchase keeps exactly one row; signup precedes purchase") {
    val out = SparkEntry.queries("asof_signup_value")(spark, sf0001).cache()
    val purchases = Tables.events(spark, sf0001).filter($"event_type" === "purchase")
    assert(out.count() == purchases.count())
    // spot-check semantics: join back and verify signup_value matches
    // the max-ts signup <= purchase ts for 5 sampled purchases
    // testdata ts is TIMESTAMP_NTZ (collects as LocalDateTime) — compare
    // in epoch micros computed Spark-side, never via java.sql.Timestamp
    val ev = Tables.events(spark, sf0001)
      .withColumn("ts_us", unix_micros($"ts".cast("timestamp"))).collect()
    val signupsByUser = ev.filter(_.getAs[String]("event_type") == "signup")
      .groupBy(_.getAs[Long]("user_id"))
    out.limit(200).collect().take(50).foreach { r =>
      val eid = r.getLong(0); val uid = r.getLong(1)
      val pts = ev.find(_.getAs[Long]("event_id") == eid).get.getAs[Long]("ts_us")
      val expect = signupsByUser.getOrElse(uid, Array.empty)
        .filter(e => e.getAs[Long]("ts_us") <= pts)
        .sortBy(e => (e.getAs[Long]("ts_us"), e.getAs[Long]("event_id")))
        .lastOption.map(_.getAs[Double]("value"))
      val gotV = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(gotV == expect, s"event $eid user $uid")
    }
  }

  test("nearest direction picks the temporally closer side, ties go backward, tolerance nulls far matches") {
    val left = Seq(
      (1L, 10L, t(10)),  // t(7) is 3 away, t(12) is 2 -> forward b
      (2L, 10L, t(5)),   // nothing at-or-before -> forward a
      (3L, 10L, t(40)),  // nothing at-or-after -> backward b
      (4L, 10L, t(9)),   // t(7) is 2 away, t(12) is 3 -> backward a
      (5L, 20L, t(50)))  // no rights at all -> null payload
      .toDF("l_id", "key", "lts")
    val right = Seq(
      (10L, t(7), "a"), (10L, t(12), "b")).toDF("key", "rts", "tag")
    val got = AsOf.joinAsOf(left, right, "key", "lts", "rts",
        Seq("tag"), direction = "nearest")
      .select($"l_id", $"tag").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "b")   // |10-12| = 2 < |10-7| = 3
    assert(got(2L) == "a")   // nothing at-or-before; forward wins
    assert(got(3L) == "b")   // nothing at-or-after; backward wins
    assert(got(4L) == "a")   // |9-7| = 2 < |9-12| = 3
    assert(got(5L) == null)
    assert(AsOf.joinAsOf(left, right, "key", "lts", "rts",
      Seq("tag"), direction = "nearest").count() == 5)
    // equal distance: t(9.5) is unbuildable at minute grain — use
    // t(7)/t(11) rights against a t(9) left: both distance 2, the
    // pandas rule takes the BACKWARD match
    val tie = Seq((1L, 10L, t(9))).toDF("l_id", "key", "lts")
    val rightTie = Seq((10L, t(7), "back"), (10L, t(11), "fwd"))
      .toDF("key", "rts", "tag")
    val tied = AsOf.joinAsOf(tie, rightTie, "key", "lts", "rts",
      Seq("tag"), direction = "nearest").collect().head
    assert(tied.getString(tied.fieldIndex("tag")) == "back")
    // tolerance bounds the CHOSEN match: 60s tolerance nulls a
    // 2-minute-away nearest match, the row survives
    val bounded = AsOf.joinAsOf(tie, rightTie, "key", "lts", "rts",
      Seq("tag"), direction = "nearest",
      toleranceSeconds = Some(60L)).collect().head
    assert(bounded.isNullAt(bounded.fieldIndex("tag")))
  }
}
