package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val points = Seq(
    (1L, 10L, t(0)), (2L, 10L, t(30)), (3L, 10L, t(61)),
    (4L, 20L, t(30)), (5L, 30L, t(30)))
    .toDF("p_id", "key", "ts")
  // i1: [0, 60] key 10; i2: [29, 31] key 10; i3: [0, 300] key 20
  private val intervals = Seq(
    (101L, 10L, t(0), t(60)), (102L, 10L, t(29), t(31)),
    (103L, 20L, t(0), t(300)))
    .toDF("i_id", "key", "i_start", "i_end")

  test("keyed containment matches the naive BETWEEN join, ends inclusive") {
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "i_start", "i_end", keys = Seq("key"), bucketSeconds = 600)
      .select($"p_id", $"i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p1 t0 in i1 (start-inclusive); p2 t30 in i1+i2; p3 t61 in nothing
    // (i1 end t60 exclusive only past the end); p4 key20 in i3; p5 key30 none
    assert(got == Set((1L, 101L), (2L, 101L), (2L, 102L), (4L, 103L)))
    // end-inclusive: a point exactly at i1's end matches
    val edge = Seq((9L, 10L, t(60))).toDF("p_id", "key", "ts")
    val e = IntervalJoin.pointInInterval(edge, intervals,
        "ts", "i_start", "i_end", keys = Seq("key"), bucketSeconds = 600)
      .select($"i_id").collect().map(_.getLong(0)).toSet
    assert(e == Set(101L))
  }

  test("an interval spanning many buckets yields each pair exactly once") {
    // bucket = 60 s => i1 [0,60]min spans 61 buckets; every contained
    // point still matches once (the point's bucket is unique)
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "i_start", "i_end", keys = Seq("key"), bucketSeconds = 60)
      .select($"p_id", $"i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, s"duplicate pairs in ${got.toList}")
    assert(got.toSet == Set((1L, 101L), (2L, 101L), (2L, 102L), (4L, 103L)))
  }

  test("keyless range join works and never plans a nested-loop join") {
    val df = IntervalJoin.pointInInterval(points, intervals.drop("key"),
      "ts", "i_start", "i_end", keys = Nil, bucketSeconds = 3600)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // keyless: every point x interval containment, regardless of key
    val got = df.select($"p_id", $"i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (2L, 101L), (2L, 102L), (3L, 103L),
      (1L, 103L), (2L, 103L), (4L, 101L), (4L, 102L), (4L, 103L),
      (5L, 101L), (5L, 102L), (5L, 103L)))
  }

  test("keyed production query plans an equi-join, not a nested loop") {
    val p = SparkEntry.queries("interval_join_promo")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("interval longer than maxBucketsPerInterval fails loudly") {
    val long = Seq((9L, 10L, t(0), t(10000))).toDF("i_id", "key", "i_start", "i_end")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(points, long, "ts", "i_start", "i_end",
        keys = Seq("key"), bucketSeconds = 60, maxBucketsPerInterval = 100).count()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(ex).exists(_.contains("IntervalJoin")), ex.toString)
  }

  test("empty intervals (end < start) match nothing") {
    val inv = Seq((9L, 10L, t(30), t(10))).toDF("i_id", "key", "i_start", "i_end")
    assert(IntervalJoin.pointInInterval(points, inv, "ts", "i_start", "i_end",
      keys = Seq("key"), bucketSeconds = 600).count() == 0)
  }

  test("intervalOverlap: each overlapping pair exactly once, matches naive join") {
    // left: [0,60], [100,200], [300,300] ; right: [50,120], [150,400], [500,600]
    val l = Seq((1L, t(0), t(60)), (2L, t(100), t(200)), (3L, t(300), t(300)))
      .toDF("a_id", "a_start", "a_end")
    val r = Seq((10L, t(50), t(120)), (11L, t(150), t(400)), (12L, t(500), t(600)))
      .toDF("b_id", "b_start", "b_end")
    val naive = Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
    // small buckets force multi-bucket spans — the exactly-once dedup
    // must hold for every width
    for (w <- Seq(60L, 600L, 3600L, 86400L)) {
      val got = IntervalJoin.intervalOverlap(l, r, "a_start", "a_end",
          "b_start", "b_end", keys = Nil, bucketSeconds = w)
        .select($"a_id", $"b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"dup pairs at w=$w: ${got.toList}")
      assert(got.toSet == naive, s"w=$w")
    }
    // touching endpoints count as overlap (inclusive semantics)
    val touch = IntervalJoin.intervalOverlap(
      Seq((1L, t(0), t(50))).toDF("a_id", "a_start", "a_end"),
      Seq((2L, t(50), t(90))).toDF("b_id", "b_start", "b_end"),
      "a_start", "a_end", "b_start", "b_end", keys = Nil, bucketSeconds = 600)
    assert(touch.count() == 1)
    // plan shape: equi-join on the bucket, no nested loop
    val p = IntervalJoin.intervalOverlap(l, r, "a_start", "a_end",
        "b_start", "b_end", keys = Nil, bucketSeconds = 600)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("stream-static enrichment: streaming points against static intervals, append mode") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val pts = mem.toDF().toDF("p_id", "key", "ts")
    val out = IntervalJoin.pointInInterval(pts, intervals,
        "ts", "i_start", "i_end", keys = Seq("key"), bucketSeconds = 600)
      .select($"p_id", $"i_id")
    // append mode with NO watermark: legal only because the plan is
    // completely stateless (projection + stream-static inner join)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ivj_stream").start()
    mem.addData((1L, 10L, t(0)), (2L, 10L, t(30)), (3L, 10L, t(61)))
    q.processAllAvailable()
    mem.addData((4L, 20L, t(30)), (5L, 30L, t(30)))
    q.processAllAvailable()
    val got = spark.table("ivj_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 101L), (2L, 101L), (2L, 102L), (4L, 103L)))
  }

  test("interval_join_incidents agrees with a driver-side naive join at sf0.001") {
    val got = SparkEntry.queries("interval_join_incidents")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // testdata ts is TIMESTAMP_NTZ (collects as LocalDateTime) — take
    // epoch micros Spark-side instead of Row.getTimestamp
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val top = ev.sortBy { case (id, _, v) => (-v, id) }.take(20)
    val expect = top.map { case (iid, its, _) =>
      val in = ev.filter { case (_, ts, _) =>
        ts >= its - 1800000000L && ts <= its + 1800000000L }
      (iid, in.length.toLong, in.map(e => math.round(e._3 * 100)).sum)
    }.sortBy(_._1)
    assert(got.toList == expect.toList)
  }
}
