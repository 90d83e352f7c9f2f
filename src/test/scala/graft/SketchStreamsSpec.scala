package graft

import org.apache.spark.sql.functions._
import graft.functions.{kll_merge_agg, kll_quantile, kll_sketch_agg,
  theta_estimate, theta_sketch_agg, theta_union_agg}
import graft.streaming.SketchStreams

class SketchStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming theta sketches accumulate distinct counts across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_stream").toString
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("g", "x")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        SketchStreams.applySketchBatch(dir, id, b, Seq("g"),
          sketch = theta_sketch_agg(col("x")),
          merge = theta_union_agg)
      }
      .start()
    // batch 0: group a gets 0..99, group b gets 0..49
    in.addData((0L until 100L).map(i => ("a", i)) ++ (0L until 50L).map(i => ("b", i)): _*)
    q.processAllAvailable()
    // batch 1: group a repeats 50..99 (no new) + adds 100..149
    in.addData((50L until 150L).map(i => ("a", i)): _*)
    q.processAllAvailable()
    q.stop()
    val v = graft.operators.Merge.latestSnapshotVersion(spark, dir).get
    val got = spark.read.parquet(s"$dir/v=$v")
      .select($"g", theta_estimate($"sk").as("est")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // below nominal entries the sketches are exact
    assert(got == Map("a" -> 150.0, "b" -> 50.0), s"got $got")
  }

  test("streaming drift monitor: accumulated report == batch driftReport; replay idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DriftStreams
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_stream").toString
    // reference: uniform buckets 0..3; stream: bucket 3's mass on 0
    val refRows = (0 until 40).map(i => i % 4 * 10 + 1)
    val streamRows = (0 until 30).map(i => i % 3 * 10 + 1) ++ Seq.fill(10)(1)
    val ref = graft.operators.Quality.bucketCounts(refRows.toDF("v"), $"v",
      lo = 1, width = 10, nBuckets = 4, out = "n_a")
    val in = MemoryStream[Int]
    val q = in.toDF().toDF("v")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        DriftStreams.applyDriftBatch(dir, id, b, col("v"),
          lo = 1, width = 10, nBuckets = 4)
      }
      .start()
    val (half1, half2) = streamRows.splitAt(20)
    in.addData(half1: _*); q.processAllAvailable()
    in.addData(half2: _*); q.processAllAvailable()
    q.stop()
    def report = DriftStreams.driftAgainstReference(spark, dir, ref,
        nBuckets = 4, thresholdPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    val batch = graft.operators.Quality.driftReport(refRows.toDF("v"),
        streamRows.toDF("v"), col("v"), lo = 1, width = 10, nBuckets = 4,
        thresholdPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(report == batch, s"report=$report batch=$batch")
    // redelivered batch 0 rebuilds its snapshot from scratch — the
    // LATEST snapshot (v=1) is untouched and the report is unchanged
    DriftStreams.applyDriftBatch(dir, 0L, half1.toDF("v"), col("v"),
      lo = 1, width = 10, nBuckets = 4)
    assert(report == batch)
    // before any batch: loud refusal, never a silent "no drift"
    val ex = intercept[IllegalStateException] {
      DriftStreams.driftAgainstReference(spark,
        dir + "_nonexistent", ref, nBuckets = 4)
    }
    assert(ex.getMessage.contains("no committed drift snapshot"))
  }

  test("batch replay is idempotent; kll quantiles stay correct incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    def b(lo: Long, hi: Long) =
      spark.range(lo, hi).select(lit("g").as("g"), $"id".cast("double").as("x"))
    def apply(id: Long, df: org.apache.spark.sql.DataFrame) =
      SketchStreams.applySketchBatch(dir, id, df, Seq("g"),
        sketch = kll_sketch_agg(col("x")), merge = kll_merge_agg)
    apply(0L, b(0, 10000))
    apply(1L, b(10000, 20000))
    // replay batch 1 (restart between sink write and checkpoint commit)
    apply(1L, b(10000, 20000))
    val v = graft.operators.Merge.latestSnapshotVersion(spark, dir).get
    assert(v == 1L)
    val p50 = spark.read.parquet(s"$dir/v=$v")
      .select(kll_quantile($"sk", lit(0.5))).head().getDouble(0)
    // median over both batches' 0..20000, not double-counted toward
    // batch 1's range by the replay
    assert(math.abs(p50 - 10000.0) < 20000 * 0.05, s"p50=$p50")
  }
}
