package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: update, insert, delete in one changeset") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, "B", false),  // update
      (4L, "d", false),  // insert
      (3L, null.asInstanceOf[String], true)) // delete
      .toDF("id", "v", "is_delete")
    val got = Merge.upsert(base, changes, Seq("id"), Some("is_delete"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("upsert: anti join broadcasts a small changeset — base payload never shuffles") {
    val base = Tables.orders(spark, sf001)
    val changes = base.limit(10).withColumn("is_delete", lit(false))
    val plan = Merge.upsert(base, changes, Seq("o_orderkey"), Some("is_delete"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("latestByKey keeps exactly the highest version per key") {
    val log = Seq((1L, 1L, "x"), (1L, 3L, "z"), (1L, 2L, "y"), (2L, 1L, "p"))
      .toDF("id", "version", "v")
    val got = Merge.latestByKey(log, Seq("id"), "version")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "z", 2L -> "p"))
  }

  test("applyChangeBatch: streaming CDC snapshots, idempotent on batch replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    def batch(rows: Seq[(Long, Long, String, Boolean)]) =
      rows.toDF("id", "version", "v", "is_delete")

    // batch 0: initial load (includes an intra-batch version conflict)
    Merge.applyChangeBatch(dir, 0L,
      batch(Seq((1L, 1L, "a0", false), (1L, 2L, "a1", false), (2L, 1L, "b", false))),
      Seq("id"), "version", Some("is_delete"))
    // batch 1: update 1, delete 2, insert 3
    Merge.applyChangeBatch(dir, 1L,
      batch(Seq((1L, 3L, "a2", false), (2L, 2L, null, true), (3L, 1L, "c", false))),
      Seq("id"), "version", Some("is_delete"))

    def snapshot() = {
      val v = Merge.latestSnapshotVersion(spark, dir).get
      spark.read.parquet(s"$dir/v=$v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(snapshot() == Map(1L -> "a2", 3L -> "c"))

    // replay batch 1 (restart between sink write and checkpoint
    // commit): the rewrite must not double-apply or corrupt
    Merge.applyChangeBatch(dir, 1L,
      batch(Seq((1L, 3L, "a2", false), (2L, 2L, null, true), (3L, 1L, "c", false))),
      Seq("id"), "version", Some("is_delete"))
    assert(snapshot() == Map(1L -> "a2", 3L -> "c"))

    // time travel: asOf batch 0 sees the pre-update state, latest sees
    // the current one, and a too-early asOf fails loudly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(Merge.readSnapshot(spark, dir, asOf = Some(0L))) ==
      Map(1L -> "a1", 2L -> "b"))
    assert(rows(Merge.readSnapshot(spark, dir)) == Map(1L -> "a2", 3L -> "c"))
    val e = intercept[IllegalStateException] {
      Merge.readSnapshot(spark, dir + "/nope")
    }
    assert(e.getMessage.contains("no committed snapshot"))
  }

  test("applyChangeBatch drives a real foreachBatch stream end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString
    val in = MemoryStream[(Long, Long, String, Boolean)]
    val q = in.toDF().toDF("id", "version", "v", "is_delete")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Merge.applyChangeBatch(dir, id, b, Seq("id"), "version", Some("is_delete"))
      }
      .start()
    in.addData((1L, 1L, "x", false), (2L, 1L, "y", false))
    q.processAllAvailable()
    in.addData((1L, 2L, "x2", false), (2L, 2L, null, true))
    q.processAllAvailable()
    q.stop()
    val v = Merge.latestSnapshotVersion(spark, dir).get
    val got = spark.read.parquet(s"$dir/v=$v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "x2"))
  }

  test("upsert: schema evolution widens by name behind the flag, fails loudly without") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq((2L, "b2", 9.5), (3L, "c", 1.0)).toDF("id", "v", "score")
    // default: drift fails loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Merge.upsert(base, changes, Seq("id")).collect()
    }
    val evolved = Merge.upsert(base, changes, Seq("id"),
      allowSchemaEvolution = true)
    assert(evolved.columns.toSeq == Seq("id", "v", "score"))
    val rows = evolved.collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows == Map(1L -> ("a", None), 2L -> ("b2", Some(9.5)),
      3L -> ("c", Some(1.0))), rows.toString)
  }

  test("upsert: assertUniqueKeys fails loudly on a duplicate-key changeset") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val dup = Seq((2L, "b"), (2L, "b2")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, dup, Seq("id"), assertUniqueKeys = true)
    }
    // unique changeset passes the same check
    val ok = Merge.upsert(base, Seq((2L, "b")).toDF("id", "v"),
      Seq("id"), assertUniqueKeys = true)
    assert(ok.count() == 2)
  }

  test("latestSnapshotVersion ignores uncommitted (no _SUCCESS) partials") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_commit").toString
    Merge.applyChangeBatch(dir, 0L,
      Seq((1L, 1L, "a", false)).toDF("id", "version", "v", "is_delete"),
      Seq("id"), "version", Some("is_delete"))
    // simulate a crash mid-overwrite of v=5: directory exists, data
    // file present, no _SUCCESS marker
    val partial = new java.io.File(s"$dir/v=5")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/v=5/part-00000.parquet"), Array[Byte](1))
    assert(Merge.latestSnapshotVersion(spark, dir).contains(0L))
    // the next batch rebuilds from the committed base, not the partial
    Merge.applyChangeBatch(dir, 5L,
      Seq((2L, 1L, "b", false)).toDF("id", "version", "v", "is_delete"),
      Seq("id"), "version", Some("is_delete"))
    val got = spark.read.parquet(s"$dir/v=5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b"))
  }

  test("retainSnapshots keeps the newest n and replay still works") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_retain").toString
    def batch(rows: Seq[(Long, Long, String, Boolean)]) =
      rows.toDF("id", "version", "v", "is_delete")
    Merge.applyChangeBatch(dir, 0L, batch(Seq((1L, 1L, "a", false))),
      Seq("id"), "version", Some("is_delete"))
    Merge.applyChangeBatch(dir, 1L, batch(Seq((2L, 1L, "b", false))),
      Seq("id"), "version", Some("is_delete"))
    Merge.applyChangeBatch(dir, 2L, batch(Seq((3L, 1L, "c", false))),
      Seq("id"), "version", Some("is_delete"))
    Merge.retainSnapshots(spark, dir, keep = 2)
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left == Set("v=1", "v=2"), s"got $left")
    // replay of the LAST batch (the one a restart would redeliver)
    // reads v=1 and rewrites v=2 identically
    Merge.applyChangeBatch(dir, 2L, batch(Seq((3L, 1L, "c", false))),
      Seq("id"), "version", Some("is_delete"))
    val got = spark.read.parquet(s"$dir/v=2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("diff: recovers add/remove/change with column attribution; self-diff empty") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0),            // unchanged
      (2L, "B", 20.0),                          // s changed
      (3L, "now", 31.0),                        // null->value AND v changed
      (5L, "e", 50.0))                          // added; 4 removed
      .toDF("k", "s", "v")
    val got = operators.Merge.diff(before, after, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).toList)).toSet
    assert(got == Set(
      (2L, "changed", List("s")),
      (3L, "changed", List("s", "v")),
      (4L, "removed", Nil),
      (5L, "added", Nil)))
    assert(operators.Merge.diff(before, before, Seq("k")).count() == 0)
    // diff(base, upsert(base, c)) == c, on a quick synthetic roundtrip
    val changes = Seq((2L, "z", 99.0)).toDF("k", "s", "v")
    val up = operators.Merge.upsert(before, changes, Seq("k"))
    val d = operators.Merge.diff(before, up, Seq("k")).collect()
    assert(d.length == 1 && d(0).getLong(0) == 2L && d(0).getString(1) == "changed")
  }

  test("scd2: effective ranges chain, exactly one current row per key") {
    val ts = (m: Int) => new java.sql.Timestamp(m * 60000L)
    val log = Seq((1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(20), "c"),
      (2L, ts(5), "q")).toDF("id", "ts", "v")
    val rows = Merge.scd2(log, Seq("id"), "ts")
      .select($"id", $"valid_from", $"valid_to", $"is_current", $"v")
      .collect()
    val k1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getTimestamp(1).getTime)
    // each version closes exactly when the next opens
    assert(k1.map(_.getTimestamp(1)) sameElements Array(ts(0), ts(10), ts(20)))
    assert(k1(0).getTimestamp(2) == ts(10) && k1(1).getTimestamp(2) == ts(20))
    assert(k1(2).getTimestamp(2) == null && k1(2).getBoolean(3))
    assert(rows.count(r => r.getBoolean(3)) == 2) // one current row per key
  }
}
