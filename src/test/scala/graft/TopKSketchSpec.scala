package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.expr.SpaceSavingSummary

class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(graft.functions.topk_sketch($"item", cap).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: cardinality under capacity reproduces GROUP BY, err 0") {
    val df = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    // repartition(8) forces serialization + partial-merge across buffers
    val got = sketch(df.toDF("item").repartition(8), cap = 16)
    assert(got.toSeq == Seq(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L)))
  }

  test("eviction regime: heavy hitters survive, bounds hold") {
    // 3 heavy items among 200 singletons, capacity 16
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      Seq.fill(200)("hot3") ++ (1 to 200).map(i => s"cold$i")
    val n = rows.size.toLong
    val got = sketch(rows.toDF("item").repartition(8), cap = 16)
    val byItem = got.map { case (i, c, e) => i -> ((c, e)) }.toMap
    for ((hot, truth) <- Seq("hot1" -> 500L, "hot2" -> 300L, "hot3" -> 200L)) {
      assert(byItem.contains(hot), s"$hot missing")
      val (c, _) = byItem(hot)
      assert(math.abs(c - truth) <= 2 * n / 16, s"$hot reported $c true $truth")
    }
    assert(got.length <= 16)
  }

  test("summary merge is order-insensitive on disjoint and overlapping streams") {
    val a = new SpaceSavingSummary(8)
    val b = new SpaceSavingSummary(8)
    Seq("x", "x", "y").foreach(a.add(_))
    Seq("y", "z").foreach(b.add(_))
    val ab = new SpaceSavingSummary(8); ab.merge(a); ab.merge(b)
    val ba = new SpaceSavingSummary(8); ba.merge(b); ba.merge(a)
    assert(ab.entries == ba.entries)
    assert(ab.entries("x") == ((2L, 0L)) && ab.entries("y") == ((2L, 0L)))
  }

  test("topk_sketch registered for SQL") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT topk_sketch(c, 4) AS tk FROM VALUES ('p'),('p'),('q') AS t(c)")
      .select(explode(col("tk")).as("e")).select("e.item", "e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r == Map("p" -> 2L, "q" -> 1L))
  }

  test("topk_sketch rejects a non-string column at analysis time") {
    graft.functions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT topk_sketch(c, 4) FROM VALUES (1),(2) AS t(c)").collect()
    }
    assert(e.getMessage.contains("string"), e.getMessage)
  }
}
