package graft

import org.apache.spark.sql.functions._
import graft.functions.{theta_difference, theta_estimate, theta_intersect,
  theta_sketch_agg, theta_union, theta_union_agg}

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  // A = [0, 60k), B = [40k, 100k): |A|=60k, |B|=60k, |A∩B|=20k,
  // |A∪B|=100k, |A\B|=40k — all in estimation mode at lgK=12
  private lazy val sketches = spark.range(100000)
    .select($"id", ($"id" < 60000).as("in_a"), ($"id" >= 40000).as("in_b"))
    .select(explode(array(
      when($"in_a", struct(lit("a").as("side"), $"id")),
      when($"in_b", struct(lit("b").as("side"), $"id")))).as("e"))
    .filter($"e".isNotNull)
    .select($"e.side", $"e.id")
    .groupBy($"side").agg(theta_sketch_agg($"id").as("sk"))

  test("estimates land within 3x rse for union, intersection, difference") {
    val r = sketches
      .agg(theta_union_agg(when($"side" === "a", $"sk")).as("ska"),
        theta_union_agg(when($"side" === "b", $"sk")).as("skb"))
      .select(theta_estimate($"ska").as("a"),
        theta_estimate($"skb").as("b"),
        theta_estimate(theta_union($"ska", $"skb")).as("u"),
        theta_estimate(theta_intersect($"ska", $"skb")).as("i"),
        theta_estimate(theta_difference($"ska", $"skb")).as("d"))
      .head()
    assert(math.abs(r.getDouble(0) - 60000) < 60000 * 0.05, s"a=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 60000) < 60000 * 0.05, s"b=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 100000) < 100000 * 0.05, s"u=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 20000) < 20000 * 0.15, s"i=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 40000) < 40000 * 0.15, s"d=${r.getDouble(4)}")
  }

  test("below nominal entries the sketch is exact, and survives parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    spark.range(1000).select(($"id" % 10).as("g"), $"id")
      .groupBy($"g").agg(theta_sketch_agg($"id").as("sk"))
      .write.mode("overwrite").parquet(dir)
    // 1000 distinct < 4096 nominal: theta=1 everywhere, estimate exact
    val est = spark.read.parquet(dir)
      .agg(theta_estimate(theta_union_agg($"sk")).as("est"))
      .head().getDouble(0)
    assert(est == 1000.0, s"est=$est")
  }

  test("string and integral inputs accepted; other types rejected at analysis") {
    val est = Seq("x", "y", "x").toDF("s")
      .agg(theta_estimate(theta_sketch_agg($"s"))).head().getDouble(0)
    assert(est == 2.0)
    graft.functions.registerAll(spark)
    val viaSql = spark.sql(
      """SELECT theta_estimate(theta_intersect(
        |  (SELECT theta_sketch_agg(id) FROM range(0, 600)),
        |  (SELECT theta_sketch_agg(id) FROM range(400, 1000)))) AS i""".stripMargin)
      .head().getDouble(0)
    assert(viaSql == 200.0, s"sql i=$viaSql") // exact: both sides < 4096
    val e = intercept[Exception] {
      spark.sql("SELECT theta_sketch_agg(CAST(1.5 AS DOUBLE))").collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
