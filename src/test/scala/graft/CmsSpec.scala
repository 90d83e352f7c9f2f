package graft

import org.apache.spark.sql.functions._
import graft.functions.{cms_agg, cms_estimate, cms_merge_agg}

class CmsSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows over 100 keys with a known skewed profile: key k occurs
  // (k+1) * 2 times for k in [0, 100), total 10100 rows
  private lazy val data = spark.range(100)
    .select(explode(array_repeat($"id".cast("string"), (($"id" + 1) * 2).cast("int"))).as("k"))

  test("estimates are one-sided and exact in the collision-free regime") {
    val sk = data.agg(cms_agg($"k").as("sk")).scalar()
    val r = spark.range(100)
      .select($"id", cms_estimate(sk, $"id".cast("string")).as("est"))
      .select(
        sum(when($"est" === ($"id" + 1) * 2, 1).otherwise(0)).as("n_exact"),
        sum(when($"est" < ($"id" + 1) * 2, 1).otherwise(0)).as("n_under"))
      .head()
    // 100 keys in a 2^16-wide grid: no collisions, every estimate exact
    assert(r.getLong(0) == 100, s"exact=${r.getLong(0)}")
    assert(r.getLong(1) == 0, "CMS must never underestimate")
  }

  test("cell-wise merge equals the one-shot sketch, byte for byte") {
    val oneShot = data.agg(cms_agg($"k").as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = data
      .withColumn("part", pmod(xxhash64($"k"), lit(7)))
      .groupBy($"part").agg(cms_agg($"k").as("sk"))
      .agg(cms_merge_agg($"sk").as("sk"))
      .head().getAs[Array[Byte]](0)
    // deterministic seed + exact cell-wise adds: the merged grid is
    // IDENTICAL to the one-shot grid, not merely close
    assert(java.util.Arrays.equals(oneShot, merged))
  }

  test("sketches persist through parquet and probe an unseen key at zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    data.withColumn("g", substring($"k", 1, 1))
      .groupBy($"g").agg(cms_agg($"k").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val sk = spark.read.parquet(dir)
      .agg(cms_merge_agg($"sk").as("sk")).scalar()
    val r = spark.range(1)
      .select(cms_estimate(sk, lit("42")).as("hit"),
        cms_estimate(sk, lit("no-such-key")).as("miss"))
      .head()
    assert(r.getLong(0) == 86L, s"hit=${r.getLong(0)}") // (42+1)*2
    assert(r.getLong(1) == 0L, s"miss=${r.getLong(1)}")
  }

  test("SQL registration: cms_agg/cms_merge_agg/cms_estimate compose in spark.sql") {
    graft.functions.registerAll(spark)
    data.createOrReplaceTempView("cms_input")
    val est = spark.sql(
      """SELECT cms_estimate(
        |  (SELECT cms_merge_agg(sk) FROM (
        |     SELECT cms_agg(k, 5, 65536) AS sk FROM cms_input GROUP BY length(k))),
        |  '99') AS est""".stripMargin)
      .head().getLong(0)
    assert(est == 200L, s"est=$est") // (99+1)*2
  }

  test("non-string/integral input rejected at analysis time") {
    val ex = intercept[Exception] {
      Seq(1.5, 2.5).toDF("x").agg(cms_agg($"x")).head()
    }
    assert(ex.getMessage.contains("cms_agg") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"), ex.getMessage)
  }
}
