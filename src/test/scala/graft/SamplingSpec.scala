package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = Tables.orders(spark, sf0001).cache()
  lazy val lineitem = Tables.lineitem(spark, sf0001)

  test("byKey: per-key atomicity — every key fully in or fully out") {
    val sampled = Sampling.byKey(orders, "o_custkey", permille = 200)
    val inKeys = sampled.select("o_custkey").distinct()
    // every order of a sampled key is present
    val joined = orders.join(inKeys, Seq("o_custkey"), "left_semi")
    assert(joined.count() == sampled.count())
  }

  test("byKey: deterministic across invocations") {
    val a = Sampling.byKey(orders, "o_custkey", 200).select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = Sampling.byKey(orders, "o_custkey", 200).select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("deterministic row sample: fraction within Chernoff-ish bounds") {
    val n = lineitem.count().toDouble
    val k = Sampling.deterministic(lineitem, 200, 42, $"l_orderkey", $"l_linenumber").count().toDouble
    assert(k / n > 0.15 && k / n < 0.25, s"got ${k / n}")
  }

  test("bernoulli: seeded reproducibility + bounds") {
    val a = Sampling.bernoulli(lineitem, 0.2).count()
    val b = Sampling.bernoulli(lineitem, 0.2).count()
    assert(a == b)
    val frac = a.toDouble / lineitem.count()
    assert(frac > 0.15 && frac < 0.25)
  }

  test("firstN returns exactly n rows in order") {
    val rows = Sampling.firstN(lineitem, 50, $"l_orderkey", $"l_linenumber")
      .select($"l_orderkey").collect().map(_.getLong(0))
    assert(rows.length == 50)
    assert(rows.sameElements(rows.sorted))
  }

  test("stratified sampleBy approximates requested fractions") {
    val fr = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.1)
    val c = Tables.customer(spark, sf001)
    val got = Sampling.stratified(c, "c_mktsegment", fr)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = c.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(fr.keySet))
    assert(math.abs(got("BUILDING").toDouble / base("BUILDING") - 0.5) < 0.15)
  }
}
