package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns the same rows as a plain join") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, "l_partkey")
    val salted = Scale.saltedJoin(li, part, "l_partkey", salt = 4)
    assert(salted.count() == plain.count())
    assert(salted.select(sum($"l_quantity")).head().getDouble(0) ==
      plain.select(sum($"l_quantity")).head().getDouble(0))
  }

  test("bucketed tables join without a shuffle exchange") {
    Scale.writeBucketed(Tables.orders(spark, sf0001), "orders_b", "o_orderkey", buckets = 4)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf0001).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", buckets = 4)
    val joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
      .groupBy("o_orderstatus").count()
    val nShuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size
    // the join itself must be shuffle-free: the only exchange allowed
    // is the final single-partition aggregate
    assert(nShuffles <= 1, s"expected co-located join, got $nShuffles shuffles")
    assert(joined.count() > 0)
  }

  test("copartition reuses one shuffle across two aggregations") {
    val li = Scale.copartition(Tables.lineitem(spark, sf0001), "l_partkey", 8).cache()
    val a = li.groupBy("l_partkey").agg(sum("l_quantity")).count()
    val b = li.groupBy("l_partkey").agg(avg("l_extendedprice")).count()
    assert(a == b)
    li.unpersist()
  }
}
