package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq("red bolt", "red bolts", "rad bolt", "blue gear",
    "blue year", "bolt", "bol", "completely different", "xed bolt")
    .zipWithIndex.map { case (s, i) => (i.toLong, s) }

  test("k=1: blocked join equals the naive quadratic join exactly") {
    val df = names.toDF("id", "s")
    val got = FuzzyJoin.joinWithinEditDistance(df, df, "id", "s", "id", "s", k = 1)
      .select($"l_id", $"r_id", $"edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for ((i, a) <- names; (j, b) <- names if lev(a, b) <= 1)
      yield (i, j, lev(a, b))).toSet
    assert(got == want)
    assert(want.exists(t => t._1 != t._2)) // non-trivial matches present
  }

  test("k=2: substitutions+insert combos match; distance attribution exact") {
    val df = names.toDF("id", "s")
    val got = FuzzyJoin.joinWithinEditDistance(df, df, "id", "s", "id", "s", k = 2)
      .select($"l_id", $"r_id", $"edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for ((i, a) <- names; (j, b) <- names if lev(a, b) <= 2)
      yield (i, j, lev(a, b))).toSet
    assert(got == want)
    // "red bolt" vs "rad bolts" is distance 2: found at k=2, not k=1
    assert(want.size > got.count(_._3 <= 1))
  }

  test("plan contains no cartesian or nested-loop join") {
    val df = names.toDF("id", "s")
    val p = FuzzyJoin.joinWithinEditDistance(df, df, "id", "s", "id", "s", k = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("every exchange hashes 8-byte keys, never a raw string") {
    // broadcast off so the candidate join AND both re-expansion joins
    // must shuffle — the regime where a string partition key would
    // actually move payload bytes at 100 TB
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = (0 until 2000).map(i => (i.toLong, s"name${i % 500} v${i % 7}"))
        .toDF("id", "s")
      val q = FuzzyJoin.joinWithinEditDistance(big, big, "id", "s", "id", "s", k = 1)
      q.count() // AQE: finalize the physical plan
      val p = q.queryExecution.executedPlan.toString
      val parts = "hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(parts.nonEmpty, s"expected shuffles in:\n$p")
      parts.foreach { args =>
        assert(!args.contains("str#") && !args.contains("_orig#") &&
          !args.contains("s#"),
          s"string-keyed exchange: hashpartitioning($args)")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("null strings never match; overlong strings fail loudly") {
    val withNull = (names :+ (99L, null.asInstanceOf[String])).toDF("id", "s")
    val n = FuzzyJoin.joinWithinEditDistance(withNull, withNull,
      "id", "s", "id", "s", k = 1).filter($"l_id" === 99L || $"r_id" === 99L).count()
    assert(n == 0)
    val long = Seq((1L, "a" * 100)).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.joinWithinEditDistance(long, long, "id", "s", "id", "s", k = 1).count()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("FuzzyJoin")), ex.toString)
  }
}
