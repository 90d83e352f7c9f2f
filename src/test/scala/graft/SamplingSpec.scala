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

  test("splitByKey: disjoint, exhaustive, near target proportions") {
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val got = Sampling.splitByKey(lineitem, "l_orderkey", splits)
    val n = lineitem.count()
    val byLabel = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exhaustive: every row got exactly one of the three labels
    assert(byLabel.values.sum == n)
    assert(byLabel.keySet == Set("train", "val", "test"))
    // proportions: keyed gate (per order), so tolerance is loose
    assert(math.abs(byLabel("train").toDouble / n - 0.8) < 0.08,
      s"train frac ${byLabel("train").toDouble / n}")
  }

  test("splitByKey: assignment is stable under appends (subset-invariant)") {
    val splits = Seq("train" -> 900, "test" -> 100)
    val all = Sampling.splitByKey(orders, "o_custkey", splits)
      .select($"o_orderkey", $"split")
    val subset = Sampling.splitByKey(orders.filter($"o_orderkey" < 3000), "o_custkey", splits)
      .select($"o_orderkey", $"split".as("split2"))
    // the same row gets the same split whether or not other rows exist
    assert(all.join(subset, "o_orderkey")
      .filter($"split" =!= $"split2").count() == 0)
  }

  test("splitByKey: per-key atomicity — a key never straddles splits") {
    val got = Sampling.splitByKey(lineitem, "l_orderkey",
      Seq("a" -> 500, "b" -> 500))
    assert(got.groupBy("l_orderkey")
      .agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count() == 0)
  }

  test("splitByHash rejects weights that don't sum to 1000") {
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(orders, Seq("a" -> 500), lit(1L))
    }
  }

  test("mixtureByBudget replays exactly as the integer-threshold filter") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val weights = Map("en" -> 500, "zh" -> 200, "de" -> 100, "es" -> 100, "fr" -> 100)
    val budget = 6000L
    val got = Sampling.mixtureByBudget(docs, "lang", "n_tok", weights, budget,
        rowGate = $"doc_id" * lit(7919L) + lit(13L))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // driver-side replay of the documented all-integer decision
    val tots = docs.groupBy($"lang").agg(sum($"n_tok").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = docs.select($"doc_id", $"lang").collect().filter { r =>
      val target = budget * weights.getOrElse(r.getString(1), 0) / 1000L
      val thresh = math.min(10000L, 10000L * target / tots(r.getString(1)))
      (r.getLong(0) * 7919L + 13L) % 10000L < thresh
    }.map(_.getLong(0)).toSet
    assert(got == ref)
  }

  test("mixtureByBudget: groups absent from the mixture are dropped") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val got = Sampling.mixtureByBudget(docs, "lang", "n_tok",
      Map("en" -> 1000), 6000L, $"doc_id")
    assert(got.filter($"lang" =!= "en").count() == 0)
  }

  test("mixtureByBudget: a group under its target keeps everything (no upsampling)") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    // budget so large every group's target exceeds its token mass ->
    // threshold caps at 10000 permyriad -> identity on weighted groups
    val got = Sampling.mixtureByBudget(docs, "lang", "n_tok",
      Map("en" -> 500, "zh" -> 500), 1000000000L, $"doc_id")
    assert(got.count() == docs.filter($"lang".isin("en", "zh")).count())
  }

  test("mixtureByBudget: realized token mass tracks the target per group") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val weights = Map("en" -> 500, "zh" -> 200, "de" -> 100, "es" -> 100, "fr" -> 100)
    val budget = 6000L
    val kept = Sampling.mixtureByBudget(docs, "lang", "n_tok", weights, budget,
        rowGate = $"doc_id" * lit(7919L) + lit(13L))
      .groupBy($"lang").agg(sum($"n_tok").as("mass")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tots = docs.groupBy($"lang").agg(sum($"n_tok").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.foreach { case (g, w) =>
      val target = budget * w / 1000L
      if (tots.getOrElse(g, 0L) > target) {
        val mass = kept.getOrElse(g, 0L).toDouble
        // arithmetic gate over dense ids is near-equidistributed;
        // tolerance covers token-count/gate correlation noise
        assert(mass > target * 0.4 && mass < target * 2.5,
          s"group $g: mass $mass vs target $target")
      }
    }
  }

  test("mixtureWithEpochs: upsampled group's token mass tracks its target") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val weights = Map("en" -> 400, "zh" -> 300, "de" -> 100, "es" -> 100, "fr" -> 100)
    val budget = 30000L
    val got = Sampling.mixtureWithEpochs(docs, "lang", "n_tok", weights, budget,
      rowGate = $"doc_id" * lit(7919L) + lit(13L))
    val mass = got.groupBy($"lang").agg(sum($"n_tok").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh target 9000 needs >2 epochs: repeats make the mass reachable
    val zhTarget = budget * 300 / 1000
    assert(math.abs(mass("zh") - zhTarget).toDouble / zhTarget < 0.35,
      s"zh mass ${mass("zh")} vs target $zhTarget")
    // whole-epoch copies: every zh doc appears at least floor(ratio) times
    val tots = docs.groupBy($"lang").agg(sum($"n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val zhFull = zhTarget / tots("zh")
    val minEpochs = got.filter($"lang" === "zh").groupBy($"doc_id")
      .agg(max($"epoch").as("e")).agg(min($"e")).head().getLong(0)
    assert(minEpochs >= zhFull, s"min zh epochs $minEpochs < whole epochs $zhFull")
  }

  test("mixtureWithEpochs degenerates to mixtureByBudget when nothing upsamples") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val weights = Map("en" -> 500, "zh" -> 200, "de" -> 100, "es" -> 100, "fr" -> 100)
    val gate = $"doc_id" * lit(7919L) + lit(13L)
    val epochs = Sampling.mixtureWithEpochs(docs, "lang", "n_tok", weights, 6000L, gate)
    val keep = Sampling.mixtureByBudget(docs, "lang", "n_tok", weights, 6000L, gate)
    // all ratios <= 1: every kept row has exactly epoch 1, same set
    assert(epochs.filter($"epoch" =!= 1L).count() == 0)
    val a = epochs.select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = keep.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixtureWithEpochs: maxEpochs caps runaway upsampling") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"lang",
      size(split($"text", " ")).cast("long").as("n_tok"))
    // zh target is ~100x its mass; the cap must hold it at 3 copies
    val got = Sampling.mixtureWithEpochs(docs, "lang", "n_tok",
      Map("zh" -> 1000), 400000L, $"doc_id", maxEpochs = 3)
    assert(got.agg(max($"epoch")).head().getLong(0) == 3L)
  }

  test("weightedBernoulli: inclusion tracks weight; deterministic; integer-exact") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"n_chars").cache()
    val gate = $"doc_id" * lit(7919L) + lit(47L)
    val got = Sampling.weightedBernoulli(docs, "n_chars", denom = 2000L, gate)
    // determinism: same exact set twice
    val a = got.collect().map(_.getLong(0)).sorted
    val b = Sampling.weightedBernoulli(docs, "n_chars", 2000L, gate)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // realized rate ~ E[n_chars]/2000 within 5-sigma
    val stats = docs.agg(sum($"n_chars").cast("double").as("w"),
      count(lit(1)).cast("double").as("n")).head()
    val expect = stats.getDouble(0) / 2000.0
    val sigma = math.sqrt(expect) // Poisson-binomial upper bound
    assert(math.abs(a.length - expect) < 5 * sigma,
      s"kept ${a.length}, expected ~$expect")
    // longer docs kept more often: mean weight of kept > corpus mean
    val keptMean = Sampling.weightedBernoulli(docs, "n_chars", 2000L, gate)
      .agg(avg($"n_chars")).head().getDouble(0)
    assert(keptMean > stats.getDouble(0) / stats.getDouble(1))
    // weight >= denom is always kept, <= 0 never
    val extremes = Seq((1L, 5000L), (2L, 0L), (3L, -7L)).toDF("doc_id", "n_chars")
    val e = Sampling.weightedBernoulli(extremes, "n_chars", 2000L, gate)
      .collect().map(_.getLong(0)).toSet
    assert(e == Set(1L))
  }

  test("weightedTopK: exactly k rows, reproducible, matches in-memory A-ES") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"n_chars").cache()
    val gate = $"doc_id" * lit(2654435761L) + lit(97L)
    val got = Sampling.weightedTopK(docs, "n_chars", k = 100, gate,
      tieBreak = Seq($"doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.size == 100)
    // replay the same draw driver-side
    val all = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = all.filter(_._2 > 0).map { case (id, w) =>
      val u = ((id * 2654435761L + 97L) % 1000003L + 1).toDouble / 1000004.0
      (id, math.log(u) / w)
    }.sortBy { case (id, p) => (-p, id) }.take(100).map(_._1).toSet
    assert(got == expect)
    // reproducible
    val again = Sampling.weightedTopK(docs, "n_chars", 100, gate,
      tieBreak = Seq($"doc_id")).collect().map(_.getLong(0)).toSet
    assert(again == got)
    // weight bias: the weighted draw's mean weight beats uniform top-100
    val meanW = all.map(_._2).sum.toDouble / all.length
    val gotMeanW = all.filter(t => got(t._1)).map(_._2).sum.toDouble / 100
    assert(gotMeanW > meanW, s"weighted draw mean $gotMeanW <= corpus mean $meanW")
  }

  test("weightedTopKPerGroup: k per group, matches driver-side per-group A-ES") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"n_chars").cache()
    val gate = $"doc_id" * lit(2654435761L) + lit(97L)
    val got = Sampling.weightedTopKPerGroup(docs, "lang", "n_chars", k = 5,
        gate, tieBreak = Seq($"doc_id"))
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = all.filter(_._3 > 0).groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.map { case (id, _, w) =>
        val u = ((id * 2654435761L + 97L) % 1000003L + 1).toDouble / 1000004.0
        (id, math.log(u) / w)
      }.sortBy { case (id, p) => (-p, id) }.take(5).map(t => (lang, t._1))
    }.toSet
    assert(got == expect)
    // every group with >= 5 positive-weight rows contributes exactly 5
    val sizes = all.filter(_._3 > 0).groupBy(_._2).view.mapValues(_.length)
    got.groupBy(_._1).foreach { case (lang, picked) =>
      assert(picked.size == math.min(5, sizes(lang)), lang)
    }
    docs.unpersist()
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

  test("sampleToMix: quotas hit the recipe exactly; exclusion; unattainable fails loudly") {
    import graft.operators.Sampling
    // groups a:60, b:30, c:10 rows; recipe 50/25 a/b (ppm 500000/250000)
    val rows = ((1 to 60).map(i => ("a", i.toLong)) ++
      (61 to 90).map(i => ("b", i.toLong)) ++
      (91 to 100).map(i => ("c", i.toLong))).toDF("g", "id")
    val got = Sampling.sampleToMix(rows, "g", "id",
      Seq("a" -> 500000L, "b" -> 250000L))
    // T = min(60e6//500000, 30e6//250000) = min(120, 120) = 120
    // quotas: a = 500000*120//1e6 = 60, b = 30
    val byG = got.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 60L, "b" -> 30L), byG.toString)
    // untargeted c excluded entirely
    assert(!byG.contains("c"))
    // picks are the Lehmer order: rank 1 of b == balancedByClass pick
    val mix1 = got.filter($"g" === "b" && $"sample_rank" === 1L)
      .select($"id").collect().head.getLong(0)
    val bal1 = Sampling.balancedByClass(rows.filter($"g" === "b"),
      "g", "id", perClass = 1).select($"id").collect().head.getLong(0)
    assert(mix1 == bal1)
    // a skewer recipe truncates: a 100000ppm, b 800000ppm ->
    // T = min(60e6//100000=600, 30e6//800000=37), quotas 3 and 29
    val skew = Sampling.sampleToMix(rows, "g", "id",
      Seq("a" -> 100000L, "b" -> 800000L))
      .groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skew == Map("a" -> 3L, "b" -> 29L), skew.toString)
    // targeted-but-absent group fails loudly
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleToMix(rows, "g", "id", Seq("zz" -> 500000L))
    }
    assert(e.getMessage.contains("unattainable"))
    // shares must sum <= 1e6
    val e2 = intercept[IllegalArgumentException] {
      Sampling.sampleToMix(rows, "g", "id",
        Seq("a" -> 700000L, "b" -> 400000L))
    }
    assert(e2.getMessage.contains("ppm"))
  }

  test("sampleTemperature: sqrt quotas closed form, n_g cap, determinism, guards") {
    // A: 100 rows, B: 4 rows -> w = (10e6, 2e6), sw = 12e6; budget 12
    // -> quotas (10, 2): the small group gets 5x its raw share
    val df = ((1 to 100).map(i => ("A", i.toLong)) ++
      (101 to 104).map(i => ("B", i.toLong))).toDF("g", "id")
    val got = Sampling.sampleTemperature(df, "g", "id", budget = 12L)
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("A" -> 10L, "B" -> 2L), byG.toString)
    assert(got.filter(col("sample_rank") > col("quota")).count() == 0L)
    // quota caps at the group's own size (no upsampling)
    val capped = Sampling.sampleTemperature(df, "g", "id", budget = 60L)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("B") == 4L, capped.toString)
    // pure function of the data: identical rows on a second run
    val again = Sampling.sampleTemperature(df, "g", "id", budget = 12L)
    assert(got.select("g", "id").collect().map(_.toString).sorted.toSeq ==
      again.select("g", "id").collect().map(_.toString).sorted.toSeq)
    assertThrows[IllegalArgumentException] {
      Sampling.sampleTemperature(df, "g", "id", budget = 0L)
    }
    assertThrows[IllegalArgumentException] {
      Sampling.sampleTemperature(df, "g", "id", budget = 10L,
        alphaPpm = 0L)
    }
  }
}
