package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant checks across the whole SparkEntry registry.
  * (Exact value checks run through the DuckDB oracle loop; these tests
  * pin Spark-side semantics that the oracle can't see.) */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("every registered query runs and yields a non-degenerate schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must not throw
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every benchQueries name resolves — a typo here nulls the round's BENCH record") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"benchQueries without queries: $missing")
    val dupes = SparkEntry.benchQueries.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate bench entries: $dupes")
  }

  test("benchQueries holds production shapes only — no verification gates") {
    // Gates (agreement/recall/ground-truth replays) run a production plan
    // PLUS a verification pass; benching them double-counts work no user
    // pays for (round-7 verdict, 'What's wrong' #2).
    val gates = SparkEntry.benchQueries.filter(n =>
      n.endsWith("_gate") || n.contains("_recall") || n.endsWith("_replay") ||
        n == "feat_percentile_buckets_kll")
    assert(gates.isEmpty, s"verification artifacts in benchQueries: $gates")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every no_oracle query is paired with a registered, oracle-backed gate") {
    // A query without oracleSql is graded rows-only — acceptable ONLY
    // because a named deterministic companion gate IS hash-matched.
    // This pairing is load-bearing for the whole correctness story:
    // renaming or dropping a gate must fail HERE, not silently turn a
    // raw dump into ungraded output (round-10 verdict, 'Next round'
    // #7). Keys = every registered query absent from oracleSql, each
    // mapped to the gate that makes it honest.
    val pairing = Map(
      "agg_approx_distinct" -> "agg_approx_distinct_gate",
      "bpe_tokenize" -> "bpe_gate",
      "dedup_embedding" -> "dedup_embedding_recall",
      "dedup_fingerprint" -> "dedup_fp_agree",
      "dedup_minhash" -> "dedup_minhash_recall",
      "dedup_ngram_jaccard" -> "dedup_ngram_exact",
      "decontaminate_semantic" -> "decontaminate_semantic_gate",
      "dedup_semantic" -> "dedup_semantic_gate",
      "dedup_simhash" -> "dedup_simhash_complete",
      "evt_markov_attribution" -> "evt_markov_attribution_gate",
      "feat_isotonic" -> "feat_isotonic_gate",
      "ml_pca" -> "ml_pca_gate",
      "ml_tfidf" -> "ml_tfidf_gate",
      "ml_word2vec" -> "ml_word2vec_gate",
      "pipeline_tokenize_pack" -> "pipeline_tokenize_pack_gate",
      "sample_bernoulli" -> "sample_gates",
      "sample_percent" -> "sample_gates",
      "sample_stratified" -> "sample_gates",
      "sim_hard_negatives" -> "sim_hard_negatives_gate",
      "text_compression" -> "text_compression_gate",
      "sim_range_search" -> "sim_range_search_gate",
      "sim_topk_ivf" -> "sim_recall_ivf",
      "sim_topk_lsh" -> "sim_recall_lsh",
      "sim_topk_pq" -> "sim_recall_pq",
      "unigram_tokenize" -> "unigram_gate")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == pairing.keySet,
      s"unpaired no_oracle queries: ${noOracle -- pairing.keySet}; " +
        s"stale pairings: ${pairing.keySet -- noOracle}")
    pairing.foreach { case (q, gate) =>
      assert(SparkEntry.queries.contains(gate),
        s"$q's companion gate $gate is not registered")
      assert(SparkEntry.oracleSql.contains(gate),
        s"$q's companion gate $gate has no oracle — the pairing only " +
          "counts if the gate itself is hash-graded")
    }
  }

  test("approx_count_distinct within 10% of exact") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf001)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k).toDouble / n - 1.0) < 0.1, s"$k: ${approx(k)} vs $n")
    }
  }

  test("sessionize: gaps within sessions <= 30min, session starts align with min ts") {
    val sessions = SparkEntry.queries("evt_sessionize")(spark, sf0001)
    // no user has two sessions starting within 30min of each other's events:
    // weaker invariant checked cheaply — session counts are sane
    val n = sessions.count()
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(n >= users) // at least one session per active user
  }

  test("dedup_exact is idempotent") {
    val d1 = SparkEntry.queries("dedup_exact")(spark, sf0001)
    assert(d1.count() == d1.dropDuplicates("text").count())
  }

  test("diag probes emit their closed-form constants") {
    // The grader-dialect probes are constants by construction; pin
    // them so an engine-side edit can't silently drift from the
    // hand-verified folds the oracles replay.
    val cl = SparkEntry.queries("diag_rec_keyed_const_list")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(cl.toSeq == Seq(("a", 620L, 31L), ("b", 495L, 31L)))
    val lu = SparkEntry.queries("diag_rec_keyed_list_update")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(lu.toSeq == Seq(("a", 7L, 31L, 43L), ("b", 7L, 26L, 38L)))
    val dv = SparkEntry.queries("diag_div_hugeint")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dv.toSeq == Seq((-3L, -3L, -3L)))
  }

  test("evt_sliding emits ~2x tumbling events (every event in 2 windows)") {
    val sliding = SparkEntry.queries("evt_sliding")(spark, sf0001)
      .agg(sum($"n_events")).collect()(0).getLong(0)
    val nEvents = Tables.events(spark, sf0001).count()
    assert(sliding == 2 * nEvents)
  }
}
