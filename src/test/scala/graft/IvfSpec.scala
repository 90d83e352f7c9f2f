package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** IVF index lifecycle: sizing formulas, build → save → load → probe
  * round-trip through parquet (the production build-once artifact). */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEmb(n: Int, dim: Int = 16, seed: Int = 11) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("auto sizing: nlist ≈ √n with floor, nprobe ≈ nlist/4 with floor") {
    assert(Similarity.ivfAutoNlist(100) == 16)     // floor
    assert(Similarity.ivfAutoNlist(2000) == 45)    // ceil(√2000)
    assert(Similarity.ivfAutoNlist(1000000) == 1000)
    assert(Similarity.ivfAutoNprobe(16) == 4)
    assert(Similarity.ivfAutoNprobe(45) == 12)
    assert(Similarity.ivfAutoNprobe(1000) == 250)
  }

  test("index round-trips through parquet: loaded probe == in-memory probe") {
    val emb = syntheticEmb(200)
    val idx = Similarity.ivfBuild(emb, "embedding", "vec_id", nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/idx"
    Similarity.ivfSave(idx, path)
    val loaded = Similarity.ivfLoad(spark, path)
    assert(loaded.nlist == 8)

    val q = emb.filter($"vec_id" < 5)
    def probe(i: Similarity.IvfIndex) =
      Similarity.ivfProbe(i, q, "embedding", "vec_id", k = 3, nprobe = 4)
        .select($"q_id", $"n_id", $"rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probe(loaded) == probe(idx))
    assert(probe(loaded).nonEmpty)
  }

  test("ivfAppend: assigns by the builder's euclidean rule, indexes every row once") {
    val emb = syntheticEmb(300)
    val base = emb.filter($"vec_id" % 10 =!= 0)
    val extra = emb.filter($"vec_id" % 10 === 0)
    val idx = Similarity.ivfBuild(base, "embedding", "vec_id", nlist = 8)
    val app = Similarity.ivfAppend(idx, extra, "embedding", "vec_id")
    assert(app.nlist == 8 && app.centroids.count() == 8) // centroids untouched
    assert(app.assigned.count() == 300)
    assert(app.assigned.select("n_id").distinct().count() == 300)
    // the append rule == the builder's rule: a vector IDENTICAL to an
    // already-indexed one must land in the same inverted list
    val twin = base.filter($"vec_id" === 1)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val app2 = Similarity.ivfAppend(idx, twin, "embedding", "vec_id")
    val clusters = app2.assigned
      .filter($"n_id".isin(1L, 100001L))
      .select("cluster").distinct().count()
    assert(clusters == 1, "identical vector routed to a different list than its twin")
    // probing the appended index can find appended vectors
    val q = extra.limit(3)
    val hits = Similarity.ivfProbe(app, q, "embedding", "vec_id", k = 3, nprobe = 8)
    assert(hits.count() > 0)
  }

  test("probe at auto sizing touches a bounded corpus fraction but finds self-neighbors") {
    // plant an exact near-duplicate of vector 0; at any probe setting
    // the duplicate's cluster == vector 0's cluster, so recall@1 of the
    // planted pair is guaranteed regardless of centroid placement
    val base = syntheticEmb(300)
    val dup = base.filter($"vec_id" === 0)
      .select(lit(999L).as("vec_id"),
        transform($"embedding", x => x * 1.0001f).as("embedding"))
    val emb = base.unionByName(dup)
    val nlist = Similarity.ivfAutoNlist(301)
    val idx = Similarity.ivfBuild(emb, "embedding", "vec_id", nlist)
    val got = Similarity.ivfProbe(idx, emb.filter($"vec_id" === 999L),
        "embedding", "vec_id", k = 1,
        nprobe = Similarity.ivfAutoNprobe(nlist))
      .select($"n_id").collect().map(_.getLong(0))
    assert(got.sameElements(Array(0L)))
  }

  test("ivfRangeSearch: full probe equals exact brute-force range set; one-sided under partial probe") {
    val emb = syntheticEmb(120)
    val idx = Similarity.ivfBuild(emb, "embedding", "vec_id", nlist = 6)
    val tau = 100000L
    def brute = {
      val a = emb.select($"vec_id".as("q_id"), $"embedding".as("va"))
      val b = emb.select($"vec_id".as("n_id"), $"embedding".as("vb"))
      a.join(b, $"q_id" =!= $"n_id")
        .withColumn("c", round(
          graft.functions.cosine_similarity($"va", $"vb") * 1e6)
          .cast("long"))
        .filter($"c" >= tau).select($"q_id", $"n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = brute
    assert(exact.nonEmpty, "degenerate fixture")
    // nprobe = nlist probes every cell: the range search is EXACT
    val full = Similarity.ivfRangeSearch(idx, emb, "embedding",
        "vec_id", tau, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, s"full probe diverged: ${full.size} vs ${exact.size}")
    // partial probe: subset of the truth, never a fabricated pair
    val part = Similarity.ivfRangeSearch(idx, emb, "embedding",
        "vec_id", tau, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(part.subsetOf(exact), "partial probe fabricated a pair")
  }

  test("sliced index: exhaustive filtered probe == filteredTopK; NULL slice is its own slice; partitioned save/load agrees") {
    // three slices, one of them NULL — a NULL tenant must match only
    // NULL-tenant candidates, never act as a wildcard
    val emb = syntheticEmb(180).withColumn("tenant",
      when($"vec_id" % 3 === 0, "a")
        .when($"vec_id" % 3 === 1, "b")
        .otherwise(lit(null).cast("string")))
    val idx = Similarity.ivfBuildSliced(emb, "embedding", "vec_id",
      Seq("tenant"), nlist = 8)
    val q = emb.filter($"vec_id" < 6)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"q_id", $"n_id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // nprobe = nlist probes every cell: exact within-slice agreement
    val exhaustive = norm(Similarity.ivfProbeFiltered(idx, q,
      "embedding", "vec_id", Seq("tenant"), k = 3, nprobe = 8))
    val truth = norm(Similarity.filteredTopK(emb, q, "embedding",
      "vec_id", Seq("tenant"), k = 3))
    assert(exhaustive == truth, s"diff: ${exhaustive.diff(truth)} / ${truth.diff(exhaustive)}")
    assert(exhaustive.nonEmpty)
    // every returned neighbor shares the query's slice (incl. NULL)
    val slices = emb.select($"vec_id", $"tenant").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    exhaustive.foreach { case (qi, ni, _) =>
      assert(slices(qi) == slices(ni), s"cross-slice pair $qi -> $ni")
    }
    // partitioned save → load → probe parity at partial nprobe
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfsl").toString + "/idx"
    Similarity.ivfSavePartitioned(idx, path, Seq("tenant"))
    val loaded = Similarity.ivfLoad(spark, path)
    assert(loaded.nlist == 8)
    def part(i: Similarity.IvfIndex) = norm(Similarity.ivfProbeFiltered(
      i, q, "embedding", "vec_id", Seq("tenant"), k = 3, nprobe = 3))
    assert(part(loaded) == part(idx))
    // FILTERED RANGE: exhaustive == brute within-slice threshold set;
    // a partial probe is a subset (one-sided error), never cross-slice
    val tau = -200000L // permissive: gaussian cosines cluster near 0
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustiveR = pairs(Similarity.ivfRangeSearchFiltered(idx, q,
      "embedding", "vec_id", Seq("tenant"), tau, nprobe = 8))
    val bruteR = pairs(Similarity.filteredTopK(emb, q, "embedding",
        "vec_id", Seq("tenant"), k = 180)
      .filter(round($"cosine" * 1e6).cast("long") >= tau)
      .select($"q_id", $"n_id"))
    assert(exhaustiveR == bruteR && exhaustiveR.nonEmpty,
      s"diff: ${exhaustiveR.diff(bruteR)} / ${bruteR.diff(exhaustiveR)}")
    exhaustiveR.foreach { case (qi, ni) =>
      assert(slices(qi) == slices(ni), s"cross-slice range pair $qi -> $ni")
    }
    val partR = pairs(Similarity.ivfRangeSearchFiltered(idx, q,
      "embedding", "vec_id", Seq("tenant"), tau, nprobe = 2))
    assert(partR.subsetOf(exhaustiveR), "partial probe fabricated a pair")
  }

  test("ivfSavePartitioned: slice values survive the roundtrip typed; empty-string slices refuse") {
    // tenants "1" and "01" both parse to integer 1 under partition
    // type inference — the schema sidecar must pin them apart, or a
    // reloaded index fabricates cross-tenant neighbors
    val emb = syntheticEmb(120).withColumn("tenant",
      when($"vec_id" % 2 === 0, "1").otherwise("01"))
    val idx = Similarity.ivfBuildSliced(emb, "embedding", "vec_id",
      Seq("tenant"), nlist = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfty").toString + "/idx"
    Similarity.ivfSavePartitioned(idx, path, Seq("tenant"))
    val loaded = Similarity.ivfLoad(spark, path)
    assert(loaded.assigned.schema("tenant").dataType ==
      org.apache.spark.sql.types.StringType,
      loaded.assigned.schema.treeString)
    val q = emb.filter($"vec_id" < 4)
    def probe(i: Similarity.IvfIndex) = Similarity.ivfProbeFiltered(
        i, q, "embedding", "vec_id", Seq("tenant"), k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = probe(loaded)
    assert(got == probe(idx) && got.nonEmpty)
    got.foreach { case (qi, ni) =>
      assert(qi % 2 == ni % 2, s"merged tenants: $qi -> $ni")
    }
    // the one value the Hive directory encoding cannot round-trip
    // ("" reads back as NULL) refuses loudly at save time
    val bad = Similarity.ivfBuildSliced(
      syntheticEmb(20).withColumn("tenant", lit("")),
      "embedding", "vec_id", Seq("tenant"), nlist = 2)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfSavePartitioned(bad, path + "_bad", Seq("tenant"))
    }
    assert(e.getMessage.contains("empty-string"), e.getMessage)
  }

  test("ivfAppendSliced / ivfAppendPartitioned: appended rows carry slices, probe equals in-memory append, guards refuse") {
    val emb = syntheticEmb(150).withColumn("tenant",
      when($"vec_id" % 3 === 0, "a")
        .when($"vec_id" % 3 === 1, "b")
        .otherwise(lit(null).cast("string")))
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val extra = emb.filter($"vec_id" % 5 === 0)
    val idx = Similarity.ivfBuildSliced(base, "embedding", "vec_id",
      Seq("tenant"), nlist = 8)
    // in-memory sliced append: every row indexed once, slices riding
    val app = Similarity.ivfAppendSliced(idx, extra, "embedding",
      "vec_id", Seq("tenant"))
    assert(app.assigned.count() == 150L)
    assert(app.assigned.columns.contains("tenant"))
    // persisted append: new files under the partitioned layout
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfslap").toString + "/idx"
    Similarity.ivfSavePartitioned(idx, path, Seq("tenant"))
    Similarity.ivfAppendPartitioned(spark, path, extra, "embedding",
      "vec_id")
    val loaded = Similarity.ivfLoad(spark, path)
    assert(loaded.assigned.count() == 150L)
    assert(loaded.assigned.select($"n_id").distinct().count() == 150L)
    // probe through the reloaded appended index == in-memory append
    val q = emb.filter($"vec_id" < 6)
    def norm(i: Similarity.IvfIndex) = Similarity.ivfProbeFiltered(
        i, q, "embedding", "vec_id", Seq("tenant"), k = 3, nprobe = 8)
      .select($"q_id", $"n_id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(norm(loaded) == norm(app))
    // exhaustive probe through the appended index == brute force
    val truth = Similarity.filteredTopK(emb, q, "embedding", "vec_id",
        Seq("tenant"), k = 3)
      .select($"q_id", $"n_id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(norm(loaded) == truth)
    // a re-typed slice column refuses (the "01"/"1" tenant merge)
    val drifted = extra.withColumn("tenant",
      when($"tenant".isNull, 0).otherwise(1))
    val exT = intercept[IllegalArgumentException] {
      Similarity.ivfAppendPartitioned(spark, path, drifted,
        "embedding", "vec_id")
    }
    assert(exT.getMessage.contains("pinned schema"), exT.getMessage)
    // empty-string slices refuse at append exactly as at save
    val exE = intercept[IllegalArgumentException] {
      Similarity.ivfAppendPartitioned(spark, path,
        extra.withColumn("tenant", lit("")), "embedding", "vec_id")
    }
    assert(exE.getMessage.contains("empty-string"), exE.getMessage)
    // a PLAIN (unsliced) persisted index refuses the partitioned
    // append — there is no layout to append under
    val plain = Similarity.ivfBuild(base, "embedding", "vec_id", nlist = 8)
    val plainPath = java.nio.file.Files
      .createTempDirectory("graft_ivfplain").toString + "/idx"
    // ivfSave writes no sidecar; write one via the partitioned saver's
    // schema convention to simulate a sliced dir missing slice cols
    plain.assigned.limit(0).coalesce(1).write
      .parquet(plainPath + "/assigned__schema")
    plain.centroids.write.parquet(plainPath + "/centroids")
    val exP = intercept[IllegalArgumentException] {
      Similarity.ivfAppendPartitioned(spark, plainPath, extra,
        "embedding", "vec_id")
    }
    assert(exP.getMessage.contains("not sliced"), exP.getMessage)
  }
}
