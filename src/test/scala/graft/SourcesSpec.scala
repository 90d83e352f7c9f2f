package graft

import org.apache.spark.sql.functions._
import graft.functions.parse_money
import graft.operators.Quality
import graft.sources.{Csv, Writers}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val fixture = getClass.getResource("/medicare_sample.csv").getPath
  // cache=true: the corrupt-report test projects only the corrupt column
  lazy val raw = Csv.read(spark, fixture, Csv.medicareSchema, cache = true)

  // The §1.4 pathologies the reference trips on, as assertions:

  test("quoted commas stay in one field (the reference column-shifts them)") {
    val r = Csv.valid(raw).filter($"hcpcs_code" === "99223").collect()(0)
    assert(r.getAs[String]("hcpcs_description") ==
      "Initial hospital care, per day, 70 minutes")
    assert(r.getAs[Int]("line_srvc_cnt") == 93)
    // quoted comma inside credentials too
    val g = Csv.valid(raw).filter($"hcpcs_code" === "J9310").collect()(0)
    assert(g.getAs[String]("nppes_credentials") == "M.D., PH.D.")
  }

  test("banner + mid-data header rows land in _corrupt_record, not data") {
    val bad = Csv.corrupt(raw).collect().map(_.getString(0))
    assert(bad.exists(_.startsWith("CPT only copyright")))
    assert(bad.exists(_.startsWith("NPI,NPPES_PROVIDER")))
    // and no parsed row carries header junk
    assert(Csv.valid(raw).filter($"npi" === "NPI").count() == 0)
  }

  test("readMedicare applies the reference's npi != '' predicate") {
    val all = Csv.valid(raw)
    val med = Csv.readMedicare(spark, fixture)
    assert(all.filter($"npi" === "" || $"npi".isNull).count() >= 1)
    assert(med.filter($"npi" === "" || $"npi".isNull).count() == 0)
    assert(med.count() < all.count())
  }

  test("invalid-HCPCS report on the fixture finds the planted bad code") {
    val rpt = Quality.invalidCodeReport(
      Csv.readMedicare(spark, fixture), "hcpcs_code", "^([A-Z0-9]\\d{3}[A-Z0-9])$")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rpt.contains("BAD99"))
    assert(!rpt.contains("99223") && !rpt.contains("G0008") && !rpt.contains("J9310"))
  }

  test("parse_money handles $-prefixed strings exactly") {
    val got = Csv.readMedicare(spark, fixture)
      .filter($"hcpcs_code" === "88304")
      .select(parse_money($"average_submitted_chrg_amt").cast("string"))
      .collect()(0).getString(0)
    assert(got == "128.00")
  }

  test("ORC+ZLIB roundtrip preserves rows (the reference's CTAS)") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val med = Csv.readMedicare(spark, fixture)
    Writers.toOrcZlib(med, s"$dir/medicare_orc")
    val back = spark.read.orc(s"$dir/medicare_orc")
    assert(back.count() == med.count())
    assert(back.schema == med.schema)
  }

  test("CSV sink roundtrip (PigStorage analogue), overwrite mode") {
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    val med = Csv.readMedicare(spark, fixture).select($"npi", $"hcpcs_code")
    Writers.toCsv(med, s"$dir/out")
    Writers.toCsv(med, s"$dir/out") // overwrite, like Pig rmf
    val back = spark.read.schema("npi string, hcpcs_code string").csv(s"$dir/out")
    assert(back.count() == med.count())
  }

  test("wholeTextFiles and lines scans") {
    val whole = Writers.wholeTextFiles(spark, fixture)
    assert(whole.count() == 1)
    assert(whole.select("contents").head().getString(0).contains("ENKESHAFI"))
    val lines = Writers.lines(spark, fixture)
    assert(lines.count() == 11)
  }

  test("compactParquet shrinks the file count, preserves every row, sweeps stale tmp") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString + "/t"
    val df = spark.range(10000).selectExpr("id", "id % 7 AS g")
    df.repartition(32).write.parquet(dir)
    // stale debris from a "crashed" prior run must not break the sweep
    spark.range(5).write.parquet(dir + "__compact_tmp")
    val (before, after) = Writers.compactParquet(spark, dir, targetRowsPerFile = 5000L)
    assert(before >= 32 && after == 2, s"before=$before after=$after")
    val got = spark.read.parquet(dir)
    assert(got.count() == 10000)
    assert(got.agg(sum($"id")).head().getLong(0) == 10000L * 9999 / 2)
    // idempotent re-run: already compacted, file count stays
    val (b2, a2) = Writers.compactParquet(spark, dir, targetRowsPerFile = 5000L)
    assert(b2 == 2 && a2 == 2)
  }

  test("zone map prunes files by min/max, never rows; stale maps fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zm").toString + "/t"
    val df = spark.range(10000).selectExpr("id AS k", "id * 2 AS v")
    df.repartitionByRange(10, $"k").sortWithinPartitions($"k")
      .write.parquet(dir)
    val nFiles = Writers.writeZoneMap(spark, dir, Seq("k"))
    assert(nFiles == 10)
    // pruned read + predicate == full-scan answer; most files skipped
    val (pruned, kept, total) = Writers.prunedRead(spark, dir, "k", 100, 1200)
    assert(total == 10 && kept < total && kept >= 1)
    val got = pruned.filter($"k".between(100, 1200)).agg(sum($"v")).head().getLong(0)
    val want = df.filter($"k".between(100, 1200)).agg(sum($"v")).head().getLong(0)
    assert(got == want)
    // impossible range prunes everything but keeps the schema
    val (empty, kept0, _) = Writers.prunedRead(spark, dir, "k", -10, -5)
    assert(kept0 == 0 && empty.count() == 0 && empty.columns.sameElements(Array("k", "v")))
    // a write invalidates the map: fail loudly, not silently-stale
    spark.range(5).selectExpr("id + 50000 AS k", "id AS v")
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Writers.prunedRead(spark, dir, "k", 0, 10)
    }
    assert(e.getMessage.contains("stale"))
    // rebuild heals it and the new file is visible
    Writers.writeZoneMap(spark, dir, Seq("k"))
    val (p2, _, t2) = Writers.prunedRead(spark, dir, "k", 50000, 60000)
    assert(t2 == 11 && p2.filter($"k" >= 50000).count() == 5)
  }

  test("bloom map skips files on equality, survives FPs, stale maps fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm").toString + "/t"
    // round-robin layout: every file's min/max spans the range, so a
    // zone map could skip NOTHING — the bloom is the only skipper here
    val df = spark.range(20000).selectExpr("id AS k", "id * 3 AS v")
    df.repartition(10).write.parquet(dir)
    val nFiles = Writers.writeBloomMap(spark, dir, "k",
      expectedItemsPerFile = 100000L)
    assert(nFiles == 10)
    // present key: exact answer through the pruned read, files skipped
    val (pruned, kept, total) = Writers.prunedReadEquals(spark, dir, "k", 777L)
    assert(total == 10 && kept < total && kept >= 1)
    val got = pruned.filter($"k" === 777L).select($"v").head().getLong(0)
    assert(got == 2331L)
    // absent key: the FILTERED read is empty regardless of bloom FPs
    val (miss, keptMiss, _) = Writers.prunedReadEquals(spark, dir, "k", -1L)
    assert(keptMiss < total && miss.filter($"k" === -1L).count() == 0)
    // a write invalidates the map: fail loudly, not silently-stale
    spark.range(5).selectExpr("id + 50000 AS k", "id AS v")
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Writers.prunedReadEquals(spark, dir, "k", 777L)
    }
    assert(e.getMessage.contains("stale"))
    // rebuild heals it and the new file's keys probe true
    Writers.writeBloomMap(spark, dir, "k", expectedItemsPerFile = 100000L)
    val (p2, _, t2) = Writers.prunedReadEquals(spark, dir, "k", 50002L)
    assert(t2 == 11 && p2.filter($"k" === 50002L).count() == 1)
  }

  test("appendZoneMap indexes only new files; map equals a from-scratch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zma").toString + "/t"
    val df = spark.range(10000).selectExpr("id AS k", "id * 2 AS v")
    df.filter($"k" < 5000)
      .repartitionByRange(5, $"k").sortWithinPartitions($"k").write.parquet(dir)
    assert(Writers.writeZoneMap(spark, dir, Seq("k")) == 5)
    df.filter($"k" >= 5000)
      .repartitionByRange(5, $"k").sortWithinPartitions($"k")
      .write.mode("append").parquet(dir)
    val (nNew, total) = Writers.appendZoneMap(spark, dir, Seq("k"))
    assert(nNew == 5 && total == 10)
    // appended map answers over BOTH chunks and matches a rebuild
    val (pruned, kept, t) = Writers.prunedRead(spark, dir, "k", 4000, 6000)
    assert(t == 10 && kept < t)
    val got = pruned.filter($"k".between(4000, 6000)).agg(sum($"v")).head().getLong(0)
    assert(got == df.filter($"k".between(4000, 6000)).agg(sum($"v")).head().getLong(0))
    val appended = spark.read.parquet(dir + "__zonemap")
      .collect().map(_.toSeq).toSet
    Writers.writeZoneMap(spark, dir, Seq("k"))
    val rebuilt = spark.read.parquet(dir + "__zonemap")
      .collect().map(_.toSeq).toSet
    assert(appended == rebuilt, "appended map must equal a full rebuild")
    // no-op append: nothing new to index
    assert(Writers.appendZoneMap(spark, dir, Seq("k")) == ((0L, 10L)))
    // mismatched cols fail loudly instead of silently mixing schemas
    val e = intercept[IllegalArgumentException] {
      Writers.appendZoneMap(spark, dir, Seq("v"))
    }
    assert(e.getMessage.contains("do not match"))
  }

  test("appendBloomMap indexes only new files; probes match a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bma").toString + "/t"
    val df = spark.range(20000).selectExpr("id AS k", "id * 3 AS v")
    df.filter($"k" % 2 === 0).repartition(5).write.parquet(dir)
    assert(Writers.writeBloomMap(spark, dir, "k", 100000L) == 5)
    df.filter($"k" % 2 === 1).repartition(5).write.mode("append").parquet(dir)
    val (nNew, total) = Writers.appendBloomMap(spark, dir, "k", 100000L)
    assert(nNew == 5 && total == 10)
    // keys from both chunks probe through the appended map
    for (k <- Seq(776L, 777L)) {
      val (pruned, kept, t) = Writers.prunedReadEquals(spark, dir, "k", k)
      assert(t == 10 && kept >= 1)
      assert(pruned.filter($"k" === k).select($"v").head().getLong(0) == k * 3)
    }
    // bloom insertion is bit-OR: appended sketches equal rebuilt ones
    val appended = spark.read.parquet(dir + "__bloommap")
      .collect().map(r => (r.getString(0).split('/').last,
        r.getAs[Array[Byte]](1).toSeq)).toMap
    Writers.writeBloomMap(spark, dir, "k", 100000L)
    val rebuilt = spark.read.parquet(dir + "__bloommap")
      .collect().map(r => (r.getString(0).split('/').last,
        r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(appended == rebuilt, "appended sketches must equal a full rebuild")
    assert(Writers.appendBloomMap(spark, dir, "k", 100000L) == ((0L, 10L)))
  }

  test("appendBloomMap refuses a column or sizing mismatch against the map's own metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bmm").toString + "/t"
    val df = spark.range(1000).selectExpr("id AS k", "id * 3 AS v")
    df.repartition(2).write.parquet(dir)
    Writers.writeBloomMap(spark, dir, "k", 100000L)
    df.selectExpr("k + 1000 AS k", "v").repartition(2)
      .write.mode("append").parquet(dir)
    // sketches over a different column would make prunedReadEquals
    // silently skip files that DO contain the probed value
    val e1 = intercept[IllegalArgumentException] {
      Writers.appendBloomMap(spark, dir, "v", 100000L)
    }
    assert(e1.getMessage.contains("does not match"))
    val e2 = intercept[IllegalArgumentException] {
      Writers.appendBloomMap(spark, dir, "k", 50000L)
    }
    assert(e2.getMessage.contains("does not match"))
    // the matching append still lands
    assert(Writers.appendBloomMap(spark, dir, "k", 100000L) == ((2L, 4L)))
  }

  test("skipping-map swap: a mid-swap crash leaves a recoverable map, never zero copies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rec").toString + "/t"
    val df = spark.range(2000).selectExpr("id AS k", "id * 2 AS v")
    df.filter($"k" < 1000).repartition(2).write.parquet(dir)
    Writers.writeZoneMap(spark, dir, Seq("k"))
    val live = new org.apache.hadoop.fs.Path(dir + "__zonemap")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window 1: live renamed aside, tmp never promoted — the
    // next pruned read transparently restores the old map
    val old = new org.apache.hadoop.fs.Path(dir + "__zonemap__old")
    assert(fs.rename(live, old))
    val (p, _, total) = Writers.prunedRead(spark, dir, "k", 0, 10)
    assert(total == 2 && p.count() > 0)
    assert(fs.exists(live) && !fs.exists(old))
    // crash window 2: tmp fully written, live already moved aside —
    // tmp wins (append-only union, it supersets the old map)
    df.filter($"k" >= 1000).repartition(2).write.mode("append").parquet(dir)
    Writers.appendZoneMap(spark, dir, Seq("k"))
    val tmp = new org.apache.hadoop.fs.Path(dir + "__zonemap__tmp")
    assert(fs.rename(live, tmp))
    assert(Writers.appendZoneMap(spark, dir, Seq("k")) == ((0L, 4L)))
    assert(fs.exists(live) && !fs.exists(tmp))
    val (_, _, t2) = Writers.prunedRead(spark, dir, "k", 0, 2000)
    assert(t2 == 4)
  }

  test("persistent catalog: fresh session reads by name with the DECLARED schema") {
    val base = java.nio.file.Files.createTempDirectory("graft_cat").toString
    // a CSV whose inferred schema would DRIFT (no header, all-digit
    // strings would infer as ints): the catalog's declared schema is
    // what must win in the fresh session
    val csvDir = base + "/t"
    Seq(("007", 1L), ("042", 2L)).toDF("code", "n")
      .write.option("header", "false").csv(csvDir)
    Catalog.saveCatalog(spark, base + "/meta", Seq(("codes", "csv", csvDir)),
      schemas = Map("codes" -> "code STRING, n BIGINT"))
    val fresh = spark.newSession()
    assert(fresh.catalog.tableExists("codes") == false)
    assert(Catalog.loadCatalog(fresh, base + "/meta") == Seq("codes"))
    val got = fresh.sql("SELECT code, n FROM codes ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // leading zeros survive ONLY if the declared STRING schema was
    // applied; inference would have read 007 as the int 7
    assert(got == Seq(("007", 1L), ("042", 2L)), got.toString)
  }

  test("refreshSkippingIndexes re-derives stale maps after compaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ref").toString + "/t"
    val df = spark.range(10000).selectExpr("id AS k", "id % 97 AS g", "id * 2 AS v")
    df.repartitionByRange(10, $"k").sortWithinPartitions($"k").write.parquet(dir)
    Writers.writeZoneMap(spark, dir, Seq("k"))
    Writers.writeBloomMap(spark, dir, "g", 100000L)
    Writers.compactParquet(spark, dir, targetRowsPerFile = 5000L)
    // both maps now stale: pruned reads refuse
    assert(intercept[IllegalArgumentException] {
      Writers.prunedRead(spark, dir, "k", 0, 10)
    }.getMessage.contains("stale"))
    assert(intercept[IllegalArgumentException] {
      Writers.prunedReadEquals(spark, dir, "g", 5L)
    }.getMessage.contains("stale"))
    // refresh re-derives each map from its own metadata (no params)
    assert(Writers.refreshSkippingIndexes(spark, dir) == ((true, true)))
    val (p1, _, t1) = Writers.prunedRead(spark, dir, "k", 100, 200)
    assert(t1 == 2 && p1.filter($"k".between(100, 200)).count() == 101)
    val (p2, _, _) = Writers.prunedReadEquals(spark, dir, "g", 5L)
    assert(p2.filter($"g" === 5L).count() ==
      df.filter($"g" === 5L).count())
    // a dir with no maps refreshes nothing (and does not create any)
    val bare = java.nio.file.Files.createTempDirectory("graft_ref2").toString + "/t"
    df.limit(10).write.parquet(bare)
    assert(Writers.refreshSkippingIndexes(spark, bare) == ((false, false)))
  }

  test("writeAuditPublish: clean batch publishes, poisoned batch is refused") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_wap").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val good = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    val rules = Seq(Quality.Expectation.notNull("k"),
      Quality.Expectation.unique("k"))
    val (ok1, rep1) = Writers.writeAuditPublish(spark, good, dir, rules)
    assert(ok1 && rep1.filter(!$"passed").count() == 0)
    assert(spark.read.parquet(dir).count() == 100)
    // poisoned second batch: refused, published table untouched,
    // staging left for inspection
    val bad = good.union(spark.range(3).selectExpr(
      "CAST(null AS BIGINT) AS k", "id AS v"))
    val (ok2, rep2) = Writers.writeAuditPublish(spark, bad, dir, rules)
    assert(!ok2)
    assert(rep2.filter($"rule" === "k is not null")
      .head().getAs[Long]("n_violations") == 3)
    assert(spark.read.parquet(dir).count() == 100,
      "refused batch must not touch the published table")
    assert(fs.exists(new Path(dir + "__wap_staged")),
      "refused staging stays on disk for inspection")
    // a clean third batch publishes over the first
    val v3 = spark.range(50).selectExpr("id AS k", "id AS v")
    val (ok3, _) = Writers.writeAuditPublish(spark, v3, dir, rules)
    assert(ok3 && spark.read.parquet(dir).count() == 50)
    assert(!fs.exists(new Path(dir + "__wap_old")), "swap sweeps __wap_old")
    // mid-swap crash: dir missing, __wap_old present -> recovery promotes it
    assert(fs.rename(new Path(dir), new Path(dir + "__wap_old")))
    val (ok4, _) = Writers.writeAuditPublish(spark, good, dir, rules)
    assert(ok4 && spark.read.parquet(dir).count() == 100)
  }

  test("compactParquet recovers from a mid-swap crash instead of deleting the data") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp2").toString + "/t"
    val df = spark.range(1000).selectExpr("id", "id % 3 AS g")
    df.repartition(8).write.parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between rename(dir -> __old) and rename(__tmp -> dir):
    // the table dir is gone; the original lives only in __compact_old, and a
    // verified copy in __compact_tmp.
    spark.read.parquet(dir).repartition(1).write.parquet(dir + "__compact_tmp")
    assert(fs.rename(new Path(dir), new Path(dir + "__compact_old")))
    assert(!fs.exists(new Path(dir)))
    val (before, after) = Writers.compactParquet(spark, dir, targetRowsPerFile = 500L)
    val got = spark.read.parquet(dir)
    assert(got.count() == 1000, "mid-swap recovery must not lose rows")
    assert(got.agg(sum($"id")).head().getLong(0) == 1000L * 999 / 2)
    assert(after == 2, s"after=$after")
    // tmp-only crash variant (crash after dir -> __old AND old swept previously
    // is impossible; but dir absent with only __tmp left must also recover)
    assert(fs.rename(new Path(dir), new Path(dir + "__compact_tmp")))
    val (_, a3) = Writers.compactParquet(spark, dir, targetRowsPerFile = 500L)
    assert(spark.read.parquet(dir).count() == 1000)
    assert(a3 == 2)
  }

  test("dynamicOverwrite rewrites only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("dynow").toString + "/t"
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L)).toDF("id", "p", "v")
    Writers.dynamicOverwrite(spark, base, dir, Seq("p"))
    // overwrite ONLY partition b with a different payload
    Writers.dynamicOverwrite(spark,
      Seq((9L, "b", 999L)).toDF("id", "p", "v"), dir, Seq("p"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("p"),
        r.getAs[Long]("v"))).toSet
    assert(got == Set((1L, "a", 10L), (2L, "a", 20L), (9L, "b", 999L),
      (4L, "c", 40L)))
    // the session's overwrite mode is restored afterwards
    assert(spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode").forall(_ != "dynamic"))
  }

  test("vacuumDebris sweeps stale staging, keeps recovery artifacts and young dirs") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("vacuum").toString
    val dir = base + "/t"
    spark.range(0, 100).write.parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stale debris: abandoned WAP staging + compact tmp + a map __old
    // while the LIVE map exists
    spark.range(0, 5).write.parquet(dir + "__wap_staged")
    spark.range(0, 5).write.parquet(dir + "__compact_tmp")
    spark.range(0, 5).write.parquet(dir + "__zonemap")
    spark.range(0, 5).write.parquet(dir + "__zonemap__old")
    // recovery artifact: a bloommap __tmp with NO live bloommap —
    // recoverMap would promote it; the vacuum must not eat it
    spark.range(0, 5).write.parquet(dir + "__bloommap__tmp")
    val out = Writers.vacuumDebris(spark, dir, olderThanMs = 0L)
      .collect().map(r => r.getString(0).split('/').last ->
        ((r.getBoolean(3), r.getString(4)))).toMap
    assert(out("t__wap_staged")._1 && out("t__compact_tmp")._1)
    assert(out("t__zonemap__old")._1)
    assert(!out("t__bloommap__tmp")._1)
    assert(out("t__bloommap__tmp")._2.contains("crash-recovery"))
    // the live table, live map, and the recovery tmp survive
    assert(fs.exists(new Path(dir)) && fs.exists(new Path(dir + "__zonemap")))
    assert(fs.exists(new Path(dir + "__bloommap__tmp")))
    assert(!fs.exists(new Path(dir + "__wap_staged")))
    assert(!fs.exists(new Path(dir + "__zonemap__old")))
    // retention: young debris survives a 1-hour window
    spark.range(0, 5).write.parquet(dir + "__wap_staged")
    val kept = Writers.vacuumDebris(spark, dir,
        olderThanMs = 3600L * 1000).collect()
      .filter(_.getString(0).endsWith("__wap_staged")).head
    assert(!kept.getBoolean(3) && kept.getString(4).contains("younger"))
    assert(fs.exists(new Path(dir + "__wap_staged")))
    // __wap_old with NO live table = mid-swap crash: kept
    assert(fs.rename(new Path(dir), new Path(dir + "__wap_old")))
    val crash = Writers.vacuumDebris(spark, dir, olderThanMs = 0L)
      .collect().filter(_.getString(0).endsWith("__wap_old")).head
    assert(!crash.getBoolean(3))
    assert(fs.exists(new Path(dir + "__wap_old")))
  }

  test("fixedWidth: offsets slice exactly, short lines yield empty tails, render refuses overflow") {
    import graft.sources.FixedWidth
    import spark.implicits._
    val spec = Seq(("id", 4), ("name", 6), ("amt", 5))
    // exact round-trip: values with internal spaces padded, parsed back
    val src = Seq(("7", "ab cd", "12345"), ("42", "x", "9"))
      .toDF("id", "name", "amt")
    val lines = FixedWidth.render(src, spec).collect().map(_.getString(0))
    assert(lines.toSet == Set("7   ab cd 12345", "42  x     9    "),
      lines.mkString("|"))
    val back = FixedWidth.parse(FixedWidth.render(src, spec), "line", spec)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.toSet == Set(("7", "ab cd", "12345"), ("42", "x", "9")),
      back.mkString("|"))
    // a truncated record: missing tail fields surface as empty strings
    val short = Seq("99  ab").toDF("line")
    val sp = FixedWidth.parse(short, "line", spec).collect().head
    assert((sp.getString(0), sp.getString(1), sp.getString(2)) ==
      (("99", "ab", "")), sp.toString)
    // NULL renders as all spaces (parses back to empty string)
    val withNull = Seq((Option.empty[String], "n", "1"))
      .toDF("id", "name", "amt")
    val nl = FixedWidth.render(withNull, spec).collect().head.getString(0)
    assert(nl.startsWith("    n"), nl)
    // an overflowing value refuses loudly instead of corrupting offsets
    val wide = Seq(("12345", "n", "1")).toDF("id", "name", "amt")
    val e = intercept[Exception] {
      FixedWidth.render(wide, spec).collect()
    }
    assert(e.getMessage.contains("overflows width"), e.getMessage)
    // spec guards
    intercept[IllegalArgumentException] {
      FixedWidth.parse(short, "line", Seq(("a", 2), ("a", 3)))
    }
    intercept[IllegalArgumentException] {
      FixedWidth.parse(short, "line", Seq(("a", 0)))
    }
  }
}
