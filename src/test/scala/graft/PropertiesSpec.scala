package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.expr.SimHash64
import graft.llm.Dedup
import graft.operators.Sampling

/** Property tests (SURVEY.md §5.3) over seeded generators — the
  * ScalaCheck style without the scalatestplus bridge (offline cache
  * carries scalatest + scalacheck only). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Array("the", "fox", "dog", "spark", "query", "scan", "merge", "data")
  private def randText(rnd: Random): String =
    Array.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" ")

  test("simhash: deterministic, self-distance 0, symmetric, bounded") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val t1 = randText(rnd); val t2 = randText(rnd)
      val a = SimHash64.compute(t1.getBytes("UTF-8"))
      val a2 = SimHash64.compute(t1.getBytes("UTF-8"))
      val b = SimHash64.compute(t2.getBytes("UTF-8"))
      assert(a == a2 && SimHash64.hamming(a, a2) == 0)
      val d = SimHash64.hamming(a, b)
      assert(d == SimHash64.hamming(b, a) && d >= 0 && d <= 64)
    }
  }

  test("interpreted eval matches codegen for custom expressions") {
    // SimHash64/DocFingerprint nullSafeEval vs the codegen'd plan path
    val rnd = new Random(7)
    val rows = (1 to 50).map(i => (i.toLong, randText(rnd)))
    val df = rows.toDF("id", "text")
    val viaPlan = df.select($"id", graft.functions.simhash64($"text"),
        graft.functions.doc_fingerprint($"text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      assert(viaPlan(id)._1 == SimHash64.compute(bytes))
      var h = 1125899906842597L
      bytes.foreach(b => h = 31L * h + b)
      assert(viaPlan(id)._2 == h)
    }
  }

  test("deterministic sampler: monotone in permille, subset semantics") {
    val li = Tables.lineitem(spark, sf0001).cache()
    val n = li.count()
    val counts = Seq(0, 100, 300, 600, 1000).map { pm =>
      pm -> Sampling.deterministic(li, pm, 7, $"l_orderkey", $"l_linenumber").count()
    }
    counts.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a <= b)
      case _ =>
    }
    assert(counts.head._2 == 0L)
    assert(counts.last._2 == n)
    // subset: every row sampled at 300 is sampled at 600
    val at300 = Sampling.deterministic(li, 300, 7, $"l_orderkey", $"l_linenumber")
    val at600 = Sampling.deterministic(li, 600, 7, $"l_orderkey", $"l_linenumber")
    assert(at300.exceptAll(at600).count() == 0)
  }

  test("exact dedup: idempotent, order-insensitive, count = distinct texts") {
    val rnd = new Random(11)
    (1 to 5).foreach { _ =>
      val ts = List.fill(30)(randText(rnd))
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exact(df, "text", "doc_id")
      val twice = Dedup.exact(once, "text", "doc_id")
      assert(once.count() == twice.count())
      assert(once.count() == ts.distinct.length)
      val shuffled = Random.shuffle(ts.zipWithIndex).map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      assert(Dedup.exact(shuffled, "text", "doc_id")
        .select("text").collect().map(_.getString(0)).sorted.toSeq ==
        once.select("text").collect().map(_.getString(0)).sorted.toSeq)
    }
  }

  test("cosine similarity: range [-1,1], symmetry, scale invariance") {
    val rnd = new Random(13)
    val pairs = (1 to 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat),
        Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val df = pairs.toDF("id", "a", "b")
    import graft.functions.cosine_similarity
    val rowsAb = df.select($"id", cosine_similarity($"a", $"b")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rowsBa = df.select($"id", cosine_similarity($"b", $"a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scaled = df.select($"id",
        cosine_similarity(transform($"a", x => x * 2.0f), $"b")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.foreach { case (id, _, _) =>
      assert(rowsAb(id) >= -1.0000001 && rowsAb(id) <= 1.0000001)
      assert(rowsAb(id) == rowsBa(id))
      assert(math.abs(rowsAb(id) - scaled(id)) < 1e-9)
    }
  }

  test("BandLayout: bands tile all 64 bits exactly, widths differ by <= 1") {
    (1 to 64).foreach { bands =>
      val layout = graft.expr.BandLayout(bands)
      assert(layout.size == bands)
      val widths = layout.map { case (_, mask) => java.lang.Long.bitCount(mask) }
      assert(widths.sum == 64, s"bands=$bands widths=$widths")
      assert(widths.max - widths.min <= 1)
      // bands are contiguous and non-overlapping: offsets are the
      // running sum of widths
      val offsets = layout.map(_._1)
      assert(offsets == widths.scanLeft(0)(_ + _).init)
      // pigeonhole, empirically: flipping any `bands - 1` bits leaves
      // at least one band untouched
      val rnd = new scala.util.Random(bands)
      val x = rnd.nextLong()
      val flipped = (0 until bands - 1).foldLeft(x)((v, _) =>
        v ^ (1L << rnd.nextInt(64)))
      val sameBand = layout.exists { case (off, mask) =>
        ((x >>> off) & mask) == ((flipped >>> off) & mask)
      }
      assert(sameBand)
    }
  }

  test("chunk: random texts/params — full token coverage, bounded sizes, exact overlap") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(300)
      val chunkTokens = 2 + rnd.nextInt(40)
      val overlap = rnd.nextInt(chunkTokens)
      val step = chunkTokens - overlap
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val rows = graft.llm.TextAnalysis.chunk(
          Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
          chunkTokens, overlap)
        .orderBy("chunk_no")
        .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
      // every chunk within size; every token covered; count formula holds
      assert(rows.forall(_._3 <= chunkTokens), s"trial $trial")
      val seen = rows.flatMap(_._2.split(" ")).toSet
      assert((0 until n).forall(i => seen.contains(s"w$i")), s"trial $trial")
      val expected = math.max(math.ceil((n - overlap).toDouble / step).toInt, 1)
      assert(rows.length == expected, s"trial $trial n=$n ct=$chunkTokens ov=$overlap")
      // consecutive chunks share exactly `overlap` tokens when full
      rows.sliding(2).foreach {
        case Array((_, a, ta), (_, b, _)) if ta == chunkTokens =>
          assert(a.split(" ").takeRight(overlap).sameElements(
            b.split(" ").take(overlap)), s"trial $trial")
        case _ =>
      }
    }
  }

  test("duplicatedSpans: random corpora match a naive reference exactly") {
    // reference: count every n-shingle STRING naively, mark positions
    // whose shingle occurs >= 2 times, gap-merge ascending positions
    // (diff <= gap) — the operator must agree span-for-span
    def naive(docs: Seq[(Long, String)], n: Int, gap: Int): Set[(Long, Int, Int, Long)] = {
      val shingles = docs.flatMap { case (id, t) =>
        val toks = t.split("\\s+")
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(p =>
          (id, p, toks.slice(p, p + n).mkString(" ")))
      }
      val counts = shingles.groupBy(_._3).view.mapValues(_.size).toMap
      val dup = shingles.filter(s => counts(s._3) >= 2)
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      dup.flatMap { case (id, ps) =>
        val spans = scala.collection.mutable.ListBuffer.empty[List[Int]]
        ps.foreach { p =>
          if (spans.nonEmpty && p - spans.last.last <= gap)
            spans(spans.length - 1) = spans.last :+ p
          else spans += List(p)
        }
        spans.map(run => (id, run.head, run.last + n, run.size.toLong))
      }.toSet
    }
    val rnd = new Random(99)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(3)             // shingle 2..4
      val gap = if (rnd.nextBoolean()) n else 1
      val docs = (0 until (3 + rnd.nextInt(5))).map { i =>
        (i.toLong, randText(rnd))            // tiny vocab → real repeats
      }
      val got = Dedup.duplicatedSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", n = n, maxGap = gap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
      val want = naive(docs, n, gap)
      assert(got == want,
        s"trial $trial n=$n gap=$gap:\n got=$got\nwant=$want\ndocs=$docs")
    }
  }

  test("containment: matches a naive reference; always >= jaccard on shared pairs") {
    val rnd = new Random(31)
    def grams(t: String, n: Int): Set[String] = {
      val toks = t.split(" ").toSeq
      (0 to math.max(toks.length - n, 0))
        .map(i => toks.slice(i, math.min(i + n, toks.length)).mkString(" "))
        .toSet
    }
    for (_ <- 1 to 5) {
      val docs = (1L to 12L).map(i => (i, randText(rnd)))
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.containment(df, "text", "doc_id", n = 2,
          minContainment = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(5)))).toMap
      // naive reference over every pair
      val gm = docs.map { case (i, t) => i -> grams(t, 2) }.toMap
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ov = (gm(a) & gm(b)).size
        m = math.min(gm(a).size, gm(b).size)
        if ov * 1000000L >= 300000L * m
      } yield (a, b) -> ((ov.toLong, ov.toDouble / m))).toMap
      assert(got == want, s"got=$got\nwant=$want")
      // containment dominates jaccard (|A∩B|/min >= |A∩B|/|A∪B|)
      got.foreach { case ((a, b), (_, c)) =>
        val j = (gm(a) & gm(b)).size.toDouble / (gm(a) | gm(b)).size
        assert(c >= j - 1e-12)
      }
    }
  }

  test("jaro_winkler: classic Winkler pairs, symmetry, codegen == interpreted") {
    import graft.expr.JaroWinklerSim
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinklerSim.compute(UTF8String.fromString(a),
        UTF8String.fromString(b))
    // canonical reference values (Winkler 1990 test set)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(jw("abc", "abc") == 1.0 && jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0)
    // boost threshold: jaro 2/3 <= 0.7 stays unboosted despite prefix
    assert(math.abs(jw("ab", "ac") - 2.0 / 3.0) < 1e-12)
    val rnd = new Random(3)
    val pairs = (1 to 100).map(_ => (randText(rnd).take(12), randText(rnd).take(12)))
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0 && s == jw(b, a), s"($a,$b)")
    }
    // plan path (codegen) equals the static kernel
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val viaPlan = df.select($"id",
        graft.functions.jaro_winkler($"a", $"b").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      assert(viaPlan(i.toLong) == jw(a, b))
    }
    // code-point semantics: a non-BMP symbol (surrogate PAIR in
    // UTF-16) is ONE unit — substituting it is one mismatch in a
    // 4-symbol string, identical to substituting an ASCII letter
    val emoji = jw("ab😀c", "ab😁c")
    val ascii = jw("abXc", "abYc")
    assert(emoji == ascii, s"$emoji != $ascii")
    assert(jw("😀", "😀") == 1.0)
  }

  test("char_entropy: closed forms, code-point classes, codegen == kernel, SQL-registered") {
    import graft.expr.CharEntropy
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String): Long = CharEntropy.compute(UTF8String.fromString(s))
    assert(h("") == 0L)
    assert(h("aaaa") == 0L) // single class: ln(1) = 0
    // uniform over 4 classes: each term round(1 * ln(4) * 1e6)
    assert(h("abcd") == 4L * math.round(math.log(4.0) * 1e6))
    // surrogate pair is ONE class: "😀😀" uniform -> 0
    assert(h("😀😀") == 0L)
    assert(h("😀a") == 2L * math.round(math.log(2.0) * 1e6))
    // independent replica on a mixed string (order-free integer sum)
    val s = "hello world"
    val counts = s.codePoints().toArray.groupBy(identity).values.map(_.length)
    val want = counts.map(c =>
      math.round(c.toDouble * math.log(s.length.toDouble / c) * 1e6)).sum
    assert(h(s) == want)
    // plan path (codegen) + SQL registration agree with the kernel
    val df = Seq((1L, "hello world"), (2L, "abcd")).toDF("id", "t")
    val viaPlan = df.select($"id", graft.functions.char_entropy($"t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPlan(1L) == want && viaPlan(2L) == h("abcd"))
    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("ce_t")
    assert(spark.sql("SELECT char_entropy(t) FROM ce_t WHERE id = 2")
      .collect().head.getLong(0) == h("abcd"))
  }

  test("labelPropagation: labels are vertex ids; one label per vertex; pure") {
    val rnd = new Random(77)
    for (_ <- 1 to 3) {
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("id_a", "id_b")
      val verts = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val out = graft.operators.Graph.labelPropagation(df, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(out.map(_._1).toSet == verts) // total assignment
      assert(out.length == verts.size)     // exactly one label each
      assert(out.forall { case (_, l) => verts.contains(l) }) // labels ⊆ ids
      val again = graft.operators.Graph.labelPropagation(df, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(out.toMap == again.toMap)     // pure function
    }
  }

  test("decimalDivTrunc == BigInt floor division, including past-long quotients where SQL div wraps") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260815L)
    // adversarial band: quotients straddling Long.MaxValue, huge
    // dividends near DECIMAL(38) capacity, tiny divisors, exact
    // multiples, and b > a
    // quotients stay inside the documented 32-integral-digit
    // DECIMAL(38,6) capacity; dividends range up to full DECIMAL(38)
    val cases = Seq(
      (BigInt("2000000000000000000000") * 1000, BigInt(2)),
      (BigInt("99999999999999999999999999999999999"), BigInt(9999)),
      (BigInt(Long.MaxValue) * 7 + 3, BigInt(7)),
      (BigInt(0), BigInt(5)),
      (BigInt(4), BigInt(9)),
      (BigInt(10).pow(37), BigInt(10).pow(6)),
      (BigInt(10).pow(34), BigInt(10).pow(30))) ++
      Seq.fill(200) {
        // dividends up to 105 bits (~3.2e31): any divisor >= 1 keeps
        // the quotient inside capacity
        val a = BigInt(rnd.nextInt(98) + 8, rnd)
        val b = BigInt(rnd.nextInt(60) + 4, rnd) + 1
        (a, b)
      }
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a.toString, b.toString) }
      .toDF("i", "a", "b")
      .select(col("i"), col("a").cast("decimal(38,0)").as("a"),
        col("b").cast("decimal(38,0)").as("b"))
    val got = df.select(col("i"),
        graft.operators.Quality.decimalDivTrunc(col("a"), col("b"))
          .cast("string").as("q"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      assert(got(i) == a / b, s"case $i: $a / $b")
    }
  }

  test("sampleToMix: quotas match a driver BigInt reference; composition within one row per group") {
    val rnd = new Random(19)
    (1 to 10).foreach { _ =>
      val nGroups = 2 + rnd.nextInt(3)
      val counts = (0 until nGroups).map(g =>
        s"g$g" -> (5L + rnd.nextInt(200))).toMap
      // random positive shares summing to <= 1e6
      val raw = (0 until nGroups).map(_ => 1 + rnd.nextInt(500000))
      val scale = BigInt(1000000) * 9 / 10 / raw.sum
      val shares = (0 until nGroups).map(g =>
        s"g$g" -> ((BigInt(raw(g)) * scale).toLong max 1L)).toMap
      val rows = counts.toSeq.flatMap { case (g, n) =>
        (1L to n).map(i => (g, i + g.hashCode.toLong.abs % 1000 * 10000))
      }.toDF("g", "id")
      val got = Sampling.sampleToMix(rows, "g", "id", shares.toSeq)
        .groupBy($"g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // driver reference in exact BigInt arithmetic
      val t = counts.map { case (g, n) =>
        BigInt(n) * 1000000 / shares(g) }.min
      val expect = shares.map { case (g, w) =>
        g -> (BigInt(w) * t / 1000000).toLong }.filter(_._2 > 0L)
      assert(got == expect, s"counts=$counts shares=$shares got=$got expect=$expect")
      // composition check: realized share (of the SELECTED rows)
      // within a few rows of the NORMALIZED target share — the
      // generator's shares need not sum to 1e6, so normalize by Σw
      val total = expect.values.sum
      val wSum = shares.values.map(BigInt(_)).sum
      if (total > 0) expect.foreach { case (g, q) =>
        val target = BigInt(shares(g)) * total / wSum
        assert((BigInt(q) - target).abs <= BigInt(nGroups),
          s"group $g quota $q vs target $target (total $total)")
      }
    }
  }

  test("changepoints: rank-1 pick equals the single-changepoint argmax on random series") {
    import graft.operators.TimeSeries
    val rnd = new Random(23)
    (1 to 8).foreach { _ =>
      val n = 12 + rnd.nextInt(30)
      val xs = (1 to n).map(i =>
        ("k", i.toLong, (rnd.nextInt(5) + (if (i > n / 2) 7 else 0)) * 1000000L))
      val df = xs.toDF("k", "o", "x")
      val single = TimeSeries.changepoint(df, "k", "o", "x").collect()
      val multi = TimeSeries.changepoints(df, "k", "o", "x",
        maxChangepoints = 3, minSegment = 2).collect()
      if (single.nonEmpty && single.head.getLong(4) > 0L) {
        val r1 = multi.find(_.getLong(1) == 1L)
        assert(r1.isDefined, "rank-1 missing where changepoint found a shift")
        assert(r1.get.getLong(2) == single.head.getLong(2),
          s"rank-1 split ${r1.get.getLong(2)} != argmax ${single.head.getLong(2)}")
      }
      // ranks are dense from 1 with strictly admissible segments
      val ranks = multi.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
  }
}
