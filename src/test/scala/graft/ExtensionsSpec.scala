package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must register the custom expressions through the
  * public `spark.sql.extensions` plugin point — a session built with
  * only that config (no graft.functions.registerAll call) resolves the
  * SQL names. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the SQL functions via SparkSessionExtensions") {
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext at session build; the shared test context predates
    // it, so exercise the same injection path through withExtensions
    // (what a fresh `--conf spark.sql.extensions=graft.GraftExtensions`
    // cluster runs at startup).
    val orig = spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val row = s2.sql("""
        SELECT simhash64('hello world') AS sh,
               doc_fingerprint('hello world') AS fp,
               cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                                 array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
               regexp_extract_or_null('nomatch', '(^X\\d{3}$)') AS miss
      """).head()
      assert(row.getLong(0) != 0L)
      assert(row.getLong(1) != 0L)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-9)
      assert(row.isNullAt(3), "Pig semantics: NULL on regex miss")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("unicode_normalize: NFC/NFKC semantics, SQL name, interpreted == codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.{normalize_text, unicode_normalize}
    import spark.implicits._
    val df = Seq(
      ("café", "café"),            // NFD vs NFC
      ("ﬁle", "file"),                    // ﬁ ligature: NFKC-only fold
      ("plain ascii", "plain ascii")).toDF("raw", "want")
    val nfc = df.select(unicode_normalize($"raw").as("got"), $"want").collect()
    assert(nfc(0).getString(0) == nfc(0).getString(1), "NFC composes the accent")
    assert(nfc(1).getString(0) == "ﬁle", "NFC leaves compatibility chars")
    assert(nfc(2).getString(0) == "plain ascii")
    val nfkc = df.select(unicode_normalize($"raw", "NFKC").as("got"), $"want").collect()
    assert(nfkc.forall(r => r.getString(0) == r.getString(1)), "NFKC folds the ligature")
    // normalize_text composes strip + NFC + casefold
    val nt = Seq("Café​ MENU").toDF("s")
      .select(normalize_text($"s", caseFold = true)).head().getString(0)
    assert(nt == "café menu")
    // SQL registration path
    graft.functions.registerAll(spark)
    // Spark's chr() is mod-256 ASCII (not a codepoint ctor like
    // DuckDB's), so embed the codepoints in the SQL text itself
    val viaSql = spark.sql(
      "SELECT unicode_normalize('café') = 'café', " +
      "unicode_normalize('ﬁle', 'NFKC')").head()
    assert(viaSql.getBoolean(0))
    assert(viaSql.getString(1) == "file")
    // interpreted == codegen (same pin the other expressions carry)
    val expr = graft.expr.UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create("café"))
    val interp = expr.eval(null)
    assert(interp.toString == "café")
    assert(Seq("café").toDF("s")
      .select(unicode_normalize($"s")).head().getString(0) == "café")
  }

  test("HammingJoinRewrite: banded equi-join replaces the cartesian, results identical") {
    import org.apache.spark.sql.functions._
    val orig = spark
    // ONE plan definition, built against whichever session is passed —
    // the comparison is only valid while both sides share it
    def hammingJoin(s: SparkSession): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      val docs = (0 until 200).map { i =>
        (i.toLong, s"the quick brown fox ${i % 17} jumps over dog ${i % 5}")
      }.toDF("id", "text")
      val fp = docs.select($"id", graft.functions.simhash64($"text").as("sh"))
      fp.select($"id".as("id_a"), $"sh".as("sh_a"))
        .crossJoin(fp.select($"id".as("id_b"), $"sh".as("sh_b")))
        .filter($"id_a" < $"id_b")
        .filter(bit_count($"sh_a".bitwiseXOR($"sh_b")) <= lit(7))
        .select($"id_a", $"id_b")
    }
    // baseline WITHOUT the rule, on the plain shared session
    val expected = hammingJoin(orig)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions()).getOrCreate()
    try {
      val joined = hammingJoin(s2)
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__hamming_band"), optimized)
      assert(optimized.contains("Generate"), optimized)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"),
        "rewrite must remove the cartesian:\n" + physical)
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      // multiplicity preserved: exactly one row per qualifying pair
      assert(joined.count() == expected.size)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
