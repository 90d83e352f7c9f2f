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
}
