package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join ("fuzzy join") for short strings —
  * names, codes, titles. A join on `levenshtein(l, r) <= k` has no
  * equality key, so naive Spark plans a cartesian product; this
  * implementation blocks on DELETION NEIGHBORHOODS (FastSS, Bocek et
  * al. 2007): if ed(s, t) <= k, the characters untouched by an edit
  * script form a common string reachable by deleting <= k chars from
  * each side, so the <= k-deletion variant sets of s and t intersect.
  * Blocking on a shared variant is therefore COMPLETE (no false
  * negatives); an exact `levenshtein` post-filter removes the false
  * positives.
  *
  * Scale shape: explode each side into its variants (row-local,
  * fan-out ~len^k / k!), shuffle on the 8-byte `xxhash64(variant)`,
  * equi-join, distinct the id pairs, verify. No cartesian, no
  * broadcast requirement; skewed variants (common short fragments)
  * are ordinary hot keys that AQE splits. Strings longer than
  * `maxLen` fail loudly — the fan-out is quadratic in length at k=2,
  * and long-text similarity is the n-gram/MinHash family's job
  * ([[graft.llm.Dedup]]), not edit distance's.
  *
  * Variants are built with Catalyst `transform`/`sequence` expressions
  * (codegen'd, no UDF): deleting position i = substr[0,i) ++
  * substr(i+1,...). k=2 applies the same map twice and flattens.
  */
object FuzzyJoin {

  /** Array column of all strings reachable from `s` by deleting
    * exactly one character. */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(0), length(s) - 1),
      i => concat(s.substr(lit(1), i), s.substr(i + 2, length(s))))

  /** All variants with <= k deletions, including the string itself. */
  private def variants(s: Column, k: Int): Column = k match {
    case 1 => array_distinct(concat(array(s), deleteOne(s)))
    case 2 =>
      val d1 = deleteOne(s)
      array_distinct(concat(array(s), d1, flatten(transform(d1, deleteOne(_)))))
  }

  /** All (left, right) row pairs with `levenshtein(lCol, rCol) <= k`;
    * output = left id/string, right id/string, `edit_dist`. Ids must
    * identify rows. `k` is 1 or 2. Rows whose string is NULL never
    * match; strings longer than `maxLen` raise.
    *
    * Blocking and verification run over DISTINCT strings, then the
    * verified string pairs re-expand to row ids with two equi-joins.
    * On deduplicated keys this costs one extra shuffle and nothing
    * else; on repetitive corpora (real-world name columns routinely
    * carry 100-10000x duplication) it collapses the candidate
    * explosion from |rows sharing a variant|² to
    * |distinct strings sharing a variant|².
    *
    * Every exchange in the plan partitions on 8-byte xxhash64 keys —
    * the variant join AND the id re-expansion joins. The re-expansion
    * matches rows to verified pairs on a 128-bit key (two
    * independently-seeded xxhash64 halves): a string-equality
    * post-check instead would be promoted by Catalyst into an
    * equi-join key and put the raw string back into the shuffle —
    * exactly the fuzzy-join scale leak this design exists to avoid
    * (FuzzyJoinSpec pins no string-keyed exchange survives). A wrong
    * output pair therefore needs one string colliding with another on
    * BOTH 64-bit halves (~2^-128) — the same bound
    * [[graft.llm.Dedup.exact]] documents for its winner election; the
    * edit distance itself is verified by an exact `levenshtein` per
    * distinct candidate pair. */
  def joinWithinEditDistance(left: DataFrame, right: DataFrame,
      lId: String, lCol: String, rId: String, rCol: String,
      k: Int, maxLen: Int = 64): DataFrame = {
    require(k == 1 || k == 2, s"k must be 1 or 2 (got $k)")
    def side(df: DataFrame, c: String, ps: String) = {
      // the guard lives INSIDE the variant expression — a standalone
      // guard column would be pruned away unevaluated
      val guarded = when(length(col(ps)) > maxLen,
        raise_error(concat(lit(s"FuzzyJoin: string longer than $maxLen " +
          "chars — edit-distance blocking is for short keys; use the " +
          "n-gram/MinHash family for long text (value="),
          col(ps), lit(")")))).otherwise(col(ps))
      // distinct-strings via the 128-bit key, NOT `.distinct()` on the
      // string column — map-side combine still collapses duplicates
      // before the exchange, but the partition key stays 16 bytes and
      // the string rides as payload only
      df.filter(col(c).isNotNull)
        .select(col(c).as(ps), xxhash64(col(c)).as(s"__${ps}_h"),
          xxhash64(lit(0x9E3779B9L), col(c)).as(s"__${ps}_h2"))
        .groupBy(col(s"__${ps}_h"), col(s"__${ps}_h2"))
        .agg(first(col(ps)).as(ps))
        .select(col(ps), col(s"__${ps}_h"), col(s"__${ps}_h2"),
          explode(variants(guarded, k)).as("__v"))
        .select(col(ps), col(s"__${ps}_h"), col(s"__${ps}_h2"),
          xxhash64(col("__v")).as("__vh"))
    }
    val l = side(left, lCol, "l_str")
    val r = side(right, rCol, "r_str")
    // candidate dedup groups on the 128-bit string keys, not the
    // strings (first() is safe: within a key pair the strings are
    // identical up to the 2^-128 collision the doc bounds)
    val pairs = l.join(r, "__vh")
      .groupBy(col("__l_str_h"), col("__l_str_h2"),
        col("__r_str_h"), col("__r_str_h2"))
      .agg(first(col("l_str")).as("l_str"), first(col("r_str")).as("r_str"))
      .withColumn("edit_dist", levenshtein(col("l_str"), col("r_str")))
      .filter(col("edit_dist") <= k)
      // strings DROPPED before re-expansion: they must not be join
      // attributes, or Catalyst folds them into the shuffle key
      .select(col("__l_str_h"), col("__l_str_h2"),
        col("__r_str_h"), col("__r_str_h2"), col("edit_dist"))
    val lRows = left.select(col(lId).as("l_id"), col(lCol).as("l_str"),
      xxhash64(col(lCol)).as("__l_str_h"),
      xxhash64(lit(0x9E3779B9L), col(lCol)).as("__l_str_h2"))
    val rRows = right.select(col(rId).as("r_id"), col(rCol).as("r_str"),
      xxhash64(col(rCol)).as("__r_str_h"),
      xxhash64(lit(0x9E3779B9L), col(rCol)).as("__r_str_h2"))
    pairs
      .join(lRows, Seq("__l_str_h", "__l_str_h2"))
      .join(rRows, Seq("__r_str_h", "__r_str_h2"))
      .select(col("l_id"), col("l_str"), col("r_id"), col("r_str"),
        col("edit_dist"))
  }
}
