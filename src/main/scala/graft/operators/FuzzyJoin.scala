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
    * |distinct strings sharing a variant|². */
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
      df.filter(col(c).isNotNull)
        .select(col(c).as(ps)).distinct()
        .select(col(ps), explode(variants(guarded, k)).as("__v"))
        .select(col(ps), xxhash64(col("__v")).as("__vh"))
    }
    val l = side(left, lCol, "l_str")
    val r = side(right, rCol, "r_str")
    val pairs = l.join(r, "__vh")
      .select("l_str", "r_str").distinct()
      .withColumn("edit_dist", levenshtein(col("l_str"), col("r_str")))
      .filter(col("edit_dist") <= k)
    pairs
      .join(left.select(col(lId).as("l_id"), col(lCol).as("l_str")), "l_str")
      .join(right.select(col(rId).as("r_id"), col(rCol).as("r_str")), "r_str")
      .select(col("l_id"), col("l_str"), col("r_id"), col("r_str"),
        col("edit_dist"))
  }
}
