package graft

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

import graft.expr.{CharEntropy, CosineSimilarity, DeflateLength, DocFingerprint, HilbertIndex, InterleaveBits, JaroWinklerSim, QuantizedCosine, RegexpExtractOrNull, RepetitionStats, SimHash64, TokenNGrams, UnicodeNormalize, UrlCanonicalize}

/** The engine's scalar-function surface: thin `Column` builders over
  * custom Catalyst expressions plus named compositions of built-ins.
  * Everything here stays inside whole-stage codegen (no Scala UDFs on
  * hot paths).
  */
package object functions {

  private def col(e: Expression): Column = GraftShims.column(e)
  private def ex(c: Column): Expression = GraftShims.expression(c)

  /** Pig-semantics regex extract: NULL on non-match (not `''`).
    * Reference README.md:127-140. */
  def regexp_extract_or_null(subject: Column, pattern: String, idx: Int = 1): Column =
    col(RegexpExtractOrNull(ex(subject), ex(lit(pattern)), ex(lit(idx))))

  /** Cosine similarity of two `array<float>` columns (codegen'd). */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))

  /** Cosine in micros over once-quantized `array<bigint>` coordinates
    * (exact integer dot/norms, one mirrored round — codegen'd; the
    * n²-brute inner-loop form). */
  def micro_cosine(a: Column, b: Column): Column =
    col(QuantizedCosine(ex(a), ex(b)))

  /** 64-bit rolling-hash fingerprint of a string column (codegen'd). */
  def doc_fingerprint(c: Column): Column = col(DocFingerprint(ex(c)))

  /** Jaro-Winkler similarity of two string columns (codegen'd;
    * canonical parameters — matches DuckDB's function exactly). */
  def jaro_winkler(a: Column, b: Column): Column =
    col(JaroWinklerSim(ex(a), ex(b)))

  /** 64-bit SimHash near-dup fingerprint of a document (codegen'd). */
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))

  /** Gopher-style repetition statistics struct (codegen'd one-pass;
    * see [[graft.expr.RepetitionStats]]). */
  def repetition_stats(c: Column): Column = col(RepetitionStats(ex(c)))

  /** Whitespace-token n-grams as array<string> (codegen'd one-pass;
    * see [[graft.expr.TokenNGrams]]). */
  def token_ngrams(c: Column, n: Int): Column = col(TokenNGrams(ex(c), n))

  /** Raw-DEFLATE byte length of a string (codegen'd; see
    * [[graft.expr.DeflateLength]]). */
  def deflate_length(c: Column): Column = col(DeflateLength(ex(c)))

  /** Character-class Shannon entropy in summed micro-nat terms
    * (codegen'd one-pass; see [[graft.expr.CharEntropy]]); divide by
    * `length(c)` for per-char entropy. */
  def char_entropy(c: Column): Column = col(CharEntropy(ex(c)))

  /** Morton Z-order key of 2-4 integral columns (codegen'd; see
    * [[graft.expr.InterleaveBits]]) — sort or range-partition by this
    * to cluster writes for multi-column data skipping. Bit budget is
    * 64/k per column (k=2: 32 bits, k=3: 21, k=4: 16); normalize wider
    * keys into the budget first. */
  def interleave_bits(cols: Column*): Column =
    col(InterleaveBits(cols.map(ex)))

  /** 2-D Hilbert-curve key of two integral columns (codegen'd; see
    * [[graft.expr.HilbertIndex]]) — the locality-tighter alternative
    * to [[interleave_bits]]: consecutive cells are always
    * grid-adjacent, so per-file bounding boxes stay compact. Low 16
    * bits of each input; normalize wider keys first. */
  def hilbert_index(a: Column, b: Column): Column =
    col(HilbertIndex(ex(a), ex(b)))

  /** Crawl-dedup URL canonicalization (codegen'd; see
    * [[graft.expr.UrlCanonicalize]]): lowercase scheme/authority,
    * default ports and fragments stripped, utm_* dropped, remaining
    * query params sorted. Non-URLs pass through unchanged. */
  def url_canonicalize(c: Column): Column =
    col(UrlCanonicalize(ex(c)))

  /** Compression-ratio quality signal: `deflate_len / utf8_len`,
    * NULL-safe on empty strings. Repetitive boilerplate scores low,
    * random noise scores high; curation filters cut both tails. */
  def compression_ratio(c: Column): Column =
    deflate_length(c).cast("double") /
      nullif(octet_length(c), lit(0)).cast("double")

  /** SpaceSaving heavy-hitters aggregate: top items of a string column
    * as `array<struct<item, cnt, err>>`. Map-side partial aggregation
    * ships `capacity`-sized summaries, never raw items; exact (err=0)
    * whenever true cardinality <= capacity. */
  def topk_sketch(c: Column, capacity: Int): Column =
    col(graft.expr.TopKSketch(ex(c), capacity).toAggregateExpression())

  /** KLL doubles-quantile sketch aggregate (binary, mergeable,
    * parquet-persistable). Rank error ~1.65% at default k=200. */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    col(graft.expr.KllSketchAgg(ex(c.cast("double")), k).toAggregateExpression())

  /** Union of serialized KLL sketches — the read-back half of
    * incremental percentile maintenance. */
  def kll_merge_agg(c: Column): Column =
    col(graft.expr.KllMergeAgg(ex(c)).toAggregateExpression())

  /** Count-min sketch aggregate (binary, mergeable, parquet-
    * persistable): point-count queries for ANY key, one-sided error
    * (never under; over by <= e/width * N w.p. 1 - e^-depth). */
  def cms_agg(c: Column, depth: Int = 5, width: Int = 1 << 16): Column =
    col(graft.expr.CmsAgg(ex(c), depth, width).toAggregateExpression())

  /** Cell-wise merge of serialized count-min sketches — the read-back
    * half of the persistence pattern. */
  def cms_merge_agg(c: Column): Column =
    col(graft.expr.CmsMergeAgg(ex(c)).toAggregateExpression())

  /** Occurrence-count upper bound for `item` (string) from a
    * serialized count-min sketch. */
  def cms_estimate(sketch: Column, item: Column): Column =
    col(graft.expr.CmsEstimate(ex(sketch), ex(item)))

  /** Quantile estimate at `rank` from a serialized KLL sketch;
    * NULL on an empty sketch. */
  def kll_quantile(sketch: Column, rank: Column): Column =
    col(graft.expr.KllQuantile(ex(sketch), ex(rank.cast("double"))))

  /** Theta distinct-count sketch aggregate over a string/integral
    * column (binary, mergeable, parquet-persistable) — the set-algebra
    * member of the sketch family. */
  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    col(graft.expr.ThetaSketchAgg(ex(c), lgK).toAggregateExpression())

  /** Union of serialized Theta sketches. */
  def theta_union_agg(c: Column): Column =
    col(graft.expr.ThetaUnionAgg(ex(c)).toAggregateExpression())

  /** Distinct-count estimate of a serialized Theta sketch. */
  def theta_estimate(c: Column): Column = col(graft.expr.ThetaEstimate(ex(c)))

  /** Pairwise union sketch of two serialized Theta sketches. */
  def theta_union(a: Column, b: Column): Column =
    col(graft.expr.ThetaUnionPair(ex(a), ex(b)))

  /** Intersection sketch of two serialized Theta sketches:
    * `theta_estimate(theta_intersect(a, b))` ≈ `|A ∩ B|`. */
  def theta_intersect(a: Column, b: Column): Column =
    col(graft.expr.ThetaIntersect(ex(a), ex(b)))

  /** A-not-B sketch of two serialized Theta sketches. */
  def theta_difference(a: Column, b: Column): Column =
    col(graft.expr.ThetaDifference(ex(a), ex(b)))

  /** Bloom-filter aggregate over a LONG column as a Column builder
    * (the SQL name `bloom_filter_agg` is registered separately). */
  def bloom_filter_agg(c: Column, estimatedItems: Long, numBits: Long): Column =
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      ex(c), ex(lit(estimatedItems)), ex(lit(numBits))).toAggregateExpression())

  /** Bloom membership probe; `bloom` must be foldable (a literal
    * sketch) or a scalar subquery, per Spark's contract. */
  def might_contain(bloom: Column, v: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      ex(bloom), ex(v)))

  /** Unicode-normalize to a canonical form (NFC default; NFD/NFKC/NFKD).
    * See [[graft.expr.UnicodeNormalize]]. */
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    col(UnicodeNormalize(ex(c), form))

  /** Full corpus-hygiene normalization ahead of dedup/fingerprinting:
    * strip zero-width and BOM format characters, canonicalize to NFC,
    * optionally case-fold. Order matters and the DuckDB oracle twin
    * (`text_normalize`) replays it verbatim:
    * `lower(nfc_normalize(regexp_replace(s, zw, '')))`. Row-local,
    * codegen'd end-to-end. */
  def normalize_text(c: Column, caseFold: Boolean = false): Column = {
    // U+200B..U+200D (zero-width space/non-joiner/joiner) + U+FEFF (BOM)
    val stripped = regexp_replace(c, "[​-‍﻿]", "")
    val nfc = unicode_normalize(stripped)
    if (caseFold) lower(nfc) else nfc
  }

  /** Parse `$78.91` / `$1,234.56`-style currency strings into exact
    * decimal. The reference stores money as raw strings and defers
    * parsing to query time (README.md:52-56, 239-256); this operator
    * makes that coercion explicit and exact. `try_cast` semantics:
    * garbage parses to NULL under ANSI mode instead of throwing. */
  def parse_money(c: Column): Column =
    translate(c, "$,", "").try_cast("decimal(18,2)")

  /** The single source of truth for the SQL-name surface, consumed by
    * both registration paths ([[registerAll]] for programmatic
    * sessions, [[graft.GraftExtensions]] for `spark.sql.extensions`
    * deployments) so the two can never drift. Each builder validates
    * arity with a usage message rather than surfacing a raw
    * IndexOutOfBounds to SQL clients. */
  val sqlBuilders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("regexp_extract_or_null", classOf[RegexpExtractOrNull], {
      case Seq(s, p)    => new RegexpExtractOrNull(s, p)
      case Seq(s, p, i) => RegexpExtractOrNull(s, p, i)
      case _ => throw new IllegalArgumentException(
        "regexp_extract_or_null(subject, pattern[, idx])")
    }),
    ("cosine_similarity", classOf[CosineSimilarity], {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _ => throw new IllegalArgumentException("cosine_similarity(a, b)")
    }),
    ("micro_cosine", classOf[QuantizedCosine], {
      case Seq(a, b) => QuantizedCosine(a, b)
      case _ => throw new IllegalArgumentException("micro_cosine(a, b)")
    }),
    ("doc_fingerprint", classOf[DocFingerprint], {
      case Seq(c) => DocFingerprint(c)
      case _ => throw new IllegalArgumentException("doc_fingerprint(text)")
    }),
    ("jaro_winkler", classOf[JaroWinklerSim], {
      case Seq(a, b) => JaroWinklerSim(a, b)
      case _ => throw new IllegalArgumentException("jaro_winkler(a, b)")
    }),
    ("simhash64", classOf[SimHash64], {
      case Seq(c) => SimHash64(c)
      case _ => throw new IllegalArgumentException("simhash64(text)")
    }),
    ("char_entropy", classOf[CharEntropy], {
      case Seq(c) => CharEntropy(c)
      case _ => throw new IllegalArgumentException("char_entropy(text)")
    }),
    ("repetition_stats", classOf[RepetitionStats], {
      case Seq(c) => RepetitionStats(c)
      case _ => throw new IllegalArgumentException("repetition_stats(text)")
    }),
    ("token_ngrams", classOf[TokenNGrams], {
      case Seq(c, n) if n.foldable =>
        TokenNGrams(c, n.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException(
        "token_ngrams(text, n) — n must be a literal")
    }),
    ("unicode_normalize", classOf[UnicodeNormalize], {
      case Seq(c) => UnicodeNormalize(c)
      case Seq(c, f) if f.foldable =>
        UnicodeNormalize(c, f.eval().toString)
      case _ => throw new IllegalArgumentException(
        "unicode_normalize(text[, form]) — form must be a literal")
    }),
    ("deflate_length", classOf[DeflateLength], {
      case Seq(c) => DeflateLength(c)
      case _ => throw new IllegalArgumentException("deflate_length(text)")
    }),
    ("interleave_bits", classOf[InterleaveBits], {
      case cs if cs.size >= 2 && cs.size <= 4 => InterleaveBits(cs)
      case _ => throw new IllegalArgumentException(
        "interleave_bits(a, b[, c[, d]]) — 2 to 4 columns")
    }),
    ("hilbert_index", classOf[HilbertIndex], {
      case Seq(a, b) => HilbertIndex(a, b)
      case _ => throw new IllegalArgumentException(
        "hilbert_index(a, b) — exactly 2 columns")
    }),
    ("url_canonicalize", classOf[UrlCanonicalize], {
      case Seq(c) => UrlCanonicalize(c)
      case _ => throw new IllegalArgumentException("url_canonicalize(url)")
    }),
    ("topk_sketch", classOf[graft.expr.TopKSketch], {
      case Seq(c, k) if k.foldable =>
        graft.expr.TopKSketch(c, k.eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "topk_sketch(item, capacity) — capacity must be a literal")
    }),
    ("kll_sketch_agg", classOf[graft.expr.KllSketchAgg], {
      case Seq(c) => graft.expr.KllSketchAgg(c).toAggregateExpression()
      case Seq(c, k) if k.foldable =>
        graft.expr.KllSketchAgg(c, k.eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "kll_sketch_agg(x[, k]) — k must be a literal")
    }),
    ("kll_merge_agg", classOf[graft.expr.KllMergeAgg], {
      case Seq(c) => graft.expr.KllMergeAgg(c).toAggregateExpression()
      case _ => throw new IllegalArgumentException("kll_merge_agg(sketch)")
    }),
    ("cms_agg", classOf[graft.expr.CmsAgg], {
      case Seq(c) => graft.expr.CmsAgg(c).toAggregateExpression()
      case Seq(c, d, w) if d.foldable && w.foldable =>
        graft.expr.CmsAgg(c, d.eval().asInstanceOf[Number].intValue(),
          w.eval().asInstanceOf[Number].intValue()).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "cms_agg(x[, depth, width]) — depth/width must be literals")
    }),
    ("cms_merge_agg", classOf[graft.expr.CmsMergeAgg], {
      case Seq(c) => graft.expr.CmsMergeAgg(c).toAggregateExpression()
      case _ => throw new IllegalArgumentException("cms_merge_agg(sketch)")
    }),
    ("cms_estimate", classOf[graft.expr.CmsEstimate], {
      case Seq(s, i) => graft.expr.CmsEstimate(s, i)
      case _ => throw new IllegalArgumentException("cms_estimate(sketch, item)")
    }),
    ("kll_quantile", classOf[graft.expr.KllQuantile], {
      case Seq(s, q) => graft.expr.KllQuantile(s, q)
      case _ => throw new IllegalArgumentException("kll_quantile(sketch, rank)")
    }),
    ("theta_sketch_agg", classOf[graft.expr.ThetaSketchAgg], {
      case Seq(c) => graft.expr.ThetaSketchAgg(c).toAggregateExpression()
      case Seq(c, k) if k.foldable =>
        graft.expr.ThetaSketchAgg(c, k.eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "theta_sketch_agg(x[, lgK]) — lgK must be a literal")
    }),
    ("theta_union_agg", classOf[graft.expr.ThetaUnionAgg], {
      case Seq(c) => graft.expr.ThetaUnionAgg(c).toAggregateExpression()
      case _ => throw new IllegalArgumentException("theta_union_agg(sketch)")
    }),
    ("theta_estimate", classOf[graft.expr.ThetaEstimate], {
      case Seq(c) => graft.expr.ThetaEstimate(c)
      case _ => throw new IllegalArgumentException("theta_estimate(sketch)")
    }),
    ("theta_union", classOf[graft.expr.ThetaUnionPair], {
      case Seq(a, b) => graft.expr.ThetaUnionPair(a, b)
      case _ => throw new IllegalArgumentException("theta_union(a, b)")
    }),
    ("theta_intersect", classOf[graft.expr.ThetaIntersect], {
      case Seq(a, b) => graft.expr.ThetaIntersect(a, b)
      case _ => throw new IllegalArgumentException("theta_intersect(a, b)")
    }),
    ("theta_difference", classOf[graft.expr.ThetaDifference], {
      case Seq(a, b) => graft.expr.ThetaDifference(a, b)
      case _ => throw new IllegalArgumentException("theta_difference(a, b)")
    }),
    // Spark ships Bloom-filter expressions for its runtime filters but
    // does not register them publicly; the engine exposes them — the
    // URL/document membership-sketch staple of dedup pipelines.
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate], {
      case Seq(c)       => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
      case Seq(c, n)    => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
      case _ => throw new IllegalArgumentException(
        "bloom_filter_agg(col[, estimatedItems[, numBits]])")
    }),
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain], {
      case Seq(b, v) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(b, v)
      case _ => throw new IllegalArgumentException("might_contain(bloom, value)")
    }))

  /** Register SQL names for the custom expressions so `spark.sql`
    * queries can use them alongside built-ins. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "internal")
    }
  }
}
