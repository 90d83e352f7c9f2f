package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi & Sunter (JASA 1969), the
  * canonical framework behind every entity-resolution system: given
  * CANDIDATE pairs (blocking is a solved problem here —
  * [[FuzzyJoin]]'s FastSS variants, [[AsOf]]-style key blocks, or any
  * equi-join), score each pair by summing per-field agreement
  * weights: `ln(m/u)` when the field agrees, `ln((1−m)/(1−u))` when
  * it disagrees, where m = P(agree | same entity) and u =
  * P(agree | different entities). High total ⇒ link, low ⇒ non-link,
  * the band between ⇒ clerical review — the three-way decision the
  * paper optimizes.
  *
  * EXACTNESS: m/u arrive as PPM integers (a config is engine-portable
  * text); each field's two weights are CONSTANTS —
  * `round(ln(m/u)·10⁶)` over the ppm ratio, the same IEEE ln both
  * engines compute — and the pair score is an INTEGER sum of
  * constants selected by exact boolean agreements, so scores and
  * decisions replay value-for-value. A NULL agreement (either side
  * missing) contributes ZERO — absence of evidence, the standard
  * treatment — keeping every decision total.
  *
  * Scale: purely row-local over the candidate-pair stream (the
  * agreement expressions and a CASE ladder; no joins, no shuffle
  * beyond what produced the pairs). Pair generation stays the
  * caller's blocking problem by design — scoring all-pairs is the
  * mistake the framework exists to avoid. */
object Linkage {

  /** One comparison field: `agree` is any boolean Column over the
    * pair row (equality, jaro ≥ t, bucketed numeric distance…);
    * `mPpm`/`uPpm` are the m- and u-probabilities in ppm. */
  case class FsField(name: String, agree: Column, mPpm: Long, uPpm: Long) {
    require(name.nonEmpty, "field name must be non-empty")
    require(0L < uPpm && uPpm < mPpm && mPpm < 1000000L,
      s"need 0 < uPpm < mPpm < 1e6 for field $name (got m=$mPpm, u=$uPpm)" +
        " — a field where u >= m carries no linkage evidence")
  }

  /** Score candidate pairs; adds `agree_<field>` per field (nullable
    * boolean), `match_weight_micros` (integer micro-nats), and
    * `decision` ('match' / 'possible' / 'non_match') by the two
    * thresholds. */
  def fellegiSunter(pairs: DataFrame, fields: Seq[FsField],
      upperMicros: Long, lowerMicros: Long): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(lowerMicros <= upperMicros,
      s"need lowerMicros <= upperMicros (got $lowerMicros > $upperMicros)")
    val withAgree = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_${f.name}", f.agree)
    }
    val weight = fields.map { f =>
      val aw = round(log(lit(f.mPpm.toDouble) / lit(f.uPpm.toDouble)) * 1e6)
        .cast("long")
      val dw = round(log(lit((1000000L - f.mPpm).toDouble) /
        lit((1000000L - f.uPpm).toDouble)) * 1e6).cast("long")
      when(col(s"agree_${f.name}").isNull, 0L)
        .when(col(s"agree_${f.name}"), aw).otherwise(dw)
    }.reduce(_ + _)
    withAgree
      .withColumn("match_weight_micros", weight)
      .withColumn("decision",
        when(col("match_weight_micros") >= upperMicros, lit("match"))
          .when(col("match_weight_micros") <= lowerMicros, lit("non_match"))
          .otherwise(lit("possible")))
  }

  /** Survivorship / golden-record construction — the LAST stage of
    * entity resolution (blocking → [[fellegiSunter]] scoring →
    * [[Graph.connectedComponents]] clustering → THIS): collapse each
    * cluster to one record where every field takes its LATEST
    * NON-NULL value by (orderCol desc, idCol desc) — the
    * "most-recent-wins, but never let a NULL overwrite data" rule
    * that real MDM systems default to. Adds `n_members` and
    * `last_<orderCol>` per cluster. Deterministic: the (orderCol,
    * idCol) order is total, so the golden record replays
    * engine-for-engine.
    *
    * Scale: one window pass partitioned by the cluster key (clusters
    * are high-cardinality — parallel) computing per-field
    * `first(_, ignoreNulls)` over the desc order, then the rank-1 cut;
    * no self-joins, fields resolve in a single pass regardless of
    * field count. */
  def survivorship(records: DataFrame, clusterCol: String,
      orderCol: String, idCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(orderCol).desc, col(idCol).desc)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val resolved = fields.foldLeft(records) { (df, f) =>
      df.withColumn(s"golden_$f", first(col(f), ignoreNulls = true).over(wAll))
    }
    resolved
      .withColumn("n_members", count(lit(1)).over(wAll))
      .withColumn(s"last_$orderCol", max(col(orderCol)).over(wAll))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(col(clusterCol)) ++
        fields.map(f => col(s"golden_$f")) ++
        Seq(col("n_members").cast("bigint").as("n_members"),
          col(s"last_$orderCol"))): _*)
  }
}
