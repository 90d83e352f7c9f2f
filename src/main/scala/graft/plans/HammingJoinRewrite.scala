package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a brute-force Hamming-threshold join into a
  * pigeonhole-banded equi-join.
  *
  * Pattern: `Join(L, R, Inner|Cross)` whose condition contains
  * `bit_count(a ^ b) <= k` with `a` from L and `b` from R (both
  * 64-bit) — the O(|L|·|R|) SimHash near-dup shape.
  *
  * Rewrite: split the 64 bits into `k+1` bands; by pigeonhole, any
  * pair within Hamming distance k agrees EXACTLY on at least one band,
  * so both sides are exploded to one row per (band, bandKey) and the
  * join becomes an equi-join on them — Catalyst then plans a hash/SMJ
  * shuffle on the band keys instead of a cartesian product. The
  * original condition (including the Hamming filter) is kept, so the
  * rewrite never admits a false pair; a "first colliding band"
  * predicate keeps exactly one copy per qualifying pair, preserving
  * multiplicity without a distinct. Result-identical, asymptotically
  * cheaper: candidate pairs scale with band-key collisions, not n².
  *
  * Registered through [[graft.GraftExtensions]] (opt-in via
  * `spark.sql.extensions`), NOT in the default engine session — the
  * engine's banding-completeness gate (`dedup_simhash_complete`)
  * deliberately compares brute force against the banded operator and
  * must not have its brute side silently rewritten.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val marker = "__hamming_band"
  /** Past ~15 the bands are so narrow the band-key space collapses
    * toward all-pairs — the rewrite would add cost, not remove it. */
  private val maxRadius = 15

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        // idempotence: skip joins this rule already rewrote
        if !j.children.exists(_.output.exists(_.name.startsWith(marker))) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hamming = conjuncts.collectFirst {
        case LessThanOrEqual(BitwiseCount(BitwiseXor(a, b)),
              Literal(k: Int, IntegerType))
            if k >= 0 && k <= maxRadius &&
              a.dataType == LongType && b.dataType == LongType &&
              a.deterministic && b.deterministic &&
              a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet) =>
          (a, b, k)
        case LessThanOrEqual(BitwiseCount(BitwiseXor(a, b)),
              Literal(k: Int, IntegerType))
            if k >= 0 && k <= maxRadius &&
              a.dataType == LongType && b.dataType == LongType &&
              a.deterministic && b.deterministic &&
              b.references.subsetOf(left.outputSet) &&
              a.references.subsetOf(right.outputSet) =>
          (b, a, k)
      }
      hamming match {
        case None => j
        case Some((a, b, k)) =>
          val bands = k + 1
          // same layout as Dedup.simhashNearDup (graft.expr.BandLayout)
          val layout = graft.expr.BandLayout(bands)
          def bandKey(e: Expression, i: Int): Expression = {
            val (offset, mask) = layout(i)
            BitwiseAnd(ShiftRightUnsigned(e, Literal(offset)), Literal(mask))
          }
          def explodeSide(child: LogicalPlan, e: Expression, name: String)
              : (Generate, Attribute) = {
            val arr = CreateArray(Seq.tabulate(bands)(i =>
              CreateStruct(Seq(Literal(i), bandKey(e, i)))))
            val attr = AttributeReference(name,
              arr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .elementType)()
            (Generate(Explode(arr), Nil, outer = false, None, Seq(attr), child),
              attr)
          }
          val (genL, attrL) = explodeSide(left, a, s"${marker}_l")
          val (genR, attrR) = explodeSide(right, b, s"${marker}_r")
          def field(attr: Attribute, ord: Int): Expression =
            GetStructField(attr, ord)
          // one output row per qualifying pair: keep only the FIRST
          // band both sides agree on (band j matched => no band j' < j
          // also matched)
          val firstBand = (0 until bands - 1).map { jb =>
            Or(LessThanOrEqual(field(attrL, 0), Literal(jb)),
              Not(EqualTo(bandKey(a, jb), bandKey(b, jb))))
          }
          val newCond = (Seq(
            EqualTo(field(attrL, 0), field(attrR, 0)),
            EqualTo(field(attrL, 1), field(attrR, 1))) ++
            firstBand :+ cond).reduce(And)
          Project(j.output,
            Join(genL, genR, Inner, Some(newCond), hint))
      }
  }
}
