package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of 2-4 integral keys into one 64-bit
  * sort key. Sorting/range-partitioning a table by this key clusters
  * rows that are close in EVERY dimension into the same files, so
  * min/max file statistics prune scans for predicates on any of the
  * columns — the multi-dimensional-clustering technique behind
  * lakehouse `ZORDER BY`, as a plain codegen'd expression any write
  * can use (`repartitionByRange(z) → parquet`).
  *
  * Bit budget is 64/k per input: k=2 interleaves the low 32 bits of
  * each key, k=3 the low 21, k=4 the low 16 — HIGHER BITS ARE
  * DISCARDED. Z-ordering a genuine 64-bit key (xxhash64, a natural
  * long id) directly would therefore cluster on its low bits only;
  * normalize each dimension into the budget first — rank it, bucket
  * it, or min/max-scale it in-plan (the `zorder_layout` query shows
  * the 1-row-broadcast scaling pattern). Z-order assumes a roughly
  * uniform key space regardless.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  private def k = children.size

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2 || k > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2 to 4 columns (got $k)")
    else children.find(c =>
        c.dataType != IntegerType && c.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral arguments, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "interleave_bits"

  private def fn = k match {
    case 2 => "morton"; case 3 => "morton3"; case 4 => "morton4"
  }

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v match { case x: Int => x.toLong; case x: Long => x }
      i += 1
    }
    k match {
      case 2 => InterleaveBits.morton(vs(0), vs(1))
      case 3 => InterleaveBits.morton3(vs(0), vs(1), vs(2))
      case 4 => InterleaveBits.morton4(vs(0), vs(1), vs(2), vs(3))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val args = evals.map(e => s"(long)${e.value}").mkString(", ")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expr.InterleaveBits.$fn($args);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object InterleaveBits {
  def apply(a: Expression, b: Expression): InterleaveBits =
    InterleaveBits(Seq(a, b))

  /** Spread the low 32 bits of x to every 2nd bit position. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Spread the low 21 bits of x to every 3rd bit position. */
  def spread3(x0: Long): Long = {
    var x = x0 & 0x1fffffL
    x = (x | (x << 32)) & 0x001f00000000ffffL
    x = (x | (x << 16)) & 0x001f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Spread the low 16 bits of x to every 4th bit position. */
  def spread4(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 24)) & 0x000000ff000000ffL
    x = (x | (x << 12)) & 0x000f000f000f000fL
    x = (x | (x << 6)) & 0x0303030303030303L
    x = (x | (x << 3)) & 0x1111111111111111L
    x
  }

  /** a's bits at positions 0,2,4..., b's at 1,3,5... */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def morton3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  def morton4(a: Long, b: Long, c: Long, d: Long): Long =
    spread4(a) | (spread4(b) << 1) | (spread4(c) << 2) | (spread4(d) << 3)
}
