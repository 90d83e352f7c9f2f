package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** 2-D Hilbert-curve index of two integral keys into one 64-bit sort
  * key — the locality-tighter sibling of [[InterleaveBits]] (Morton):
  * consecutive Hilbert cells are ALWAYS grid-adjacent (Manhattan
  * distance 1), where the Z-curve takes a long diagonal jump every
  * power-of-two boundary. Range-partitioning a write by this key
  * therefore yields per-file bounding boxes with strictly better
  * worst-case aspect ratios than Morton — tighter min/max statistics,
  * more files pruned per predicate (the technique behind lakehouse
  * `OPTIMIZE ... HILBERT`). Same usage: normalize each dimension into
  * the bit budget, `repartitionByRange(hilbert_index(x, y))`, write.
  *
  * Bit budget: the low 16 bits of each input (order-16 curve, a
  * 65536×65536 grid, index in [0, 2³²)) — higher bits are DISCARDED,
  * so min/max-scale genuine wide keys first, exactly like the Morton
  * caveat. The transform is the textbook bit-twiddling walk (rotate
  * quadrant, accumulate s²·((3·rx) XOR ry)); the static helper takes
  * the grid order so specs can pin bijectivity + unit-step adjacency
  * on a small grid. */
case class HilbertIndex(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes exactly 2 columns (got ${children.size})")
    else children.find(c =>
        c.dataType != IntegerType && c.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral arguments, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "hilbert_index"

  override def eval(input: InternalRow): Any = {
    val a = children(0).eval(input)
    if (a == null) return null
    val b = children(1).eval(input)
    if (b == null) return null
    def toL(v: Any): Long = v match {
      case x: Int => x.toLong; case x: Long => x
    }
    HilbertIndex.xy2d(16, toL(a), toL(b))
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
          ${ev.value} = graft.expr.HilbertIndex.xy2d(16, $args);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  def apply(a: Expression, b: Expression): HilbertIndex =
    HilbertIndex(Seq(a, b))

  /** Distance along the order-`order` Hilbert curve of grid cell
    * (x, y); inputs are masked to the low `order` bits. The classic
    * quadrant-rotation walk, high square to low. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients consistently
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk: the (x, y) cell at distance `d` along the
    * order-`order` curve — spec-side only (bijectivity + unit-step
    * adjacency pins), not an expression. */
  def d2xy(order: Int, d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
