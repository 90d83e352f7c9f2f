package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of two 32-bit keys into one 64-bit
  * sort key. Sorting/range-partitioning a table by this key clusters
  * rows that are close in BOTH dimensions into the same files, so
  * min/max file statistics prune scans for predicates on either
  * column — the multi-dimensional-clustering technique behind
  * lakehouse `ZORDER BY`, as a plain codegen'd expression any write
  * can use (`repartitionByRange(z) → parquet`). Inputs are masked to
  * their low 32 bits; for skewed domains, rank or bucket the columns
  * first (the standard practice — Z-order assumes roughly uniform
  * key space).
  */
case class InterleaveBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType, IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires integral arguments, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  private def toLong(v: Any): Long = v match {
    case i: Int  => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.InterleaveBits.morton((long)$a, (long)$b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 32 bits of x to the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits at even positions, b's at odd. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
