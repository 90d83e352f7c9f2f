package graft.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (the K'th-Minimum-Value generalization behind the
  * datasketches set-operation family) complete the engine's sketch
  * algebra: HLL answers "how many distinct", KLL "which quantile",
  * Bloom "is this a member", SpaceSaving "which items are heavy" —
  * Theta answers DISTINCT-COUNT SET ALGEBRA: |A ∪ B|, |A ∩ B|,
  * |A \ B| across corpora, from per-corpus binaries that persist
  * through parquet and merge in k-row aggregates. The corpus text
  * itself never shuffles and never rescans once sketched — the same
  * warehouse contract as `sketch_hll_persist`/`sketch_kll_persist`.
  *
  * Error: ~1/sqrt(2^lgK) relative standard error on union estimates
  * (lgK=12 ⇒ ~1.6%); intersection error degrades as the overlap
  * shrinks relative to the union (documented Theta behavior) — gates
  * must budget for that.
  */
object ThetaSketchOps {
  def heapify(bytes: Array[Byte]): Sketch = Sketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heapify(a), heapify(b)).toByteArray

  def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(a)); u.union(Memory.wrap(b))
    u.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heapify(a), heapify(b)).toByteArray
}

/** `theta_sketch_agg(x[, lgK])`: per-group Theta sketch (compact
  * binary) over a string or integral column. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg lgK must be in [4, 26] (got $lgK)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or integral column, got ${t.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.toString)
      case l: Long       => buf.update(l)
      case i: Int        => buf.update(i.toLong)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** `theta_union_agg(sketch)`: union of serialized Theta sketches —
  * the read-back half of the persistence pattern. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** `theta_estimate(sketch)`: distinct-count estimate of a serialized
  * Theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(v: Any): Any =
    ThetaSketchOps.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.ThetaSketchOps.estimate($v);")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_union(a, b)`: serialized pairwise union sketch (the
  * aggregate form is [[ThetaUnionAgg]]). */
case class ThetaUnionPair(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union"

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchOps.union2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ThetaSketchOps.union2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionPair =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect(a, b)`: serialized intersection sketch. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ThetaSketchOps.intersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_difference(a, b)`: serialized A-not-B sketch. */
case class ThetaDifference(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_difference"

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchOps.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ThetaSketchOps.aNotB($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDifference =
    copy(left = newLeft, right = newRight)
}
