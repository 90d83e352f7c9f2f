package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg'05) — the
  * POINT-COUNT member of the engine's sketch algebra: HLL answers
  * "how many distinct", KLL "which quantile", Bloom "is this a
  * member", SpaceSaving "which items are heavy", Theta "set algebra
  * on distincts" — count-min answers "about how many times did THIS
  * key occur", for any key, from a fixed `depth x width` grid of
  * counters. SpaceSaving can only answer for keys it kept; count-min
  * answers for all of them, one-sided (never under, over by at most
  * eps*N with eps = e/width, failure prob delta = e^-depth per probe).
  *
  * Backed by Spark's own `org.apache.spark.util.sketch.CountMinSketch`
  * (the class behind `DataFrameStatFunctions.countMinSketch`), seeded
  * deterministically, so the same data yields the same grid on every
  * engine run regardless of partitioning — cell-wise merge is exact
  * and commutative. Items are canonicalized to their string form
  * before hashing (CMS hashes String and Long differently; a column
  * that arrives as long in one pipeline and string in another must
  * still probe the same cells).
  */
object CmsOps {
  val Seed = 42

  def serialize(cms: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  // The scalar probe deserializes once per DISTINCT sketch buffer, not
  // once per row: a probed sketch usually arrives as a broadcast
  // scalar-subquery literal, so the same byte array object recurs for
  // every row of the stage — one thread-local (ref, parsed) pair
  // makes the per-row cost a reference compare + two hashes.
  private val lastProbe = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], item: UTF8String): Long = {
    val cached = lastProbe.get()
    val cms =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val parsed = deserialize(bytes)
        lastProbe.set((bytes, parsed))
        parsed
      }
    cms.estimateCount(item.toString)
  }
}

/** `cms_agg(x[, depth, width])`: per-group count-min sketch (compact
  * binary) over a string or integral column. Partial aggregation
  * means raw keys never shuffle — only `depth*width*8`-byte grids. */
case class CmsAgg(
    child: Expression,
    depth: Int = 5,
    width: Int = 1 << 16,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(depth > 0 && width > 0,
    s"cms_agg depth/width must be > 0 (got $depth x $width)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or integral column, got ${t.sql}")
  }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, CmsOps.Seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.add(s.toString)
      case l: Long       => buf.add(l.toString)
      case i: Int        => buf.add(i.toString)
    }
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other); buf
  }

  override def eval(buf: CountMinSketch): Any = CmsOps.serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CmsOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CmsOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

/** `cms_merge_agg(sketch)`: cell-wise merge of serialized count-min
  * sketches — the read-back half of the persistence pattern. Grids
  * must share (depth, width, seed); Spark's `mergeInPlace` throws an
  * incompatibility error otherwise (loud, not silent corruption). */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CountMinSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  // the merge identity is "no sketch yet" — (depth, width) aren't
  // parameters here, they come from the first sketch seen
  override def createAggregationBuffer(): Option[CountMinSketch] = None

  override def update(buf: Option[CountMinSketch],
      input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val incoming = CmsOps.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => acc.mergeInPlace(incoming); buf
        case None      => Some(incoming)
      }
    }
  }

  override def merge(buf: Option[CountMinSketch],
      other: Option[CountMinSketch]): Option[CountMinSketch] =
    (buf, other) match {
      case (Some(a), Some(b)) => a.mergeInPlace(b); buf
      case (None, s)          => s
      case (s, None)          => s
    }

  override def eval(buf: Option[CountMinSketch]): Any =
    buf.map(CmsOps.serialize).orNull

  override def serialize(buf: Option[CountMinSketch]): Array[Byte] =
    buf.map(CmsOps.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(CmsOps.deserialize(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, item)`: upper-bounded occurrence count of
  * `item` in a serialized count-min sketch (never under the truth;
  * over by at most eps*N except with probability e^-depth). */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch as arg 1, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item as arg 2 (cast integral keys), got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsOps.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.expr.CmsOps.estimate($s, $i);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
