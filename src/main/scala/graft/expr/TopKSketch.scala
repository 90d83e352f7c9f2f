package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, ByteArrayInputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al., ICDT'05):
  * at most `capacity` counters; an unseen item past capacity evicts
  * the minimum counter and inherits its count as error. Invariants:
  *  - any item with true frequency > N/capacity is guaranteed present;
  *  - for a present item, `cnt - err <= true <= cnt` on a single
  *    summary.
  * Merging (Agarwal et al., "Mergeable Summaries", PODS'12) sums
  * matching counters element-wise and keeps the top `capacity` by
  * count; merged bounds widen to |reported - true| <= 2N/capacity
  * (absent-side mass is below that side's minimum counter).
  * When the true cardinality never exceeds `capacity`, no eviction
  * happens anywhere and the summary is EXACT with err = 0 — the
  * degenerate case the value-matched oracle query pins.
  */
final class SpaceSavingSummary(val capacity: Int) {
  // item -> (count, err)
  val entries: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(item: String, weight: Long = 1L): Unit =
    entries.get(item) match {
      case Some((c, e)) => entries.update(item, (c + weight, e))
      case None if entries.size < capacity => entries.update(item, (weight, 0L))
      case None =>
        val (mItem, (mCnt, _)) = entries.minBy { case (i, (c, _)) => (c, i) }
        entries.remove(mItem)
        entries.update(item, (mCnt + weight, mCnt))
    }

  def merge(other: SpaceSavingSummary): Unit = {
    other.entries.foreach { case (i, (c, e)) =>
      entries.get(i) match {
        case Some((c0, e0)) => entries.update(i, (c0 + c, e0 + e))
        case None           => entries.update(i, (c, e))
      }
    }
    if (entries.size > capacity) {
      // keep the top `capacity` by count (ties broken by item for
      // determinism across partitionings)
      val keep = entries.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      entries.clear()
      entries ++= keep
    }
  }
}

/** `topk_sketch(item, k)`: distributed heavy-hitters aggregate over a
  * string column. One SpaceSaving summary per partition (map-side
  * partial aggregation — the raw items never shuffle, only
  * `capacity`-sized summaries), merged associatively, emitted as
  * `array<struct<item, cnt, err>>` sorted by (-cnt, item). This is the
  * custom-`TypedImperativeAggregate` member of the engine's expression
  * surface (the scalar members are codegen'd UnaryExpressions).
  */
case class TopKSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] {

  require(capacity > 0, s"topk_sketch capacity must be > 0 (got $capacity)")

  // reject non-string children at analysis time (a ClassCastException
  // in update() is the runtime alternative)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buf: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingSummary, other: SpaceSavingSummary): SpaceSavingSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSummary): Any = {
    val rows = buf.entries.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingSummary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.entries.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
}
