package graft.expr

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length in bytes of the raw-DEFLATE stream of a string's UTF-8
  * bytes (zlib level 6, no wrapper). `deflate_len / octet_length` is
  * the compression-ratio quality signal modern corpus-curation
  * pipelines filter on (RefinedWeb/CCNet-style): highly repetitive
  * boilerplate compresses far below natural prose, while random noise
  * compresses above it, so both tails of the ratio distribution are
  * cut. Computing the signal inside codegen keeps the 100 TB pass a
  * single scan — no UDF serialization, no extra row copies.
  *
  * Determinism: the byte length of a DEFLATE stream is a pure function
  * of input, level, and strategy for a given deflate implementation;
  * the JVM pins zlib semantics, so re-runs and retried tasks agree.
  * The per-thread [[Deflater]] is reused via ThreadLocal (`reset()`
  * between rows) — constructing one per row would dominate the scan.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_length"

  override def nullSafeEval(v: Any): Any =
    DeflateLength.compute(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.DeflateLength.compute($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {
  // one Deflater per executor thread, reset between rows: Deflater
  // construction allocates native zlib state and is ~1000x the cost of
  // compressing a short document. The native state is reclaimed only
  // when its thread dies (no end() call) — correct for Spark's fixed
  // executor task pools; an embedding with heavy thread churn should
  // swap this for a size-bounded pool that end()s on eviction.
  private val local: ThreadLocal[Deflater] = ThreadLocal.withInitial(() =>
    new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true))

  def compute(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
