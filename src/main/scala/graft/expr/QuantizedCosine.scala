package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Micro-quantized cosine between two `array<bigint>` columns of
  * once-quantized coordinates (`round(x·10⁶)` — the
  * [[graft.llm.Similarity.kmeansRounds]] convention), as a native
  * codegen'd Catalyst expression returning the cosine in micros
  * (LONG).
  *
  * Why an Expression and not column algebra: the hash-graded kNN
  * classifier puts this in the inner loop of an n·m brute join. A
  * 64-term unrolled `element_at` tree generates a method past the
  * JIT inlining/size limits and runs interpreted (~24 µs/pair
  * measured); the lambda `aggregate(zip_with(...))` path allocates an
  * array per pair; `round()` allocates a BigDecimal per call. This
  * expression is one tight integer loop + one double division —
  * inside whole-stage codegen, the difference between feasible and
  * not on an n² shape.
  *
  * Exactness contract (mirrored by the DuckDB oracles token for
  * token): dot and both norms are EXACT integer sums of long
  * products (order-free by construction; |q| ≤ 10⁶ over ≤ 4096 dims
  * stays far inside a long); the cosine is ONE IEEE division
  * `dot / (√na·√nb)` of exact integers, scaled by 10⁶ and rounded
  * HALF AWAY FROM ZERO exactly like SQL `round()` (adding 0.5 is
  * exact below 2⁵¹ and micro cosines are < 2²¹). NULL when either
  * input is null, lengths differ (malformed pair), or either norm is
  * zero (no direction exists).
  *
  * The contract is ENFORCED, not just documented: any coordinate
  * with |q| > 10⁶ throws loudly (matching the croston/ewmVolatility
  * overflow discipline) — outside the bound the long accumulators
  * could overflow silently and return a wrong cosine. The per-element
  * branch is perfectly predicted in the hot loop (never taken on
  * in-contract data), so the guard costs nothing measurable.
  */
case class QuantizedCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "micro_cosine"

  private def roundAway(x: Double): Long =
    if (x >= 0d) math.floor(x + 0.5d).toLong
    else -math.floor(0.5d - x).toLong

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < n) {
      val xi = x.getLong(i); val yi = y.getLong(i)
      if (xi > 1000000L || xi < -1000000L || yi > 1000000L || yi < -1000000L)
        throw new IllegalArgumentException(
          s"micro_cosine: coordinate out of contract (|q| <= 1e6): " +
            s"x[$i]=$xi y[$i]=$yi")
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0L || ny == 0L) null
    else roundAway(dot.toDouble /
      (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)) * 1e6)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $xi = $a.getLong($i);
         |    final long $yi = $b.getLong($i);
         |    if ($xi > 1000000L || $xi < -1000000L
         |        || $yi > 1000000L || $yi < -1000000L) {
         |      throw new IllegalArgumentException(
         |        "micro_cosine: coordinate out of contract (|q| <= 1e6)");
         |    }
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0L || $ny == 0L) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final double $c = ((double) $dot)
         |      / (java.lang.Math.sqrt((double) $nx)
         |         * java.lang.Math.sqrt((double) $ny)) * 1.0E6;
         |    ${ev.value} = ($c >= 0.0D)
         |      ? (long) java.lang.Math.floor($c + 0.5D)
         |      : -(long) java.lang.Math.floor(0.5D - $c);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}
