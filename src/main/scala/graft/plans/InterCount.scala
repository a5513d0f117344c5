package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd set-intersection COUNT for two string arrays:
  * `inter_count(sa, sb)` ≡ `size(array_intersect(sa, sb))` cast to
  * long, without materializing the intersection array (r18, guide
  * §1.2 step 2 — per-task work on the dedup/containment verify path).
  *
  * The verify kernels evaluate this once per CANDIDATE PAIR; on the
  * degenerate-LSH corpora the hero lane surfaced (tiny shingle
  * universe → band buckets grow with corpus size → millions of
  * candidates that fail the exact gate), the per-pair constant is the
  * whole cost of the pairs stage. `array_intersect` builds a generic
  * type-dispatched hash set AND allocates the result array + a
  * GenericArrayData per row just to take its size; this expression
  * builds one HashSet over the SMALLER side and counts probe hits
  * from the larger.
  *
  * Exact `array_intersect`-count semantics: the count is
  * |distinct(sa) ∩ distinct(sb)| — each matched element is removed
  * from the build set so duplicates on the probe side cannot
  * double-count (the verify inputs are per-doc DISTINCT sets by
  * construction, so this is defensive, not load-bearing). Inputs are
  * containsNull=false arrays (shingle_set / concat_ws outputs). */
case class InterCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"inter_count expects two array<string> columns, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "inter_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    InterCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.InterCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterCount {
  /** One static call per row from codegen. Builds over the smaller
    * array, probes with the larger; matched entries are removed so the
    * count is the DISTINCT intersection size whatever the inputs. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    if (ns == 0) return 0L
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    val nb = big.numElements()
    var cnt = 0L
    var j = 0
    while (j < nb && !set.isEmpty) {
      if (set.remove(big.getUTF8String(j))) cnt += 1L
      j += 1
    }
    cnt
  }
}
