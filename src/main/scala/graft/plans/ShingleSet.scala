package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document distinct char-k-shingle set:
  * `shingle_set(text, k)` ≡ the distinct k-char windows of `text`
  * (array_distinct(transform(sequence(1, len-k+1), g ->
  * substring(text, g, k)))), but compiled as one static call per ROW
  * inside WholeStageCodegen instead of interpreted per-element lambda
  * dispatch (higher-order functions do not codegen — measured 2.7× on
  * the minhash signature path).
  *
  * The scale point: a doc's shingles all live in its own text, so
  * per-doc dedup needs NO shuffle — this expression replaces the dedup
  * family's corpus-wide `explode + distinct()` exchange with a scan
  * expression. Window positions count CODE POINTS, matching Spark's
  * `substring` and DuckDB's `substr`. Element order is first
  * occurrence (deterministic per text); no consumer is order-sensitive
  * (set intersection, min-hashing, df counts).
  */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(t: Any): Any =
    ShingleSet.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleSet.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  /** Tight single-pass set build; one call per row from codegen. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val n = s.codePointCount(0, len)
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // code-point start offsets (UTF-16 indices); offs(i) = start of cp i
    val offs = new Array[Int](n + 1)
    var i = 0
    var cp = 0
    while (cp < n) { offs(cp) = i; i = s.offsetByCodePoints(i, 1); cp += 1 }
    offs(n) = len
    val seen = new java.util.LinkedHashSet[String](2 * (n - k + 1))
    var g = 0
    while (g + k <= n) { seen.add(s.substring(offs(g), offs(g + k))); g += 1 }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
