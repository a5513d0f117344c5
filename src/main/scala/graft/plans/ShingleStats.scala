package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document k-gram repetition statistics:
  * `shingle_stats(text, k)` →
  * struct&lt;n_windows, n_distinct, max_freq&gt; over the text's char
  * k-windows (code-point positions, matching substring/substr).
  *
  * This is the row-local core of Gopher/MassiveText-style repetition
  * quality filters: a doc's repetition fraction depends only on its own
  * text, so at 100 TB the filter is a pure scan expression — the
  * declarative formulation (explode k-grams → groupBy (doc, gram) →
  * max per doc) shuffles every k-gram of the corpus twice for a number
  * each row can compute in one pass. */
case class ShingleStats(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_stats"

  override protected def nullSafeEval(t: Any): Any =
    ShingleStats.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleStats.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStats {
  def compute(text: UTF8String, k: Int): InternalRow = {
    val s = text.toString
    val len = s.length
    val n = s.codePointCount(0, len)
    if (n < k) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val offs = new Array[Int](n + 1)
    var i = 0
    var cp = 0
    while (cp < n) { offs(cp) = i; i = s.offsetByCodePoints(i, 1); cp += 1 }
    offs(n) = len
    val windows = n - k + 1
    val freq = new java.util.HashMap[String, Int](2 * windows)
    var maxF = 0
    var g = 0
    while (g < windows) {
      val w = s.substring(offs(g), offs(g + k))
      val f = freq.merge(w, 1, (a, b) => a + b)
      if (f > maxF) maxF = f
      g += 1
    }
    new GenericInternalRow(Array[Any](windows.toLong, freq.size().toLong, maxF.toLong))
  }
}
