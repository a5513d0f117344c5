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
  /** Tight single-pass set build; one call per row from codegen.
    *
    * r18 (guide §1.2 step 2, per-task work): operates on the UTF-8
    * BYTES directly — code-point starts are the bytes not matching
    * 10xxxxxx, and each window is a zero-copy `UTF8String.fromBytes`
    * view over the shared array — instead of the old String round-trip
    * (one full char[] copy for toString, one char[] copy per window
    * substring, offsetByCodePoints walks, and a String→UTF8String
    * re-encode per kept element). Semantics identical: UTF8String
    * equality/hash is byte equality, which for valid UTF-8 coincides
    * with the String equality the old path used; window positions still
    * count CODE POINTS; element order is still first occurrence.
    * (Supplementary characters are one code POINT = one UTF-8 start
    * byte here, where String indexing would count two UTF-16 chars —
    * the old code's codePointCount/offsetByCodePoints handling was
    * exactly this mapping, so the two agree.) */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes // one copy at most (zero if exactly sized)
    val len = bytes.length
    // byte offsets of code-point starts: UTF-8 continuation bytes are
    // 10xxxxxx; everything else starts a code point
    val offs = new Array[Int](text.numChars() + 1)
    var n = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(n) = i; n += 1 }
      i += 1
    }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    offs(n) = len
    val seen = new java.util.LinkedHashSet[UTF8String](2 * (n - k + 1))
    var g = 0
    while (g + k <= n) {
      seen.add(UTF8String.fromBytes(bytes, offs(g), offs(g + k) - offs(g)))
      g += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
