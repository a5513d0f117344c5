package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd 8-permutation MinHash signature over a doc's
  * DISTINCT shingle array: `minhash_sig(ss)` ≡ the per-doc
  * min-aggregation of two md5 evaluations per shingle sliced into 8
  * independent 32-bit hashes — bit-identical to the declarative
  * explode → md5 → conv-slice → groupBy-min pipeline (slice i of
  * md5hex chars [1+8i, 8] is the digest's big-endian unsigned 32-bit
  * word i), but computed in ONE pass per ROW on the scan.
  *
  * The scale point: signatures are per-doc state over per-doc input, so
  * the corpus-wide explode (one row per shingle through a shuffle into
  * the signature aggregate) was pure overhead — with [[ShingleSet]]
  * feeding this expression, the whole signature table is a shuffle-free
  * scan projection. */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val salt = "1:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Digest word i (0..3) as an unsigned 32-bit long — equals
    * conv(substr(md5hex, 1+8i, 8), 16, 10). */
  private def word(d: Array[Byte], i: Int): Long =
    (((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
      ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL))

  def compute(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(8)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      val d0 = md.digest(sBytes)
      var j = 0
      while (j < 4) {
        val v = word(d0, j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      md.reset()
      md.update(salt)
      val d1 = md.digest(sBytes)
      j = 0
      while (j < 4) {
        val v = word(d1, j)
        if (v < mins(4 + j)) mins(4 + j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_).asInstanceOf[Any]))
  }
}
