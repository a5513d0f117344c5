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
  // also null for an EMPTY (or all-null-element) shingle array: eight
  // Long.MaxValue sentinels would make every empty doc pair band-collide
  // as a "near-duplicate" through the registered SQL function (in-repo
  // callers filter length >= k first, but the function has no guard)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.MinHashSig.compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val salt = "1:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // per-thread digest: whole-stage codegen calls compute once per row,
  // and a fresh MessageDigest allocation per row is pure hot-path
  // garbage (digest() leaves the instance reset for reuse)
  private val mdTl: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Digest word i (0..3) as an unsigned 32-bit long — equals
    * conv(substr(md5hex, 1+8i, 8), 16, 10). */
  private def word(d: Array[Byte], i: Int): Long =
    (((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
      ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL))

  def compute(arr: ArrayData): ArrayData = {
    val md = mdTl.get()
    md.reset()
    val mins = Array.fill(8)(Long.MaxValue)
    val n = arr.numElements()
    var hashed = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 } // skip null elements (type allows them)
      else {
      hashed += 1
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
    }
    if (hashed == 0) null
    else new GenericArrayData(mins.map(Long.box(_).asInstanceOf[Any]))
  }
}
