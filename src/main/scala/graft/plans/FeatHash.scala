package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local kernel of [[FeatHashVec]]: one md5 per whitespace token,
  * hex chars 1-8 → dimension (mod d), hex char 9 → sign (≥ '8' → −1),
  * signed occurrence counts accumulated into a dense long[d] — exactly
  * the q282 SQL formulation (md5(tok || ':f'), same hex slicing), so
  * the expression is bit-identical to the oracle's CTE chain. */
private[graft] object FeatHash {
  def vec(text: UTF8String, d: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](d)
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val h = md.digest((toks(t) + ":f").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      // hex chars 1-8 = bytes 0-3 as an unsigned 32-bit value
      val dim = ((((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16)
        | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % d).toInt
      // hex char 9 = high nibble of byte 4; '8'-'f' ⟺ nibble ≥ 8
      out(dim) += (if (((h(4) >> 4) & 0xf) >= 8) -1L else 1L)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native `feat_hash_vec(text, d)`: the signed feature-hashing text
  * embedder (q282) as ONE codegen-resident call per row — tokenize,
  * hash, and accumulate entirely inside the scan, so deriving vectors
  * from a 100 TB corpus is a pure map with ZERO shuffle (the
  * explode + (doc, dim) re-aggregation formulation this replaces
  * shuffled docs×d partial rows). Also what makes the STREAMING twin
  * stateless: a per-row expression needs no aggregation state, so the
  * embedder runs in append mode with no watermark at all (q288).
  * `d` must be a foldable positive int (it sizes the output array). */
case class FeatHashVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        right.eval() match {
          case n: java.lang.Integer if n > 0 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"feat_hash_vec: d must be a positive int literal, got $other")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"feat_hash_vec expects (string, int literal), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  private lazy val d: Int = right.eval().asInstanceOf[java.lang.Integer].intValue()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "feat_hash_vec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FeatHash.vec(a.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, _) =>
      s"${ev.value} = graft.plans.FeatHash.vec($x, $d);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
