package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Row-local kernel of [[SignBandsLong]]: banded random-hyperplane
  * sign LSH over an integer vector (the SimHash construction of
  * Charikar '02, banded like MinHash-LSH). Hyperplane p's weight on
  * dimension d is ±1 from the FIRST hex char of md5("pl:p:d")
  * (≥ '8' → −1) — the suite-wide deterministic-hash rule, so the
  * planes are a pure function of (p, d) and both engines derive the
  * identical matrix. Bit j of band B is set when hyperplane
  * p = B·bits + j has Σ w(p,d)·vec(d) ≥ 0 (sign(0) = +, fixed on both
  * engines). Two vectors at cosine t collide on one bit with
  * probability 1 − θ/π (θ = arccos t), so a b-bit band collides at
  * (1 − θ/π)^b and recall across B bands is 1 − (1 − p^b)^B — the
  * banding trade every LSH operator in this repo prices.
  *
  * The weight matrix is built once per (planes, dim) shape and cached
  * JVM-wide (planes×dim longs — a few KB); the per-row work is
  * bands·bits integer dot products in one tight compiled loop. */
private[graft] object SignBands {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()

  /** ±1 hyperplane weights, flattened row-major: w(p·dim + d). */
  def weights(planes: Int, dim: Int): Array[Long] =
    cache.computeIfAbsent((planes, dim), { key: (Int, Int) =>
      val (np, nd) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Long](np * nd)
      var p = 0
      while (p < np) {
        var d = 0
        while (d < nd) {
          val h = md.digest(
            s"pl:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.reset()
          // first hex char = high nibble of byte 0; '8'-'f' ⟺ nibble ≥ 8
          w(p * nd + d) = if (((h(0) >> 4) & 0xf) >= 8) -1L else 1L
          d += 1
        }
        p += 1
      }
      w
    })

  def keys(vec: ArrayData, bands: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    val w = weights(bands * bits, dim)
    val out = new Array[Long](bands)
    val planes = bands * bits
    var p = 0
    var base = 0
    while (p < planes) {
      var dot = 0L
      var d = 0
      while (d < dim) {
        dot += w(base + d) * vec.getLong(d)
        d += 1
      }
      if (dot >= 0L) out(p / bits) |= 1L << (p % bits)
      p += 1
      base += dim
    }
    new GenericArrayData(out)
  }
}

/** Native `sign_bands_long(vec, bands, bits)`: array&lt;bigint&gt; of
  * `bands` LSH band keys for an integer vector — the candidate
  * generator of the derived-vector near-dup (q283). One codegen-resident
  * call per row (the feat_hash_vec discipline): banding a 100 TB corpus
  * is a pure map with zero shuffle, and the only shuffles downstream
  * are the (band, key) frequency aggregate and the capped equi-join.
  * `bands` and `bits` must be foldable positive ints, bits ≤ 62 (the
  * key must fit a long). */
case class SignBandsLong(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        (second.eval(), third.eval()) match {
          case (b: java.lang.Integer, w: java.lang.Integer)
              if b > 0 && w > 0 && w <= 62 => TypeCheckResult.TypeCheckSuccess
          case (b, w) => TypeCheckResult.TypeCheckFailure(
            s"sign_bands_long: bands must be a positive int literal and " +
              s"bits a 1..62 int literal, got ($b, $w)")
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sign_bands_long expects (array<bigint>, int literal, int literal), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  private lazy val bands: Int = second.eval().asInstanceOf[java.lang.Integer].intValue()
  private lazy val bits: Int = third.eval().asInstanceOf[java.lang.Integer].intValue()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bands_long"

  override protected def nullSafeEval(v: Any, b: Any, w: Any): Any =
    SignBands.keys(v.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, _, _) =>
      s"${ev.value} = graft.plans.SignBands.keys($x, $bands, $bits);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
