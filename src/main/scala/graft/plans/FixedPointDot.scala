package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd fixed-point dot product over two numeric arrays
  * (each side independently array&lt;float&gt; or array&lt;double&gt;).
  *
  * Semantics are EXACTLY the Vec.dot higher-order-function formulation —
  * Σ floor((double)a(i) * (double)b(i) * 1e13) as a long — but compiled
  * into a primitive loop inside WholeStageCodegen instead of interpreted
  * per-element lambda dispatch (ArrayTransform/ArrayAggregate do not
  * codegen). ~10-50× less per-pair overhead in ANN scoring loops while
  * remaining bit-identical to the oracle-checked path.
  *
  * Fixed-dimension contract: both arrays must have the same length.
  * A length mismatch raises (matching the zip_with formulation, which
  * null-pads and nulls the aggregate — silently truncating to the
  * shorter array would diverge from it).
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_fixed expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_fixed"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot_fixed: array length mismatch ($n vs ${y.numElements()})")
    }
    val (ld, rd) = (isDouble(left), isDouble(right))
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += math.floor(xv * yv * 1e13).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (isDouble(left)) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      val getY = if (isDouble(right)) s"$y.getDouble($i)" else s"(double) $y.getFloat($i)"
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot_fixed: array length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor($getX * $getY * 1e13);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd EXACT dot product over two long arrays: Σ a(i)·b(i)
  * as a long — the integer-vector twin of [[FixedPointDot]] for the
  * feature-hashed embeddings (q282/q283), whose elements are exact
  * BIGINT counts already (no fixed-point scaling involved, so the value
  * equals the sparse SUM(a.val*b.val) formulation bit for bit). Same
  * fixed-dimension contract as vec_dot_fixed; same motivation — the
  * interpreted zip_with/aggregate lambda pair costs ~10× more per pair
  * in the 5M-candidate verify loop (measured on q283 at sf0.1). */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot_long: array length mismatch ($n vs ${y.numElements()})")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot_long: array length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
