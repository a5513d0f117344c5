package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registers Graft's native expressions.
  *
  * Two entry points: as a `spark.sql.extensions` class
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`) for
  * production sessions, and [[GraftExtensions.ensureRegistered]] for
  * operators that must work on any caller-supplied session (the driver
  * contract passes us its own).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vecDotFixed)
}

object GraftExtensions {
  private val vecDotFixed: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot_fixed"),
    new ExpressionInfo(classOf[FixedPointDot].getName, "vec_dot_fixed"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "vec_dot_fixed",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      FixedPointDot(children(0), children(1))
    })

  /** Idempotently register the native functions on an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(vecDotFixed._1)) {
      reg.registerFunction(vecDotFixed._1, vecDotFixed._2, vecDotFixed._3)
    }
  }
}
