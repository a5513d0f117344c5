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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotFixed)
    ext.injectFunction(GraftExtensions.vecDotLong)
    ext.injectFunction(GraftExtensions.featHashVec)
    ext.injectFunction(GraftExtensions.signBandsLong)
    ext.injectFunction(GraftExtensions.shingleSet)
    ext.injectFunction(GraftExtensions.shingleStats)
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.interCount)
  }
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

  private val vecDotLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot_long"),
    new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "vec_dot_long",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      VecDotLong(children(0), children(1))
    })

  private val featHashVec: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("feat_hash_vec"),
    new ExpressionInfo(classOf[FeatHashVec].getName, "feat_hash_vec"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "feat_hash_vec",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      FeatHashVec(children(0), children(1))
    })

  private val signBandsLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sign_bands_long"),
    new ExpressionInfo(classOf[SignBandsLong].getName, "sign_bands_long"),
    (children: Seq[Expression]) => {
      if (children.length != 3) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "sign_bands_long",
            "expectedNum" -> "3 (vec, literal bands, literal bits)",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      SignBandsLong(children(0), children(1), children(2))
    })

  /** Validate the evaluated k of a registered shingle function: these
    * are user-facing SQL surfaces, so a NULL k must not NPE and k < 1
    * must not reach the expression (k = 0 would silently emit
    * empty-string shingles; negative k could throw from substring). */
  private def literalK(fn: String, e: Expression): Int = e.eval() match {
    case null =>
      throw new org.apache.spark.sql.AnalysisException(
        "INVALID_PARAMETER_VALUE.NULL",
        Map("parameter" -> "k", "functionName" -> s"`$fn`"),
        Option.empty[Throwable])
    case n: Number if n.intValue() >= 1 => n.intValue()
    case other =>
      throw new org.apache.spark.sql.AnalysisException(
        "INVALID_PARAMETER_VALUE.INTEGER",
        Map("parameter" -> "k", "functionName" -> s"`$fn`",
          "invalidValue" -> s"$other (k must be an integer >= 1)"),
        Option.empty[Throwable])
  }

  private val shingleSet: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
    (children: Seq[Expression]) => {
      if (children.length != 2 || !children(1).foldable) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "shingle_set",
            "expectedNum" -> "2 (text, literal k)",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      ShingleSet(children(0), literalK("shingle_set", children(1)))
    })

  private val shingleStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_stats"),
    new ExpressionInfo(classOf[ShingleStats].getName, "shingle_stats"),
    (children: Seq[Expression]) => {
      if (children.length != 2 || !children(1).foldable) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "shingle_stats",
            "expectedNum" -> "2 (text, literal k)",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      ShingleStats(children(0), literalK("shingle_stats", children(1)))
    })

  private val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      if (children.length != 1) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "minhash_sig",
            "expectedNum" -> "1 (array<string>)",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      MinHashSig(children(0))
    })

  private val interCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("inter_count"),
    new ExpressionInfo(classOf[InterCount].getName, "inter_count"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "inter_count",
            "expectedNum" -> "2 (array<string>, array<string>)",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      InterCount(children(0), children(1))
    })

  /** Idempotently register the native functions on an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(vecDotFixed, vecDotLong, featHashVec, signBandsLong,
        shingleSet, shingleStats, minhashSig, interCount).foreach { fn =>
      if (!reg.functionExists(fn._1)) {
        reg.registerFunction(fn._1, fn._2, fn._3)
      }
    }
  }
}
