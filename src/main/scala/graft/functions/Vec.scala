package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] columns, built from Spark's codegen'd
  * higher-order functions (zip_with / aggregate) — no UDFs.
  *
  * Exactness contract: each element product is computed in double (bit
  * identical on both engines), scaled by 1e13 and floored to a BIGINT;
  * the sum is exact integer arithmetic, so it is order-insensitive and
  * Spark and DuckDB produce bit-identical cosines no matter how they
  * parallelize the reduction. (Decimal accumulation would be the obvious
  * alternative, but Spark's decimal-addition precision widening can't
  * keep a lambda accumulator's type fixed.)
  */
object Vec {

  /** Exact fixed-point dot product of two float-array columns (SQL expr). */
  private def dotDecExpr(a: String, b: String): String =
    s"""CAST(aggregate(
       |  zip_with($a, $b, (x, y) ->
       |    CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e13) AS BIGINT)),
       |  CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)""".stripMargin

  def dot(a: String, b: String): Column = expr(dotDecExpr(a, b))

  /** Cross-engine-exact cosine similarity. Prefer [[cosineFromParts]]
    * with precomputed norms in joins — higher-order array functions run
    * interpreted, so recomputing both norms per pair costs 3× the lambda
    * work and re-walks each vector O(candidates) times. */
  def cosine(a: String, b: String): Column =
    expr(s"${dotDecExpr(a, b)} / (sqrt(${dotDecExpr(a, a)}) * sqrt(${dotDecExpr(b, b)}))")

  /** Self dot product (squared norm), for precomputing per vector. */
  def norm2(a: String): Column = expr(dotDecExpr(a, a))

  /** Native codegen twins (graft.plans.FixedPointDot) — bit-identical to
    * [[dot]]/[[norm2]]. Caller must have run
    * GraftExtensions.ensureRegistered(spark) on the session. */
  def dotN(a: String, b: String): Column = expr(s"CAST(vec_dot_fixed($a, $b) AS DOUBLE)")
  def norm2N(a: String): Column = expr(s"CAST(vec_dot_fixed($a, $a) AS DOUBLE)")

  /** cosine from a pair dot and two precomputed squared norms — exactly
    * equal to [[cosine]] because all three parts are exact fixed-point. */
  def cosineFromParts(dotCol: Column, na: Column, nb: Column): Column =
    dotCol / (sqrt(na) * sqrt(nb))

  /** Sign-signature LSH bucket over the first `dims` coordinates
    * (axis-aligned random-hyperplane hashing). */
  def signBucket(c: String, dims: Int): Column =
    expr((1 to dims).map(i => s"CASE WHEN element_at($c, $i) >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")"))

  /** DuckDB twin of [[signBucket]]. */
  def signBucketSqlDuck(c: String, dims: Int): String =
    (1 to dims).map(i => s"CASE WHEN $c[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** One band of a banded sign-LSH signature: the sign bits of
    * coordinates offset+1 .. offset+len. try_element_at: a band layout
    * wider than the embedding dimension must degrade to '0' bits (like
    * the DuckDB twin's out-of-range NULL), not throw under ANSI. */
  def signBand(c: String, offset: Int, len: Int): Column =
    expr((1 to len).map(i => s"CASE WHEN try_element_at($c, ${offset + i}) >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")"))

  /** DuckDB twin of [[signBand]]. */
  def signBandSqlDuck(c: String, offset: Int, len: Int): String =
    (1 to len).map(i => s"CASE WHEN $c[${offset + i}] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** DuckDB twin of the exact fixed-point dot product, as an aggregate
    * over positionally-unnested element pairs. */
  def dotDecSqlDuck(a: String, b: String): String =
    s"CAST(SUM(CAST(floor(CAST($a AS DOUBLE) * CAST($b AS DOUBLE) * 1e13) AS BIGINT)) AS BIGINT)"
}
