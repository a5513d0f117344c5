package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the committed scaling-curve artifact (SCALE_CURVE.json,
  * written by graft.tools.ScaleCurve): every recorded query's growth
  * exponent across the top test decade (sf0.01 → sf0.1, a 10× data
  * step) must stay ≤ 1.3. Linear work measures ≈ 1 (less, once fixed
  * overhead dilutes the small run); an accidental all-pairs measures
  * toward 2 — this is the mechanical tripwire that catches it rounds
  * before a production scale-up would. The spec reads the artifact
  * rather than re-measuring: the curve is re-recorded by the tool
  * when the expensive set changes, and gating the committed numbers
  * keeps `sbt test` deterministic and fast. */
class ScaleCurveSpec extends AnyFunSuite {
  private val MaxAlpha = 1.3

  test("scaling-curve artifact: present, ≥10 queries, every top-decade exponent ≤ 1.3") {
    val p = java.nio.file.Paths.get("SCALE_CURVE.json")
    assert(java.nio.file.Files.exists(p),
      "SCALE_CURVE.json missing — run `runMain graft.tools.ScaleCurve` and commit the artifact")
    val text = java.nio.file.Files.readString(p)
    val row = """"(q[0-9]+[a-z0-9_]*)":\s*\{[^}]*"alpha_hi":\s*(-?[0-9.]+)""".r
    val alphas = row.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toList
    assert(alphas.size >= 10,
      s"the curve must cover the 10 most expensive queries; found ${alphas.size}")
    val over = alphas.filter(_._2 > MaxAlpha)
    assert(over.isEmpty,
      "super-linear growth exponent(s) — an accidental all-pairs or corpus-squared " +
        s"state is hiding in: ${over.map { case (q, a) => f"$q=$a%.2f" }.mkString(", ")}")
  }
}
