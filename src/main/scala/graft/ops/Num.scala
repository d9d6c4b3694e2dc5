package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tie-safe rounding for cross-engine value comparison.
  *
  * Plain ROUND(x, s) is NOT portable: for a value whose shortest decimal
  * representation ends in 5 at scale s+1 (common when inputs have fixed
  * decimal precision), Spark rounds the exact binary expansion of the double
  * (e.g. 0.605 -> 0.60499999... -> 0.60) while DuckDB rounds the decimal
  * rendering (0.605 -> 0.61). Nudging the value down by a hair
  * (|x|*1e-12 + 1e-9 — far below any comparison scale, far above double ulp
  * at price magnitudes) moves it off the tie so every engine agrees.
  *
  * The trailing `+ 0.0` normalizes signed zero: the nudge maps an exact 0
  * to -1e-9, which DuckDB's C-style round returns as -0.0 while Spark's
  * BigDecimal round returns +0.0 — different bit patterns, different hash.
  * IEEE 754 guarantees (-0.0) + (+0.0) = +0.0 and x + 0.0 = x for every
  * other x (incl. NaN/Inf), so adding it on BOTH sides is a no-op except
  * for collapsing the zero signs. Verified unfolded by both optimizers.
  */
object Num {
  def cround(c: Column, scale: Int): Column =
    round(c - (abs(c) * lit(1e-12) + lit(1e-9)), scale) + lit(0.0)

  /** SQL rendering of the same expression (DuckDB oracle side). */
  def croundSql(expr: String, scale: Int): String =
    s"(ROUND($expr - (ABS($expr) * 1e-12 + 1e-9), $scale) + 0.0)"

  /** FIR kernel of the truncated adjust=true EMA: weights
    * (1 - 2/(span+1))^j for j < span, built by repeated multiplication.
    * Both the engine (Column literals) and the DuckDB oracle (embedded
    * decimal renderings — Double.toString round-trips exactly) take their
    * weights from HERE, in the same JVM, so the kernels are bit-identical
    * across engines by construction — like the shared croundSql above,
    * the constants are common while the query formulations stay
    * independent. */
  def emaKernel(span: Int): Seq[Double] =
    Seq.iterate(1.0, span)(_ * (1.0 - 2.0 / (span + 1)))
}
