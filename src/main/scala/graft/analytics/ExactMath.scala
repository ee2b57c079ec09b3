package graft.analytics

/** Overflow-safe exact integer `(a*b) div c` / `(a*b) % c` SQL staging,
  * shared verbatim between the Spark queries and their DuckDB oracles
  * (ADVICE r11: the naive `a*b` product wraps silently in Spark but
  * raises in DuckDB once the corpus passes ~2^43 tokens, so the gate
  * diverges — and the Spark results silently corrupt — at large SF).
  *
  * Schoolbook long division on a 20-bit limb split of `a`
  * (`a = ah*2^20 + al`):
  *
  *   a*b = (ah*b)*2^20 + al*b = (q1*c + r1)*2^20 + al*b
  *   (a*b) div c = q1*2^20 + (r1*2^20 + al*b) div c
  *   (a*b) %   c =           (r1*2^20 + al*b) %   c
  *
  * where q1 = (ah*b) div c, r1 = (ah*b) % c. Every intermediate stays
  * in BIGINT provided `a*b < 2^83` and `b + c < 2^43` (r1 < c and
  * al < 2^20 bound the mixed term by `2^20*(b+c)`): the safe envelope
  * is ~2^40 larger than the naive product's `a*b < 2^63` and covers
  * the 100 TB corpus shapes the callers instantiate (bounds per call
  * site in SCALE.md). Widening the limb split to two levels extends it
  * further if ever needed. All operands must be non-negative.
  */
private[analytics] object ExactMath {

  private val K = "1048576" // 2^20 limb

  private def dvOp(duck: Boolean): String = if (duck) "//" else "div"

  /** The shared mixed term `r1*2^20 + al*b`. */
  private def mixed(a: String, b: String, c: String, duck: Boolean): String = {
    val dv = dvOp(duck)
    s"(((($b) * (($a) $dv $K)) % ($c)) * $K + ($b) * (($a) % $K))"
  }

  /** `floor((a*b)/c)` without ever forming `a*b`. */
  def mulDiv(a: String, b: String, c: String, duck: Boolean): String = {
    val dv = dvOp(duck)
    s"(((($b) * (($a) $dv $K)) $dv ($c)) * $K + ${mixed(a, b, c, duck)} $dv ($c))"
  }

  /** `(a*b) mod c` without ever forming `a*b`. */
  def mulMod(a: String, b: String, c: String, duck: Boolean): String =
    s"(${mixed(a, b, c, duck)} % ($c))"
}
