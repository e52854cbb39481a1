package graft.operators

/** EXACT nano-nat logarithm of a RATIONAL — floor(ln(p/q)·1e9 + 0.5)
  * computed with certified error bounds, so the result is identical on
  * every host, JVM, and libm (VERDICT r14 next-#3: t31 went green the
  * round its lone IEEE sqrt became the integer-clamped `IsqrtExpr`;
  * this is the same playbook for the one platform-sensitive op left in
  * the literal-model fits — driver-side `Math.log` in the nano-nat
  * quantization).
  *
  * Every quantized log-prob in the NB / LM / BM25 fit families is the
  * ln of an exact integer ratio (doc-count shares, smoothed token
  * ratios, (2n+2)/(2df+1) idf), so the fit needs nothing more general
  * than ln over positive rationals.
  *
  * Method (public numerics, e.g. AMS/Brent-style fixed-point
  * elementary functions):
  *  - reduce p/q = 2^e · m with m ∈ (1/2, 2) via bit lengths, so
  *    z = (m−1)/(m+1) ∈ [−1/3, 1/3];
  *  - atanh series in BigInt fixed point at scale 10^S: each term
  *    zⁿ/(n·zᵈⁿ) is computed from the EXACT rational power and
  *    truncated toward zero, so per-term error ≤ 1 unit and the
  *    stopping tail (geometric, ratio z² ≤ 1/9) adds < 2 units;
  *  - ln(p/q) = 2·atanh(z) + e·ln 2, with ln 2 = 2·atanh(1/3) from the
  *    same kernel; the total error bound B is tracked in UNITS of
  *    10^-S, not assumed;
  *  - the floor of v·1e9 + 1/2 is decided by integer floor-division of
  *    the fixed-point value, and ACCEPTED only when the ±B interval
  *    floors to the same integer — otherwise the scale escalates
  *    (S → 2S). ln of a rational ≠ 1 is irrational, so the pre-floor
  *    value is never exactly on a boundary and escalation terminates.
  *
  * The result is a pure function of (p, q): two fits of the same
  * counts on ANY two hosts produce bit-identical literals, which is
  * the property the literal-model delivery chain needs and a libm can
  * never promise. */
object ExactLn {

  private val G = BigInt(1000000000L) // nano scale

  /** Floor division (b > 0): BigInt `/` truncates toward zero. */
  private def fdiv(a: BigInt, b: BigInt): BigInt = {
    val qr = a /% b
    if (qr._2.signum < 0) qr._1 - 1 else qr._1
  }

  /** (atanh(zn/zd)·10^S truncated, error bound in units). Requires
    * |zn/zd| ≤ 1/3 (the reduction guarantees it). */
  private def atanhFixed(zn: BigInt, zd: BigInt,
                         ten: BigInt): (BigInt, Int) = {
    var num = zn
    var den = zd
    val zn2 = zn * zn
    val zd2 = zd * zd
    var k = 0
    var acc = BigInt(0)
    var go = true
    while (go) {
      val t = (num * ten) / (den * (2 * k + 1)) // truncates toward zero
      if (t.signum == 0) go = false
      else {
        acc += t
        num *= zn2
        den *= zd2
        k += 1
      }
    }
    // per-term truncation ≤ 1 unit (k terms, all the same sign), plus a
    // < 2-unit geometric tail after the first zero term (ratio ≤ 1/9)
    (acc, k + 2)
  }

  // atanh(1/3)·10^S is a constant per scale — cache it (review r15: a
  // vocab-scale fit calls lnNanoFloor thousands of times and nearly
  // every reduced ratio has e != 0)
  private val atanhThirdCache =
    scala.collection.concurrent.TrieMap.empty[Int, (BigInt, Int)]

  /** (ln(p/q)·10^S truncated, error bound in units). */
  private def lnFixed(p: BigInt, q: BigInt, s: Int,
                      ten: BigInt): (BigInt, BigInt) = {
    val e = p.bitLength - q.bitLength
    val (pn, qn) = if (e >= 0) (p, q << e) else (p << -e, q)
    val (a, ba) = atanhFixed(pn - qn, pn + qn, ten)
    if (e == 0) (2 * a, BigInt(2L * ba))
    else {
      val (l2, bl) = atanhThirdCache.getOrElseUpdate(s,
        atanhFixed(BigInt(1), BigInt(3), ten))
      (2 * a + 2 * e * l2,
        BigInt(2L * ba) + 2 * BigInt(e).abs * BigInt(bl))
    }
  }

  /** floor(ln(p/q)·1e9 + 0.5), exact on every host. */
  def lnNanoFloor(p: Long, q: Long): Long =
    lnNanoFloor(BigInt(p), BigInt(q))

  def lnNanoFloor(p: BigInt, q: BigInt): Long = {
    require(p.signum > 0 && q.signum > 0,
      s"lnNanoFloor needs a positive rational, got $p/$q")
    if (p == q) return 0L // ln = 0 exactly; floor(0.5) = 0
    var s = 40
    while (s <= 10240) {
      val ten = BigInt(10).pow(s)
      val (l, b) = lnFixed(p, q, s, ten)
      // floor(v·1e9 + 1/2) = fdiv(2·L·G + 10^S, 2·10^S); certified when
      // the whole ±B interval floors identically
      val n = 2 * l * G + ten
      val d = 2 * ten
      val slack = 2 * b * G
      val lo = fdiv(n - slack, d)
      val hi = fdiv(n + slack, d)
      if (lo == hi) {
        require(lo.isValidLong,
          s"ln($p/$q) nano-nats exceeds Long range")
        return lo.toLong
      }
      s *= 2 // pre-floor value within ~10^(9-S) of a boundary: escalate
    }
    throw new ArithmeticException(
      s"lnNanoFloor($p, $q): no certified floor by scale 10^10240 — " +
        "ln of a rational cannot sit ON a boundary; inputs are corrupt")
  }
}
