package graft

import graft.operators.ExactLn
import org.scalatest.funsuite.AnyFunSuite

/** [[ExactLn.lnNanoFloor]] — the certified fixed-point ln that makes
  * every literal-model fit bit-identical across hosts (VERDICT r14
  * next-#3). Pins: known constants, the ±1 nano-nat envelope against
  * this JVM's Math.log over wide rational sweeps (with near-total
  * exact agreement — Math.log is within ~1 ulp, so the two can only
  * split AT a flooring boundary), argument-reduction edges (exact
  * powers of two, p/q and q/p), and big-integer inputs. */
class ExactLnSpec extends AnyFunSuite {

  private def jvm(p: Long, q: Long): Long =
    math.floor(math.log(p.toDouble / q.toDouble) * 1e9 + 0.5).toLong

  test("known constants") {
    assert(ExactLn.lnNanoFloor(1L, 1L) === 0L)
    // ln 2 = 0.69314718055994530941…; pre = 693147181.0599… -> 693147181
    assert(ExactLn.lnNanoFloor(2L, 1L) === 693147181L)
    // ln 10 = 2.30258509299404568…; pre = 2302585093.494… -> 2302585093
    assert(ExactLn.lnNanoFloor(10L, 1L) === 2302585093L)
    // ln(1/2): pre = -693147180.0599… -> -693147181
    assert(ExactLn.lnNanoFloor(1L, 2L) === -693147181L)
    // ln 0.4 (the stupid-backoff constant) = -0.91629073187415506518…
    assert(ExactLn.lnNanoFloor(2L, 5L) === -916290732L)
  }

  test("exact powers of two reduce to e*ln2 (atanh kernel sees z=0)") {
    for (e <- 1 to 40) {
      val p = 1L << e
      assert(ExactLn.lnNanoFloor(p, 1L) === jvm(p, 1L), s"2^$e")
      assert(ExactLn.lnNanoFloor(1L, p) === jvm(1L, p), s"2^-$e")
    }
  }

  test("agrees with Math.log within 1 nano-nat over wide rational sweeps, almost always exactly") {
    val ps = (1L to 400L) ++ Seq(999L, 1000L, 1001L, 65537L, 1000003L,
      (1L << 40) + 7L, (1L << 52) + 1L)
    var n = 0
    var exact = 0
    for (p <- ps; q <- Seq(1L, 2L, 3L, 7L, 20L, 300L, 99991L, 1L << 30)) {
      val a = ExactLn.lnNanoFloor(p, q)
      val b = jvm(p, q)
      assert(math.abs(a - b) <= 1L, s"ln($p/$q): exact $a vs jvm $b")
      n += 1
      if (a == b) exact += 1
    }
    // Math.log errs under an ulp; a split needs a pre-floor value
    // within that of a boundary — essentially never over ~3k samples
    assert(exact >= n - 3, s"$exact of $n exact")
  }

  test("the fit families' rational shapes: NB shares, smoothed ratios, BM25 idf") {
    // priors n/total, grid (c+1)/(ctot+V), idf (2n+2)/(2df+1)
    for ((p, q) <- Seq((3L, 9L), (1L, 20L), (7L, 307L), (2L, 2L),
        (2002L, 41L), (120000L, 3L), (1L, 1000000L)))
      assert(ExactLn.lnNanoFloor(p, q) === jvm(p, q), s"$p/$q")
  }

  test("BigInt inputs past the Long mantissa") {
    val p = BigInt(2).pow(80) + 12345
    val q = BigInt(3).pow(40) - 1
    val got = ExactLn.lnNanoFloor(p, q)
    val approx = (math.log(p.doubleValue) - math.log(q.doubleValue)) * 1e9
    assert(math.abs(got - approx) < 1000.0, s"$got vs ~$approx")
  }

  test("positive-rational contract is loud") {
    intercept[IllegalArgumentException](ExactLn.lnNanoFloor(0L, 3L))
    intercept[IllegalArgumentException](ExactLn.lnNanoFloor(3L, -1L))
  }
}
