package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** [[Stats.withHoeffdingPpm]] — the exact-integer sweep confidence
  * bounds: the half-width must equal the TRUE rational ceil-sqrt
  * (BigInt replay, no floats), intervals must bracket the point
  * estimate and be monotone in trials, and the degenerate rows
  * (trials = 0, phat at the boundaries) must clamp correctly. */
class HoeffdingCiSpec extends SparkSpec {
  import spark.implicits._

  private val A = BigInt(1000L) * Stats.HoeffdingLn40NanoCeil

  /** Smallest s >= 0 with s²·2t >= A — the exact rational ceil-sqrt
    * the operator promises, replayed independently in BigInt. */
  private def exactHw(trials: Long): Long = {
    require(trials > 0)
    var lo = BigInt(0); var hi = BigInt(2000000)
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (mid * mid * 2 * trials >= A) hi = mid else lo = mid + 1
    }
    lo.toLong
  }

  private def run(rows: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long, Long)] =
    Stats.withHoeffdingPpm(
        rows.toDF("hits", "trials")
          .withColumn("phat_ppm",
            expr("CASE WHEN trials > 0 THEN 1000000 * hits div trials ELSE 0 END")),
        "phat_ppm", "trials", "lo_ppm", "hi_ppm")
      .select("hits", "trials", "phat_ppm", "lo_ppm", "hi_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("half-width equals the exact BigInt ceil-sqrt across trial scales; intervals bracket and clamp") {
    val rows = Seq[(Long, Long)]((0L, 0L), (0L, 1L), (1L, 1L), (50L, 100L),
      (999L, 1000L), (1L, 1000L), (123456L, 1000000L), (0L, 37L),
      (5L, 7L), (999999999L, 1000000000L))
    val got = run(rows)
    // trials = 0: the vacuous interval
    assert(got((0L, 0L)) == ((0L, 0L, 1000000L)), got((0L, 0L)).toString)
    rows.filter(_._2 > 0).foreach { case (hits, trials) =>
      val (phat, lo, hi) = got((hits, trials))
      assert(phat == 1000000L * hits / trials)
      val hw = exactHw(trials)
      assert(lo == math.max(0L, phat - hw),
        s"lo mismatch at trials=$trials: $lo vs phat=$phat hw=$hw")
      assert(hi == math.min(1000000L, phat + hw + 1),
        s"hi mismatch at trials=$trials: $hi vs phat=$phat hw=$hw")
      assert(lo <= phat && phat <= hi)
    }
  }

  test("interval narrows monotonically as trials grow; known magnitudes") {
    val hws = Seq(1L, 10L, 100L, 10000L, 1000000L, 100000000L).map(exactHw)
    assert(hws == hws.sorted.reverse && hws.distinct == hws,
      s"half-width must strictly shrink with trials: $hws")
    // spot magnitudes: sqrt(ln40/2) ~ 1.358 -> ~1358100 ppm at n=1
    // (clamped in use), ~13582 ppm at n=10000, ~136 ppm at n=1e8
    assert(hws.head > 1000000L && hws(3) < 14000L && hws(3) > 13000L &&
      hws(5) < 140L && hws(5) > 130L, hws.toString)
  }

  test("constant is the ceiling of ln(40)·1e9 (rounding only widens)") {
    val ln40 = math.log(40.0)
    assert(Stats.HoeffdingLn40NanoCeil == math.ceil(ln40 * 1e9).toLong,
      s"${Stats.HoeffdingLn40NanoCeil} vs ${ln40 * 1e9}")
  }
}
