package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Dedup.editDistancePairs]] — the blocked (q-gram prefix) edit-distance
  * join must equal the naive all-pairs join on every fixture, including
  * the short-string and short×long border cases the gram path cannot see,
  * and must never plan a cartesian product on the gram path. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Naive quadratic reference: exact Levenshtein over all id1<id2. */
  private def naive(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").cast("long").as("id1"), col("s").as("s1"))
    val b = df.select(col("id").cast("long").as("id2"), col("s").as("s2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .filter(levenshtein(col("s1"), col("s2")) <= k)
      .select(col("id1"), col("id2"),
        levenshtein(col("s1"), col("s2")).cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def blocked(df: DataFrame, k: Int): Set[(Long, Long, Long)] =
    Dedup.editDistancePairs(df, "s", "id", k, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("blocked == naive on typos, exact dups, shorts, and the short-long border") {
    val names = Seq(
      1L  -> "Customer#000000001",
      2L  -> "Customer#000000002", // 1 edit from id 1
      3L  -> "Customer#000001002", // 1 edit from id 2, 2 from id 1
      4L  -> "Custoner#000000001", // 1 edit from id 1
      5L  -> "totally different",
      6L  -> "ab",                 // short
      7L  -> "ac",                 // short, 1 edit from id 6
      8L  -> "abcd",               // short at k=1 (minSafeLen 6)
      9L  -> "abce",               // short, 1 edit from id 8
      10L -> "Customer#000000001", // exact dup of id 1 (dist 0)
      11L -> "abcde",              // len 5: short side of the border
      12L -> "abcdef",             // len 6: LONG side, 1 edit from id 11
      13L -> "abcdeg"              // long, 1 edit from id 12
    ).toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = blocked(names, k)
      val want = naive(names, k)
      assert(got === want, s"k=$k: blocked ${got.size} vs naive ${want.size}")
      // the border pair (11,12) is the case a shorts-only block misses
      if (k == 1) assert(got.contains((11L, 12L, 1L)))
    }
  }

  test("blocked == naive on a seeded random mutation corpus") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length); s.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
      case _ if s.length > 1 => // delete
        val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    // 60 bases (lengths 2..14 straddle the short border), each with a
    // 1-mutation and a 2-mutation variant — dense in true matches
    val rows = (0 until 60).flatMap { i =>
      val base = randStr(2 + rnd.nextInt(13))
      val m1 = mutate(base)
      Seq((i * 3 + 0).toLong -> base, (i * 3 + 1).toLong -> m1,
          (i * 3 + 2).toLong -> mutate(m1))
    }
    val df = rows.toDF("id", "s")
    for (k <- Seq(1, 2))
      assert(blocked(df, k) === naive(df, k), s"k=$k mismatch")
  }

  // ---- auto-q: the measured pre-pass ([[Dedup.chooseEditJoinQ]]) ----

  private def randCorpus(alpha: String, len: Int, n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => i.toLong ->
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      .toDF("id", "s")
  }

  test("chooseEditJoinQ escalates on a saturated alphabet, stays small on a high-entropy one") {
    // 4-letter alphabet, len 12: only 16 2-grams EXIST, so q=2 buckets
    // saturate (mean ~n·10/16); 64 3-grams keep q=3 bounded
    val lowEntropy = randCorpus("abcd", 12, 80, seed = 7)
    assert(Dedup.chooseEditJoinQ(lowEntropy, "s", maxDist = 1,
      candidates = Seq(2, 3), sampleMod = 1, maxMeanBucket = 16.0) === 3)
    // 26-letter alphabet: 2-gram space is big enough at this n
    val highEntropy = randCorpus("abcdefghijklmnopqrstuvwxyz", 15, 80, seed = 7)
    assert(Dedup.chooseEditJoinQ(highEntropy, "s", maxDist = 1,
      candidates = Seq(2, 3), sampleMod = 1, maxMeanBucket = 16.0) === 2)
  }

  test("chooseEditJoinQ stays at the smallest width when the gram space is format-capped") {
    // Customer#-style names: fixed prefix + zero-padded digits — the
    // distinct-gram count barely grows with q (the d15 bench corpus
    // measured 364/421/424 at q=3/4/5), so escalation buys no bucket
    // reduction while every string pays more prefix rows; the decision
    // must stay at the smallest covering width
    val names = (1 to 200).map(i => i.toLong -> f"Customer#$i%09d").toDF("id", "s")
    assert(Dedup.chooseEditJoinQ(names, "s", maxDist = 1,
      candidates = Seq(3, 4, 5), sampleMod = 1, maxMeanBucket = 1.0) === 3)
  }

  test("chooseEditJoinQ never picks a width that strands the corpus in the short block") {
    // len-8 digit strings: q=6 would put EVERY string below its
    // minSafeLen of 12 — however saturated q=3 is, 6 must be skipped
    val shortDigits = randCorpus("0123456789", 8, 60, seed = 11)
    assert(Dedup.chooseEditJoinQ(shortDigits, "s", maxDist = 1,
      candidates = Seq(3, 6), sampleMod = 1, maxMeanBucket = 1.0) === 3)
  }

  test("editDistancePairsAuto == naive (the chosen q is inside the lossless contract)") {
    val lowEntropy = randCorpus("abcd", 12, 40, seed = 13)
    val got = Dedup.editDistancePairsAuto(lowEntropy, "s", "id", maxDist = 2,
        candidates = Seq(2, 3), sampleMod = 1, maxMeanBucket = 16.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive(lowEntropy, 2))
  }

  test("no cartesian or nested-loop join anywhere — short block included") {
    val mixed = ((1 to 40).map(i => i.toLong -> f"Customer#$i%09d") ++
      Seq(100L -> "ab", 101L -> "abcde", 102L -> "abcdef")).toDF("id", "s")
    val plan = Dedup.editDistancePairs(mixed, "s", "id", 1, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
