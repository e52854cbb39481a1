package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta edit-distance join ([[Dedup.editJoinState]] /
  * [[Dedup.editDistancePairsDelta]]): linking a new batch against the
  * STORED reference state must equal the naive cross quadratic on
  * every fixture — including batch strings whose grams the frozen
  * reference order has never seen, and the short×long border — and
  * must emit cross-population pairs only. */
class EditJoinDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def naiveCross(ref: DataFrame, batch: DataFrame, k: Int)
      : Set[(Long, Long, Long)] = {
    val a = ref.select(col("id").cast("long").as("ref_id"), col("s").as("s1"))
    val b = batch.select(col("id").cast("long").as("batch_id"),
      col("s").as("s2"))
    a.crossJoin(b).filter(levenshtein(col("s1"), col("s2")) <= k)
      .select(col("ref_id"), col("batch_id"),
        levenshtein(col("s1"), col("s2")).cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def delta(ref: DataFrame, batch: DataFrame, k: Int, q: Int)
      : Set[(Long, Long, Long)] = {
    val (ranks, prefix, short) = Dedup.editJoinState(ref, "s", "id", k, q)
    Dedup.editDistancePairsDelta(batch, "s", "id", k, q, ranks, prefix, short)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("delta == naive cross on typos, unseen grams, shorts, and the border") {
    val ref = Seq(
      1L -> "Customer#000000001",
      2L -> "Customer#000000002",
      3L -> "totally different",
      4L -> "abcdefgh",            // the unseen-gram target
      5L -> "ab",                  // truly short
      6L -> "abcde",               // border: short side at k=1
      7L -> "zqzqzqzqzq"
    ).toDF("id", "s")
    val batch = Seq(
      101L -> "Customer#000000101", // 2 edits from id 1 (k=2 only)
      102L -> "Customer#000000003", // 1 edit from 1 and from 2
      103L -> "abcdefgX",           // gram fgX/gX? unseen by the state
      104L -> "ac",                 // short, 1 edit from id 5
      105L -> "abcdef",             // LONG side of the border vs id 6
      106L -> "nothing alike here"
    ).toDF("id", "s")
    for (k <- Seq(1, 2); q <- Seq(3, 4)) {
      val got = delta(ref, batch, k, q)
      val want = naiveCross(ref, batch, k)
      assert(got === want, s"k=$k q=$q: delta ${got.size} vs naive ${want.size}")
    }
    // cross-population only: no ref-internal or batch-internal pair ids
    val got = delta(ref, batch, 2, 3)
    assert(got.forall { case (r, b, _) => r <= 7L && b >= 101L })
    // the unseen-gram match is present (frozen order stays lossless)
    assert(got.contains((4L, 103L, 1L)))
    // and the short-long border pair
    assert(delta(ref, batch, 1, 3).contains((6L, 105L, 1L)))
  }

  test("delta == naive cross on a seeded random split corpus") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdef"
    def randStr(n: Int) = (0 until n).map(_ =>
      alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty =>
        val i = rnd.nextInt(s.length); s.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 =>
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
      case _ if s.length > 1 =>
        val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    // reference bases; the batch delivers 1- and 2-mutation variants
    val bases = (0 until 50).map(i =>
      i.toLong -> randStr(2 + rnd.nextInt(13)))
    val batch = bases.flatMap { case (i, s) =>
      Seq((1000 + i * 2) -> mutate(s), (1001 + i * 2) -> mutate(mutate(s)))
    }.map { case (i, s) => (i.toLong, s) }
    val refDf = bases.toDF("id", "s")
    val batchDf = batch.toDF("id", "s")
    for (k <- Seq(1, 2))
      assert(delta(refDf, batchDf, k, 3) === naiveCross(refDf, batchDf, k),
        s"k=$k mismatch")
  }
}
