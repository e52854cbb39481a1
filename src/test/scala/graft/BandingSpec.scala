package graft

import graft.operators.Dedup

/** LSH banding auto-tuning ([[Dedup.chooseBanding]]): the S-curve
  * inflection (1/b)^(1/r) must land nearest the target threshold, high
  * thresholds must get long bands (precision) and low thresholds many
  * short bands (recall), and the auto entry point must equal the
  * explicit one. */
class BandingSpec extends SparkSpec {
  import spark.implicits._

  test("divisor pair with the nearest S-curve inflection wins") {
    // k=16 inflections: b=1 -> 1.0, b=2 -> .917, b=4 -> .707,
    // b=8 -> .354, b=16 -> .0625
    assert(Dedup.chooseBanding(16, 0.9) === ((2, 8)))
    assert(Dedup.chooseBanding(16, 0.7) === ((4, 4)))
    assert(Dedup.chooseBanding(16, 0.35) === ((8, 2)))
    assert(Dedup.chooseBanding(16, 0.1) === ((16, 1)))
  }

  test("bands are monotone non-increasing in the threshold") {
    val ts = Seq(0.05, 0.2, 0.4, 0.6, 0.8, 0.95)
    val bands = ts.map(Dedup.chooseBanding(16, _)._1)
    assert(bands === bands.sorted.reverse, s"$ts -> $bands")
    bands.zip(ts).foreach { case (b, t) =>
      assert(16 % b === 0, s"b=$b must divide k at t=$t")
    }
  }

  test("minhashPairsAuto == minhashPairs at the chosen banding") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (3L, "a completely different document about spark physical planning"),
      (4L, "a completely different document about spark logical planning")
    ).toDF("doc_id", "text")
    val (b, _) = Dedup.chooseBanding(16, 0.5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(canon(Dedup.minhashPairsAuto(docs, "text", "doc_id",
        n = 3, k = 16, threshold = 0.5)) ===
      canon(Dedup.minhashPairs(docs, "text", "doc_id",
        n = 3, k = 16, bands = b, threshold = 0.5)))
  }
}
