package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Derandomized Efraimidis–Spirakis weighted sampling
  * ([[TextAnalysis.weightedSample]]): heavier rows must dominate the
  * sample, the draw must be deterministic and partition-invariant,
  * and non-positive weights must never sample. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("heavier rows dominate the sample") {
    // 200 light rows (w=1) + 100 heavy rows (w=50): a 30-row sample
    // should be mostly heavy — under uniform sampling the expectation
    // would be 10 heavy rows, under E-S weighting ~29
    val rows = (1L to 200L).map(i => (i, 1.0)) ++
      (1001L to 1100L).map(i => (i, 50.0))
    val df = rows.toDF("doc_id", "wt")
    val got = TextAnalysis.weightedSample(df, "doc_id", "wt", k = 30)
      .select("id").as[Long].collect()
    assert(got.length === 30)
    val heavy = got.count(_ >= 1001L)
    assert(heavy >= 25, s"expected heavy-row dominance, got $heavy/30")
  }

  test("deterministic, partition-invariant, ranked 1..k") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble)).toDF("doc_id", "wt")
    def run(parts: Int) = TextAnalysis.weightedSample(
        df.repartition(parts), "doc_id", "wt", k = 20)
      .select("sample_rank", "id", "key_nano")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(1)
    assert(a.map(_._1) === (1L to 20L))
    assert(a === run(13))
  }

  test("non-positive weights never sample; k larger than survivors is fine") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 1.0))
      .toDF("doc_id", "wt")
    val got = TextAnalysis.weightedSample(df, "doc_id", "wt", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }
}
