package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** MMR diverse rerank ([[Similarity.mmrRerank]], λ = 1/2): the greedy
  * selection must prefer a diverse moderately-relevant candidate over
  * a near-duplicate of what is already selected — the property plain
  * top-k lacks — with exact integer scores and deterministic
  * tie-breaks. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // 3-D fixture: c1 is the clear top hit; c2 is c1's near-duplicate
  // (slightly lower relevance, cosine ~1 to c1); c3 points the other
  // way in the second dimension (lower relevance, but diverse).
  private val corpus = Seq(
    (1L, Seq(0.9f, 0.436f, 0.0f)),
    (2L, Seq(0.9f, 0.4359f, 0.01f)),
    (3L, Seq(0.88f, -0.47f, 0.0f)),
    (4L, Seq(0.1f, 0.0f, 0.99f))
  ).toDF("vec_id", "embedding")
  private val queries = Seq((100L, Seq(1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("greedy pick diversifies: the near-duplicate loses to the diverse candidate") {
    val got = Similarity.mmrRerank(corpus, queries, "embedding", "vec_id",
        topN = 4, k = 3)
      .orderBy("query_id", "rank")
      .select("rank", "id").as[(Long, Long)].collect().toSeq
    // plain top-2 would be (c1, c2); MMR takes c3 at rank 2 because
    // score(c2) = rel(c2) - sim(c2,c1) ~ 0.9 - 1.0 < 0 while
    // score(c3) = 0.88 - 0.59 > 0
    assert(got.take(2) === Seq((1L, 1L), (2L, 3L)), got.toString)
    // rank 3 then goes to the orthogonal c4, not the near-dup c2:
    // score(c2) stays ~ -0.1, score(c4) = 0.1 - max(sim) stays higher
    assert(got(2) === ((3L, 4L)), got.toString)
  }

  test("rank 1 is the pure relevance argmax and its score is its relevance") {
    val row = Similarity.mmrRerank(corpus, queries, "embedding", "vec_id",
        topN = 4, k = 1)
      .select("id", "rel_u", "score_u").as[(Long, Long, Long)].head()
    assert(row._1 === 1L)
    assert(row._2 === row._3)
  }

  test("selection is partition-invariant and emits k rows per query") {
    def run(parts: Int) = Similarity.mmrRerank(corpus.repartition(parts),
        queries, "embedding", "vec_id", topN = 4, k = 3)
      .select("query_id", "rank", "id", "score_u")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val a = run(1)
    assert(a.length === 3)
    assert(a === run(5))
  }
}
