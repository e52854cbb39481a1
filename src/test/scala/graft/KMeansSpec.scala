package graft

import graft.operators.{KMeans, Similarity}
import org.apache.spark.sql.functions._

/** Deterministic k-means (e08): the fit must be a pure function of the
  * data — independent of partitioning and repeatable — and its cells
  * must cover the corpus through the shared NearestCellExpr contract. */
class KMeansSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val model =
    KMeans.fit(emb, "embedding", "vec_id", k = 16, dim = 64)

  test("fit is partitioning-independent and repeatable") {
    val again = KMeans.fit(emb.repartition(7, col("vec_id")),
      "embedding", "vec_id", k = 16, dim = 64)
    assert(model.centroids == again.centroids,
      "same corpus, different partitioning -> different centroids")
  }

  test("model shape: k centroids of width dim, integer-valued") {
    assert(model.k == 16)
    assert(model.centroids.forall(_.length == 64))
    // centroid coordinates are exact int64 member-sums on the 1e-9
    // grid (the cross-engine determinism contract) — integral doubles
    assert(model.centroids.flatten.forall(x => x == math.rint(x)))
  }

  test("assignment covers the corpus with cells in 0..k-1") {
    val asg = Similarity.cellAssignmentsTrained(emb, "embedding", "vec_id",
      model.centroids)
    assert(asg.count() == emb.count()) // no degenerate vectors in testdata
    val cells = asg.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < 16))
  }

  test("trained cells balance at least as well as the id-named stand-ins") {
    def maxCell(asg: org.apache.spark.sql.DataFrame): Long =
      asg.groupBy("cell").count().agg(max("count")).head.getLong(0)
    val trained = maxCell(
      Similarity.cellAssignmentsTrained(emb, "embedding", "vec_id", model.centroids))
    val standIn = maxCell(
      Similarity.cellAssignments(emb, "embedding", "vec_id", 0L until 16L))
    // the reason the fit exists (VERDICT r6 next-#1): arbitrary corpus
    // rows as centroids let one attractor cell swallow the corpus
    assert(trained <= standIn,
      s"trained max cell $trained > stand-in max cell $standIn")
  }

  test("fit fails loudly when the corpus cannot yield k candidates") {
    import spark.implicits._
    // 3 distinct vectors can never produce 16 candidates
    val tiny = Seq.tabulate(3)(i => (i.toLong, Seq.tabulate(64)(j =>
      if (j == i) 1.0 else 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(tiny, "embedding", "vec_id", k = 16, dim = 64)
    }
    assert(e.getMessage.contains("candidates"))
  }
}
