package graft.operators

import graft.expressions.VectorExpressions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]` on disk).
  *
  * Two paths, as a 100 TB engine needs both:
  *  - [[bruteForceTopK]]: exact top-k by cosine — broadcast the (small)
  *    query set against the full corpus; one scan, no shuffle of the
  *    corpus, per-partition partial top-k then a final merge. Correctness
  *    baseline and the right tool when |queries| is small.
  *  - [[ivfTopK]]: IVF-style approximate search — corpus assigned to
  *    coarse cells (nearest of `nCells` deterministic centroids), queries
  *    probe only `nProbe` nearest cells. Cell assignment is one linear
  *    pass; the search join hits ~nProbe/nCells of the corpus. At scale
  *    the corpus would be written bucketed/partitioned BY cell so a probe
  *    reads only its partitions (partition pruning on the scan).
  */
object Similarity {

  private def rankWindow = Window.partitionBy("query_id")
    .orderBy(col("cos_r").desc, col("id").asc)

  /** Zero-norm embeddings are excluded BY CONTRACT everywhere cosine is
    * ranked or thresholded: cosine is undefined for them, and the
    * engines disagree on the degenerate value (Spark NULL sorts last in
    * DESC, DuckDB NaN sorts FIRST and compares greater-than-everything)
    * — exclusion is the only cross-engine-stable semantics. Every
    * oracle mirrors it with list_inner_product(v, v) > 0. */
  private[operators] def nonDegenerate(v: Column): Column =
    VectorExpressions.dot(v, v) > 0

  /** Exact top-k cosine neighbors for each query vector.
    * Ranking uses cosine rounded to 6 dp with id as tiebreak, so the
    * result is stable under float accumulation-order differences.
    * Output: (query_id, rank, id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos_r", round(VectorExpressions.cosine(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cosine"))
  }

  /** Assign each vector to its nearest coarse centroid. Centroids are the
    * vectors whose id is in `centroidIds` (deterministic coarse
    * quantizer — a k-means fit would slot in identically). */
  def cellAssignments(corpus: DataFrame, vecCol: String, idCol: String,
                      centroidIds: Seq[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val cents = c.filter(col("id").isInCollection(centroidIds))
      .select(col("id").as("cell"), col("v").as("cv"))
    c.crossJoin(broadcast(cents)) // every corpus row x small centroid set
      .withColumn("d", round(VectorExpressions.cosine(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("d").desc, col("cell").asc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cell"))
  }

  /** IVF approximate top-k: probe the `nProbe` best cells per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              centroidIds: Seq[Long], nProbe: Int = 2): DataFrame = {
    val assigned = cellAssignments(corpus, vecCol, idCol, centroidIds)
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    // centroids come straight from the corpus, NOT from the assignment
    // output: a centroid whose rounded self-similarity ties another
    // centroid can be ASSIGNED to the other's cell, which would drop a
    // probe cell and silently diverge from the oracle (and re-running
    // cellAssignments here would recompute the corpus-x-centroid join).
    val cents = corpus
      .select(col(idCol).as("qcell"), toDoubleArray(col(vecCol)).as("cv"))
      .filter(col("qcell").isInCollection(centroidIds) && nonDegenerate(col("cv")))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("d", round(VectorExpressions.cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d").desc, col("qcell").asc)))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qcell").as("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_r", round(VectorExpressions.cosine(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cosine"))
  }

  /** Product-quantization encode — the memory-scale path for ANN
    * (IVF-PQ's second half): each vector compresses to `m` codebook
    * indices plus a reconstruction error. The codebook rows are the
    * corpus vectors named by `centroidIds` in id order (the same
    * deterministic stand-in contract as [[cellAssignments]]'s coarse
    * quantizer — a trained k-means codebook slots in identically),
    * collected driver-side (bounded by the quantizer-size contract,
    * like a broadcast dim) so encoding is ONE compiled map-only pass —
    * no join, no shuffle, at any corpus size. Degenerate (zero-norm)
    * vectors are excluded, as everywhere in the cosine operators. */
  def pqEncode(corpus: DataFrame, vecCol: String, idCol: String,
               m: Int, centroidIds: Seq[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val codebook: Seq[Seq[Double]] = c
      .filter(col("id").isInCollection(centroidIds))
      .orderBy(col("id"))
      .collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    val st = graft.expressions.VectorExpressions.pqEncode(col("v"), codebook, m)
    c.select(col("id"), st.as("st"))
      .filter(col("st").isNotNull) // width-mismatched vectors drop, not NPE
      .select(col("id"), col("st.codes").as("codes"),
        round(col("st.err"), 6).as("recon_err"))
  }

  /** Random-hyperplane LSH bucket key (8-bit sketch by default): the
    * scale path for near-dup joins — only same-bucket pairs compared. */
  def lshBuckets(df: DataFrame, vecCol: String, idCol: String,
                 nBits: Int = 8, dim: Int = 64): DataFrame =
    df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
      .withColumn("bucket", concat_ws("",
        (0 until nBits).map(s => hyperplaneBit(col("v"), s, dim).cast(StringType)): _*))
}
