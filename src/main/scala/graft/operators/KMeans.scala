package graft.operators

import graft.expressions.VectorExpressions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic distributed k-means — the TRAINED coarse quantizer for
  * the IVF cells (e02/e07) and SemDeDup clusters (d13), replacing the
  * id-named stand-in centroids (VERDICT r6 next-#1). Spherical form:
  * assignment is by round-6dp cosine (the exact [[graft.expressions
  * .NearestCellExpr]] contract every consumer already pins), so the fit
  * optimizes the same geometry the cells are used with.
  *
  * Published algorithm, deterministic derandomization:
  *  - init is k-means|| (Bahmani et al. 2012, arXiv:1203.6402): start
  *    from one seed, then `initRounds` rounds of oversampling where
  *    point x is selected with probability min(1, l·d(x,C)/φ) — here the
  *    random draw is replaced by the md5 hash of the point id (uniform,
  *    engine-independent, reproducible), and the final reduction to k
  *    picks the k candidates with the largest attraction weights
  *    (points-assigned count; ties by lowest id) instead of a weighted
  *    k-means++ pass — a deterministic simplification, documented, not
  *    claimed as the paper's reduction step.
  *  - Lloyd's iterations: a FIXED count (no data-dependent convergence
  *    test), each one map-only assignment pass + ONE partial-aggregated
  *    groupBy — the DataFrame-aggregate shape, no RDD loops.
  *
  * Cross-engine determinism (the property that makes e08 hash-checkable
  * and lets a DuckDB oracle replay the whole fit):
  *  - distances/assignments use the shared round-6dp cosine kernel;
  *  - the selection threshold is evaluated in EXACT int64 space:
  *    dis = round((1 − maxcos)·10^6) and the draw h ∈ [0,10^6) satisfy
  *    "h·φ < l·dis·10^6" with φ = Σ dis an exact integer sum — no
  *    float accumulation order anywhere;
  *  - centroid update: per-dimension EXACT int64 sums of elements on a
  *    10^-9 grid (round(v_i·10^9)), then ONE double division per
  *    coordinate: mean_i = double(S_i) / double(n·10^9). Both operands
  *    are exact integers whose double conversions are correctly
  *    rounded, and correctly-rounded division of identical doubles is
  *    identical in both engines — so the means are bit-equal to the
  *    oracle's, with no float accumulation order anywhere. (Means, not
  *    raw sums: the L2 metric below needs centroids in the data's
  *    scale; cosine is scale-invariant either way.)
  *
  * Scale shape: every pass over the corpus is map-only against a
  * driver-literal candidate/centroid set plus one partial-aggregated
  * groupBy (k×(dim+1) longs per partition); driver state is O(k·dim +
  * l·initRounds·dim). At 100 TB the fit runs on a bounded deterministic
  * sample (md5-hash filter — the standard quantizer-training practice;
  * faiss trains IVF cells on ~10^6 vectors), both because a sample is
  * statistically sufficient and because the int64 selection threshold
  * has headroom for ~4·10^6 sampled rows (h·φ < 2^63); an explicit
  * guard in the selection loop (the n·maxDis bound, ANSI-independent —
  * ADVICE r7) fails loudly if that contract is violated, never
  * silently wrapping. Assignment of the FULL corpus to the trained
  * cells stays the zero-shuffle NearestCellExpr pass.
  */
object KMeans {

  /** Trained quantizer: centroid row i is cell id i (0..k-1). Centroid
    * vectors are per-cell MEANS on the deterministic division grid
    * above (cells never updated by any Lloyd round keep their init
    * vector — a raw corpus row). */
  final case class Model(centroids: Seq[Seq[Double]]) {
    def k: Int = centroids.size
    def cellIds: Seq[Long] = centroids.indices.map(_.toLong)
  }

  /** Assignment metric. [[Cosine]] is the spherical form the IVF /
    * SemDeDup cells use (round-6dp cosine DESC — the NearestCellExpr
    * contract). [[L2]] is squared euclidean (round-6dp d² ASC, same
    * ipaa − 2·ipab + ipbb fold as [[graft.expressions.PqEncodeExpr]])
    * — the geometry PQ sub-codebooks must be trained in, because PQ
    * encoding is an L2 argmin. */
  sealed trait Metric { private[operators] def tag: String }
  case object Cosine extends Metric { private[operators] val tag = "cos" }
  case object L2 extends Metric { private[operators] val tag = "l2" }

  /** Fit `k` cells on the (id, vector) relation. `dim` is the embedding
    * width; vectors of any other width are excluded by the degeneracy
    * filter downstream (NearestCellExpr truncates — corpora here are
    * fixed-width). Fails loudly if fewer than `k` candidates emerge
    * (a corpus of near-identical vectors — no meaningful quantizer).
    * `seedTag` namespaces the md5 draws so independent fits (e.g. PQ
    * sub-codebooks per subspace) draw independent pseudo-randomness;
    * the oracle replay must use the identical tag.
    * NOTE for oracle authors: the SQL replay of that failure mode is a
    * SHRUNKEN cent relation (same declared divergence as
    * [[Similarity.collectCodebook]] — fail-loud engine, degrade-silent
    * oracle; comparison is only defined where the contract holds). */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int, dim: Int,
          initRounds: Int = 2, oversample: Int = 32, iters: Int = 3,
          metric: Metric = Cosine, seedTag: String = "km"): Model = {
    require(k >= 1 && initRounds >= 1 && iters >= 0 && oversample >= 1,
      s"bad kmeans params: k=$k initRounds=$initRounds iters=$iters l=$oversample")
    val e = df.select(col(idCol).cast(LongType).as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .filter(Similarity.nonDegenerate(col("v")))
      // the fit drives 2·initRounds + iters + 2 bounded jobs over this
      // relation; materialize once (freed before return)
      .persist()
    try fitOn(e, k, dim, initRounds, oversample, iters, metric, seedTag)
    finally { e.unpersist(false); () }
  }

  private def fitOn(e: DataFrame, k: Int, dim: Int,
                    initRounds: Int, l: Int, iters: Int,
                    metric: Metric, tag: String): Model = {
    // ---- seed: the row with the smallest md5("<tag>|seed|"+id), id asc
    val seedRow = e.orderBy(
        md5Long(concat(lit(s"$tag|seed|"), col("id").cast(StringType))).asc,
        col("id").asc)
      .limit(1).collect()
    require(seedRow.nonEmpty, "kmeans fit on an empty (or all-degenerate) corpus")
    var cands: Vector[(Long, Seq[Double])] =
      Vector((seedRow(0).getLong(0), seedRow(0).getSeq[Double](1).toVector))

    // ---- k-means|| oversampling rounds --------------------------------
    for (r <- 1 to initRounds) {
      val disI = distToSetI(cands, metric)
      // exact-integer selection: h·φ < l·dis·10^6, h = md5(round|id) mod 10^6
      val disStats = e.select(disI.as("disI"))
        .agg(coalesce(sum("disI"), lit(0L)),
          coalesce(max("disI"), lit(0L)), count(lit(1))).head
      val phi = disStats.getLong(0)
      val maxDis = disStats.getLong(1)
      val nRows = disStats.getLong(2)
      // EXPLICIT int64-headroom guard (ADVICE r7: the doc-only contract
      // relied on ANSI mode to fail loudly; with ANSI off the φ sum and
      // the h·φ / l·dis·10^6 products would wrap silently into a wrong
      // but plausible candidate draw). n·maxDis bounds the TRUE φ, so
      // the check holds even if a wrapped sum came back small:
      //   h·φ  <  10^6 · n · maxDis          (selection left side)
      //   l·dis·10^6  <=  l · maxDis · 10^6  (selection right side)
      require(BigInt(nRows) * BigInt(maxDis) * BigInt(1000000) <
          BigInt(Long.MaxValue),
        s"k-means|| int64 selection-threshold overflow: $nRows fit rows × " +
          s"max dissimilarity $maxDis exceeds the ~4e6-sampled-rows " +
          "headroom (h·φ < 2^63) — fit on a bounded deterministic sample " +
          "(the documented 100 TB contract, see the e10 shape)")
      require(BigInt(l) * BigInt(maxDis) * BigInt(1000000) <
          BigInt(Long.MaxValue),
        s"k-means|| selection right side overflows: l=$l × max dis $maxDis × 10^6")
      val h = md5Long(concat(lit(s"$tag|r$r|"), col("id").cast(StringType)))
      val selected = e.withColumn("disI", disI)
        .filter((h % 1000000L) * lit(phi) < lit(l.toLong) * col("disI") * 1000000L)
        .select("id", "v").collect()
      val known = cands.map(_._1).toSet
      cands = cands ++ selected.toVector
        .map(row => (row.getLong(0), row.getSeq[Double](1).toVector))
        .filter(c => !known.contains(c._1)) // dis=0 makes this a no-op; belt+braces
        .sortBy(_._1)
    }
    require(cands.size >= k,
      s"k-means|| produced ${cands.size} candidates for k=$k — " +
        "corpus too small/uniform for this quantizer size")

    // ---- reduce to k: attraction weight = points assigned ------------
    val cs = cands.sortBy(_._1) // NearestCellExpr wants ascending cell ids
    val wRows = e.withColumn("cand", VectorExpressions.nearestCell(
        col("v"), cs.map(_._2), cs.map(_._1), metric.tag))
      .groupBy("cand").count().collect()
    val w = wRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cents: IndexedSeq[Seq[Double]] = cs
      .map { case (id, v) => (id, v, w.getOrElse(id, 0L)) }
      .sortBy { case (id, _, wt) => (-wt, id) }
      .take(k).map(_._2).toIndexedSeq

    // ---- Lloyd's: fixed iterations, one partial-agg groupBy each -----
    val sumCols = (0 until dim).map(i =>
      sum(round(element_at(col("v"), i + 1) * lit(1000000000.0), 0)
        .cast(LongType)).as(s"s$i")) :+ count(lit(1)).as("n")
    for (_ <- 1 to iters) {
      val byCell = e.withColumn("cell", VectorExpressions.nearestCell(
          col("v"), cents, cents.indices.map(_.toLong), metric.tag))
        .groupBy("cell").agg(sumCols.head, sumCols.tail: _*)
        .collect().map(r => r.getLong(0) -> r).toMap
      cents = cents.indices.map { c =>
        byCell.get(c.toLong)
          // mean on the deterministic grid: double(S_i) / double(n·10^9)
          // — both operands exact integers, conversions and the one
          // division correctly rounded in both engines
          .map { r =>
            val n = r.getLong(dim + 1)
            val div = (n * 1000000000L).toDouble
            (0 until dim).map(i => r.getLong(i + 1).toDouble / div): Seq[Double]
          }
          .getOrElse(cents(c)) // empty cell keeps its previous centroid
      }
    }
    Model(cents)
  }

  /** Train a PRODUCT-QUANTIZATION codebook: `m` independent [[L2]]
    * k-means fits (the geometry PQ encoding argmins), one per
    * sub-vector slice, packed into `kCent` FULL-width rows — slice j of
    * packed row c is sub-centroid (j, c). [[graft.expressions
    * .PqEncodeExpr]] argmins each subspace independently against its
    * slice of the codebook rows, so the packed form encodes exactly as
    * per-subspace codebooks would, with zero expression changes (the
    * id-named stand-in contract packed corpus rows the same way).
    * Each sub-fit draws independent pseudo-randomness via its seed tag
    * ("pq0".."pq<m-1>"); sub-slices that are zero-norm/non-finite are
    * excluded from that subspace's TRAINING set (the shared degeneracy
    * contract — encoding still handles them). Cost: m fits, each the
    * bounded-pass shape of [[fit]]. */
  def fitPqCodebook(df: DataFrame, vecCol: String, idCol: String,
                    m: Int, kCent: Int, dim: Int,
                    initRounds: Int = 2, oversample: Int = 32,
                    iters: Int = 3): Seq[Seq[Double]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val e = df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(Similarity.nonDegenerate(col("v")))
    val fits = (0 until m).map { j =>
      val sliced = e.select(col("id"), slice(col("v"), j * sub + 1, sub).as("sv"))
      fit(sliced, "sv", "id", kCent, sub, initRounds, oversample, iters,
        metric = L2, seedTag = s"pq$j")
    }
    (0 until kCent).map(c => fits.flatMap(_.centroids(c)).toVector)
  }

  /** Integer distance to the current candidate set on the 10^-6 grid —
    * the exact int64 the selection threshold and φ are computed in.
    * Cosine: round((1 − max_c round6(cos))·10^6); L2:
    * round(min_c round6(d²)·10^6) with the ipaa − 2·ipab + ipbb fold. */
  private def distToSetI(cands: Vector[(Long, Seq[Double])],
                         metric: Metric) = {
    val dis = metric match {
      case Cosine =>
        val cos = cands.map(c =>
          round(VectorExpressions.cosine(col("v"), typedLit(c._2)), 6))
        lit(1.0) - (if (cos.size == 1) cos.head else greatest(cos: _*))
      case L2 =>
        val vv = VectorExpressions.dot(col("v"), col("v"))
        val d2 = cands.map { c =>
          val cc = c._2.foldLeft(0.0)((a, x) => a + x * x)
          round(vv - lit(2.0) * VectorExpressions.dot(col("v"), typedLit(c._2))
            + lit(cc), 6)
        }
        if (d2.size == 1) d2.head else least(d2: _*)
    }
    round(dis * 1000000, 0).cast(LongType)
  }
}
