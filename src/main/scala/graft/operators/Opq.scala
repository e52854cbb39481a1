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
}
