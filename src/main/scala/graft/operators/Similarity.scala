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

  /** Degenerate embeddings are excluded BY CONTRACT everywhere cosine is
    * ranked or thresholded: zero-norm vectors have no defined cosine,
    * and NON-FINITE vectors (an Inf/NaN element, or a norm that
    * overflows to Inf) produce NaN cosines that the engines RANK
    * differently (Spark sorts NaN greatest in DESC windows but
    * NearestCellExpr skips non-finite candidates; DuckDB's NaN compares
    * greater-than-everything) — exclusion is the only
    * cross-engine-stable semantics (ADVICE r6). dot(v,v) is finite iff
    * every element is finite and the norm doesn't overflow, so one
    * kernel covers both conditions; NaN > 0 is TRUE in both engines but
    * NaN < Inf is FALSE, so the upper bound excludes NaN norms too.
    * Every oracle mirrors it with
    * list_inner_product(v, v) > 0 AND list_inner_product(v, v) < 'Infinity'::DOUBLE. */
  def nonDegenerate(v: Column): Column = {
    val n2 = VectorExpressions.dot(v, v)
    n2 > 0 && n2 < Double.PositiveInfinity
  }

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

  /** [[bruteForceTopK]] ranked on the exact-integer cosine key
    * ([[VectorExpressions.intCosKey]] — floor(1e6·|cos|)·sign of the
    * micro-quantized vectors): the hash-gate baseline for
    * [[ivfRecallSweepExact]], with zero float comparisons. NULL keys
    * (quantized-degenerate vectors) are filtered on both engines.
    * Output: (query_id, rank, id, cos_key). */
  def bruteForceTopKExact(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos_r", VectorExpressions.intCosKey(col("v"), col("qv")))
      .filter(col("cos_r").isNotNull)
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cos_key"))
  }

  /** Exact top-k squared-L2 neighbors — the baseline the PQ/ADC family
    * approximates: ADC estimates SQUARED L2 from codes, so judging its
    * recall against exact *cosine* top-k conflates metric mismatch with
    * quantization error (RecallProbe r8). Same broadcast + per-query
    * window shape as [[bruteForceTopK]]; d² is the shared
    * ipaa − 2·ipab + ipbb fold, round-6dp ASC with id tiebreak.
    * Output: (query_id, rank, id, d2). */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame,
                       vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    val d2 = VectorExpressions.dot(col("v"), col("v")) -
      lit(2.0) * VectorExpressions.dot(col("v"), col("qv")) +
      VectorExpressions.dot(col("qv"), col("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2_r").asc, col("id").asc)
    c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("d2_r", round(d2, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("d2_r").as("d2"))
  }

  /** Truncated-dimension coarse search + exact full-dim rerank — the
    * DIMENSION-reduction member of the quantization taxonomy (the other
    * axes already covered: cardinality = IVF cells, sub-space = PQ,
    * range = SQ8/binary). The shape Matryoshka-style embeddings
    * (Kusupati 2022) are trained for, and what faiss composes as a
    * dim-reducing VectorTransform in front of a flat index: score every
    * candidate on only the FIRST `dPrime` of `dim` coordinates (the
    * prefix is a meaningful low-rank embedding, not a random
    * projection), keep a per-query shortlist, then rerank the shortlist
    * with the exact full-dimension cosine.
    *
    * Scale shape: one corpus scan, query set broadcast, no corpus
    * shuffle beyond the per-query window (identical to
    * [[bruteForceTopK]]); the coarse pass does dPrime/dim of the
    * mult-adds and — when the prefix is materialized as its own column
    * in the stored layout, the deployment this operator implies at
    * 100 TB — dPrime/dim of the scanned bytes via parquet column
    * pruning. The exact cosine touches only |queries|×shortlist rows.
    *
    * Degenerate-vector contract: rows are excluded unless BOTH the full
    * vector and its dPrime-prefix are non-degenerate ([[nonDegenerate]])
    * — a zero/non-finite prefix has no defined coarse cosine even when
    * the full vector is fine, and NaN coarse scores rank differently
    * across engines. The oracle mirrors both filters.
    *
    * Ranking is round-6dp cosine DESC with id tiebreak at BOTH stages
    * (shortlist boundary ties are id-deterministic), so the result is
    * stable under float accumulation-order differences, like every
    * ranked cosine in this file.
    *
    * Output: (query_id, rank, id, cosine) — cosine is the exact
    * full-dim score. */
  def truncatedRerankTopK(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int,
                          dPrime: Int, shortlist: Int): DataFrame = {
    require(dPrime > 0, s"dPrime must be positive, got $dPrime")
    require(shortlist >= k, s"shortlist $shortlist smaller than k $k")
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
      .withColumn("vt", slice(col("v"), 1, dPrime))
      .filter(nonDegenerate(col("vt")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
      .withColumn("qvt", slice(col("qv"), 1, dPrime))
      .filter(nonDegenerate(col("qvt")))
    val coarseW = Window.partitionBy("query_id")
      .orderBy(col("coarse_r").desc, col("id").asc)
    c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("coarse_r", round(VectorExpressions.cosine(col("vt"), col("qvt")), 6))
      .withColumn("crank", row_number().over(coarseW))
      .filter(col("crank") <= shortlist)
      .withColumn("cos_r", round(VectorExpressions.cosine(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cosine"))
  }

  /** Assign each vector to its nearest coarse centroid. Centroids are the
    * vectors whose id is in `centroidIds` (deterministic coarse
    * quantizer — a k-means fit would slot in identically).
    *
    * Assignment is ONE compiled map-only call per row against the
    * driver-collected centroid codebook ([[graft.expressions
    * .NearestCellExpr]], same literal-codebook contract as PQ): zero
    * shuffle at any corpus size. The previous cross-join + per-id
    * row_number window shuffled corpus×k rows just to pick each row's
    * argmax — a full-corpus exchange a 100 TB assignment pass cannot
    * afford; the expression preserves its exact semantics
    * (round-6dp cosine DESC, lowest cell id on ties). */
  def cellAssignments(corpus: DataFrame, vecCol: String, idCol: String,
                      centroidIds: Seq[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val ids = centroidIds.distinct.sorted
    val codebook = collectCodebook(c, ids) // rows in id order = ids order
    c.withColumn("cell",
        VectorExpressions.nearestCell(col("v"), codebook, ids))
      .select(col("id"), col("v"), col("cell"))
  }

  /** Trained-quantizer form: the codebook is an explicit centroid list
    * (e.g. a [[KMeans.Model]].centroids fit), cells are its indices
    * 0..k-1. Same zero-shuffle NearestCellExpr pass; the id-named
    * overload above is the stand-in special case where centroids are
    * corpus rows. (Separate name: Seq[Long] and Seq[Seq[Double]] erase
    * to the same JVM signature, so a true overload cannot compile.) */
  def cellAssignmentsTrained(corpus: DataFrame, vecCol: String, idCol: String,
                             codebook: Seq[Seq[Double]]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    c.withColumn("cell", VectorExpressions.nearestCell(
        col("v"), codebook, codebook.indices.map(_.toLong)))
      .select(col("id"), col("v"), col("cell"))
  }

  /** Per-query probe cells: the `nProbe` nearest coarse cells, ranked
    * by the EXACT-INTEGER cosine key ([[VectorExpressions.intCosKey]]
    * over the micro-quantized query and centroid vectors) with
    * lowest-cell tiebreak — the e02/e07 oracles pin these exact
    * semantics, so every consumer must share ONE formulation. r15
    * (VERDICT r14 next-#2): probe ranking was the LAST cross-engine
    * float comparison in the IVF gate family — the only stage
    * exercised at probe ranks 3-8 by no green query — and now ranks on
    * the same integer key the brute-force/candidate rankings adopted
    * in r14; a NULL key (degenerate micro-quantized vector) is
    * filtered on BOTH engines, the established exact-key contract.
    * Centroids come straight from the corpus, NOT from the assignment
    * output: a centroid whose self-similarity key ties another
    * centroid can be ASSIGNED to the other's cell, which would drop a
    * probe cell and silently diverge from the oracle. The query side
    * is the bounded batch, so its window exchange carries |queries|×k
    * rows. */
  private def probeCells(corpus: DataFrame, queries: DataFrame,
                         vecCol: String, idCol: String,
                         centroidIds: Seq[Long], nProbe: Int): DataFrame = {
    val cents = corpus
      .select(col(idCol).as("qcell"), toDoubleArray(col(vecCol)).as("cv"))
      .filter(col("qcell").isInCollection(centroidIds) && nonDegenerate(col("cv")))
    probeCellsOn(cents, queries, vecCol, idCol, nProbe)
  }

  /** Probe ranking against an explicit (qcell, cv) centroid relation —
    * shared by the stand-in path (centroids are corpus rows) and the
    * trained path (centroids are a [[KMeans.Model]] codebook). */
  private def probeCellsOn(cents: DataFrame, queries: DataFrame,
                           vecCol: String, idCol: String,
                           nProbe: Int): DataFrame =
    probeRanked(cents, queries, vecCol, idCol, nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

  /** THE probe ranking — (query_id, qv, cell, prn ≤ maxNp) — the ONE
    * formulation every probe consumer derives from ([[probeCellsOn]],
    * the three tuning sweeps, and the [[ivfProbeTable]] diagnostic
    * gate), so the contract cannot drift between them. */
  private def probeRanked(cents: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String,
                          maxNp: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    q.crossJoin(broadcast(cents))
      .withColumn("d", VectorExpressions.intCosKey(col("qv"), col("cv")))
      .filter(col("d").isNotNull)
      .withColumn("prn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d").desc, col("qcell").asc)))
      .filter(col("prn") <= maxNp)
      .select(col("query_id"), col("qv"), col("qcell").as("cell"), col("prn"))
  }

  /** DIAGNOSTIC GATE (VERDICT r14 next-#1c): the max-width probe
    * relation itself as a checked query — (query_id, prn, cell). The
    * e24/e25/e26 summaries aggregate this stage into a handful of
    * integers; exposing the stage as rows lets a red summary gate be
    * localized to (or past) probe selection by the driver run itself. */
  def ivfProbeTable(corpus: DataFrame, queries: DataFrame,
                    vecCol: String, idCol: String,
                    codebook: Seq[Seq[Double]], maxNp: Int): DataFrame =
    probeRanked(centsOf(corpus.sparkSession, codebook),
        queries, vecCol, idCol, maxNp)
      .select(col("query_id"), col("prn").cast(LongType).as("prn"),
        col("cell"))

  /** The trained-codebook centroid relation: (qcell 0..k-1, cv) built
    * from driver-literal centroid rows — a tiny broadcastable dim. */
  private def centsOf(spark: org.apache.spark.sql.SparkSession,
                      codebook: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    codebook.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("qcell", "cv")
  }

  /** IVF approximate top-k: probe the `nProbe` best cells per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              centroidIds: Seq[Long], nProbe: Int = 2): DataFrame =
    ivfSearch(cellAssignments(corpus, vecCol, idCol, centroidIds),
      probeCells(corpus, queries, vecCol, idCol, centroidIds, nProbe), k)

  /** IVF top-k over a TRAINED coarse quantizer ([[KMeans.Model]]
    * codebook, cells 0..k-1) — same plan shape as [[ivfTopK]]; only the
    * centroid source differs (driver-literal fit instead of id-named
    * corpus rows). */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int,
                     codebook: Seq[Seq[Double]], nProbe: Int = 2): DataFrame =
    ivfSearch(cellAssignmentsTrained(corpus, vecCol, idCol, codebook),
      probeCellsOn(centsOf(corpus.sparkSession, codebook),
        queries, vecCol, idCol, nProbe), k)

  /** IVF top-k over a PRE-ASSIGNED (id, v, cell) relation — the serving
    * path of a MAINTAINED index ([[graft.io.IvfMaintenance]]): upserts
    * were assigned map-only against the frozen codebook when they
    * landed, tombstones already anti-joined, and the assignment lives
    * in storage partitioned BY cell so the probe filter prunes at the
    * scan. Same plan downstream as [[ivfTopKTrained]]; only the
    * assignment source differs. */
  def ivfTopKOnAssigned(assigned: DataFrame, queries: DataFrame,
                        vecCol: String, idCol: String, k: Int,
                        codebook: Seq[Seq[Double]],
                        nProbe: Int = 2): DataFrame =
    ivfSearch(assigned,
      probeCellsOn(centsOf(assigned.sparkSession, codebook),
        queries, vecCol, idCol, nProbe), k)

  private def ivfSearch(assigned: DataFrame, probes: DataFrame,
                        k: Int): DataFrame =
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_r", round(VectorExpressions.cosine(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cosine"))

  /** NPROBE↔RECALL TUNING SWEEP — the cost/recall curve a serving
    * deployment picks its probe width from: for each `nProbes` entry,
    * recall@k of the trained IVF index against the exact brute-force
    * baseline, next to the fraction of the corpus the probe actually
    * scans. ONE summary row per nProbe, every column an exact BIGINT
    * (recall and scanned-fraction in integer ppm via integer division)
    * — no float leaves the already-verified cosine kernels.
    *
    * Efficiency contract: the sweep costs ONE search at max(nProbes),
    * not Σ searches — candidates are scanned once with their cell's
    * probe rank attached, and each narrower nProbe re-ranks the
    * prefix (candidates under n probes ⊂ candidates under max; only
    * the bounded candidate relation is re-windowed). `scanned_ppm`
    * counts every vector in a probed cell (the work the scan does —
    * the query's own vector is excluded only at scoring, as in
    * [[ivfSearch]]). */
  def ivfRecallSweep(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int,
                     codebook: Seq[Seq[Double]],
                     nProbes: Seq[Int]): DataFrame =
    ivfRecallSweepImpl(corpus, queries, vecCol, idCol, k, codebook,
      nProbes, exactKeys = false)

  /** [[ivfRecallSweep]] with the candidate and brute-force RANKINGS on
    * the exact-integer cosine key ([[VectorExpressions.intCosKey]]) —
    * the hash-gate form (VERDICT r13 next-#1b): the two
    * corpus-vs-query rankings whose ~k·maxNp-deep comparison surface a
    * single cross-engine float flip could tip become integer-exact.
    * Since r15 probe selection ranks on the same integer key (VERDICT
    * r14 next-#2), so only cell assignment — the rank-1 stage the
    * e08 gate proves independently — still replays round-6 floats.
    * Spec-pinned equal to the float sweep on the shipped corpus
    * (IvfSpec) — the float path stays the production operator. */
  def ivfRecallSweepExact(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int,
                          codebook: Seq[Seq[Double]],
                          nProbes: Seq[Int]): DataFrame =
    ivfRecallSweepImpl(corpus, queries, vecCol, idCol, k, codebook,
      nProbes, exactKeys = true)

  private def ivfRecallSweepImpl(corpus: DataFrame, queries: DataFrame,
                                 vecCol: String, idCol: String, k: Int,
                                 codebook: Seq[Seq[Double]],
                                 nProbes: Seq[Int],
                                 exactKeys: Boolean): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1) &&
      nProbes.distinct.size == nProbes.size, s"bad nProbes $nProbes")
    val spark = corpus.sparkSession
    val maxNp = nProbes.max
    def scoreOf(a: Column, b: Column): Column =
      if (exactKeys) VectorExpressions.intCosKey(a, b)
      else round(VectorExpressions.cosine(a, b), 6)
    val assigned = cellAssignmentsTrained(corpus, vecCol, idCol, codebook)
      .persist()
    val cents = centsOf(spark, codebook)
    // probe ranking computed ONCE at the widest width, rank kept
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    // probe ranking on the exact-integer key (r15, VERDICT r14
    // next-#2) — THE shared [[probeRanked]] formulation; NULL keys
    // (degenerate micro-quantized vectors) filtered on BOTH engines
    val probes = probeRanked(cents, queries, vecCol, idCol, maxNp)
      .persist()
    // one candidate scan at max width; each candidate tagged with the
    // probe rank of the cell it came from. A NULL exact key means the
    // quantized vector degenerated to zero — filtered on BOTH engines
    // (NULL ordering defaults differ: Spark DESC is nulls-last, DuckDB
    // DESC is nulls-first)
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_r", scoreOf(col("v"), col("qv")))
      .filter(col("cos_r").isNotNull)
      .select(col("query_id"), col("id"), col("cos_r"), col("prn"))
      .persist()
    val bf = (if (exactKeys) bruteForceTopKExact(corpus, queries, vecCol, idCol, k)
              else bruteForceTopK(corpus, queries, vecCol, idCol, k))
      .select(col("query_id"), col("id")).persist()
    val cellSizes = assigned.groupBy("cell")
      .agg(count(lit(1)).as("cell_n"))
    val nq = q.agg(count(lit(1)).as("nq"))
    val nCorpus = assigned.agg(count(lit(1)).as("n_corpus"))
    // recall denominator = the brute-force rows actually available, not
    // k·nq: a corpus with fewer than k non-degenerate neighbors per
    // query would otherwise bias every recall low (ADVICE r13)
    val nBf = bf.agg(count(lit(1)).as("n_bf"))
    // r18: every probe width reads off ONE ranked relation and ONE
    // counting aggregate — the per-np branches each re-windowed and
    // re-joined the same candidate relation. The width-np rank of a
    // candidate is the RUNNING COUNT of rows with prn ≤ np in score
    // order (row_number over the prn ≤ np subset for exactly those
    // rows), so one window pass carries every width; scanned counts
    // batch into one aggregate the same way. Output expressions are
    // untouched (same in-plan arithmetic and types).
    val npSorted = nProbes.sorted
    val kw = Window.partitionBy("query_id")
      .orderBy(col("cos_r").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = npSorted.foldLeft(cand)((df, np) =>
      df.withColumn(s"rank_$np",
        sum(when(col("prn") <= np, 1L).otherwise(0L)).over(kw)))
    val hitsRow = bf.join(ranked, Seq("query_id", "id"))
      .agg(coalesce(sum(when(col("prn") <= npSorted.head &&
          col(s"rank_${npSorted.head}") <= k, 1L).otherwise(0L)), lit(0L))
          .as(s"n_hits_${npSorted.head}"),
        npSorted.tail.map(np => coalesce(sum(when(col("prn") <= np &&
          col(s"rank_$np") <= k, 1L).otherwise(0L)), lit(0L))
          .as(s"n_hits_$np")): _*)
    val scannedRow = probes.join(cellSizes, Seq("cell"))
      .agg(coalesce(sum(when(col("prn") <= npSorted.head, col("cell_n"))
          .otherwise(0L)), lit(0L)).as(s"n_scanned_${npSorted.head}"),
        npSorted.tail.map(np => coalesce(sum(when(col("prn") <= np,
          col("cell_n")).otherwise(0L)), lit(0L))
          .as(s"n_scanned_$np")): _*)
    // ONE materialized stats row — the per-np union branches each
    // reference it, and without the checkpoint every branch would
    // re-run the aggregate subtrees it came from
    val statsRow = hitsRow.crossJoin(scannedRow)
      .crossJoin(nq).crossJoin(nCorpus).crossJoin(nBf)
      .localCheckpoint(false)
    val sweep = npSorted.map { np =>
      statsRow
        .select(col(s"n_hits_$np").as("n_hits"),
          col(s"n_scanned_$np").as("n_scanned"),
          col("nq"), col("n_corpus"), col("n_bf"))
        .select(lit(np.toLong).as("n_probe"),
          col("nq").as("n_queries"), col("n_hits"),
          expr("1000000 * n_hits div n_bf").as("recall_ppm"),
          // DECIMAL(38,0) intermediates: at the corpus scale this
          // operator documents, 1e6·n_scanned and nq·n_corpus exceed
          // 2^63 and the Long form would abort loudly under ANSI
          // (ADVICE r14 — the same fix ivfOperatingSweepExact carries
          // via BigInt; here the expression stays in-plan)
          expr("CAST(1000000 AS DECIMAL(38,0)) * n_scanned div " +
            "(CAST(nq AS DECIMAL(38,0)) * n_corpus)").as("scanned_ppm"))
    }.reduce(_ unionByName _)
    // The summary is |nProbes| rows — materialize it eagerly so the four
    // shared relations can be RELEASED here (a lazy return would pin
    // corpus-sized caches in the CacheManager for the driver's
    // lifetime; every other persist in this codebase is paired with an
    // unpersist). The caller gets a local relation, which is exactly
    // what a bounded tuning table is.
    try spark.createDataFrame(
      spark.sparkContext.parallelize(sweep.collect().toSeq, 1), sweep.schema)
    finally Seq(assigned, probes, cand, bf).foreach(_.unpersist(false))
  }

  /** 2-D OPERATING-SURFACE SWEEP — nProbe × k JOINTLY (the e24 curve
    * widened to the grid a serving deployment actually tunes over:
    * probe width trades scan cost against recall, k trades result
    * depth against it, and the two interact — recall@1 saturates at a
    * narrower probe than recall@10). One row per (n_probe, k) with
    * recall vs the exact baseline, the baseline's actual row count,
    * and the scanned corpus fraction; every column an exact BIGINT on
    * the [[ivfRecallSweepExact]] integer-key contract (zero float
    * compares anywhere in the grid).
    *
    * Efficiency contract — STRICTLY tighter than e24's, not |grid|
    * searches: ONE candidate scan at max(nProbes) (candidates carry
    * their cell's probe rank), ONE brute-force baseline at max(ks)
    * (rank kept), then per probe width a single re-rank window and ONE
    * conditional aggregate producing EVERY k's hit count from the same
    * joined relation — sum(bf_rank<=k AND ivf_rank<=k) per k — so the
    * k axis is free: |nProbes| windows + joins total, exactly e24's
    * count, while the row count multiplies by |ks|. n_bf(k) divides
    * each recall (the ADVICE-r13 denominator, per depth). At 100 TB
    * the candidate relation is the IVF scan bound; everything after it
    * is bounded by nq·max(k). */
  def ivfOperatingSweepExact(corpus: DataFrame, queries: DataFrame,
                             vecCol: String, idCol: String, ks: Seq[Int],
                             codebook: Seq[Seq[Double]],
                             nProbes: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) &&
      ks.distinct.size == ks.size, s"bad ks $ks")
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1) &&
      nProbes.distinct.size == nProbes.size, s"bad nProbes $nProbes")
    val spark = corpus.sparkSession
    val maxNp = nProbes.max
    val kMax = ks.max
    val ksSorted = ks.sorted
    val assigned = cellAssignmentsTrained(corpus, vecCol, idCol, codebook)
      .persist()
    val cents = centsOf(spark, codebook)
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    // probe ranking on the exact-integer key (r15) — THE shared
    // [[probeRanked]] formulation across the family
    val probes = probeRanked(cents, queries, vecCol, idCol, maxNp)
      .persist()
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_r", VectorExpressions.intCosKey(col("v"), col("qv")))
      .filter(col("cos_r").isNotNull)
      .select(col("query_id"), col("id"), col("cos_r"), col("prn"))
      .persist()
    val bf = bruteForceTopKExact(corpus, queries, vecCol, idCol, kMax)
      .select(col("query_id"), col("id"), col("rank").as("bfr"))
      .persist()
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    val nQ = q.count()
    val nCorpus = assigned.count()
    val bfAggs = ksSorted.map(kk =>
      coalesce(sum(when(col("bfr") <= kk, 1L).otherwise(0L)), lit(0L)))
    val nBfRow = bf.agg(bfAggs.head, bfAggs.tail: _*).head
    try {
      // r18: ONE window pass and ONE aggregate for the whole grid —
      // the width-np rank of a candidate is the RUNNING COUNT of rows
      // with prn ≤ np in score order (row_number over the prn ≤ np
      // subset for exactly those rows), so every (np, k) cell reads
      // off one conditional sum instead of |nProbes| windows and
      // 2·|nProbes| jobs; scanned counts batch the same way.
      val npSorted = nProbes.sorted
      val kw = Window.partitionBy("query_id")
        .orderBy(col("cos_r").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = npSorted.foldLeft(cand)((df, np) =>
        df.withColumn(s"ivfr_$np",
          sum(when(col("prn") <= np, 1L).otherwise(0L)).over(kw)))
      val joined = bf.join(ranked, Seq("query_id", "id"))
      val hitAggs = for (np <- npSorted; kk <- ksSorted) yield coalesce(
        sum(when(col("prn") <= np && col("bfr") <= kk &&
          col(s"ivfr_$np") <= kk, 1L).otherwise(0L)), lit(0L))
      val hitRow = joined.agg(hitAggs.head, hitAggs.tail: _*).head
      val scanAggs = npSorted.map(np => coalesce(
        sum(when(col("prn") <= np, col("cell_n")).otherwise(0L)), lit(0L)))
      val scanRow = probes.join(cellSizes, Seq("cell"))
        .agg(scanAggs.head, scanAggs.tail: _*).head
      val rows = npSorted.zipWithIndex.flatMap { case (np, ni) =>
        val scanned = scanRow.getLong(ni)
        // BigInt: 1e6·scanned and nQ·nCorpus overflow a Long at the
        // corpus scale this operator documents (review r14)
        val scannedPpm =
          if (nQ == 0 || nCorpus == 0) 0L
          else (BigInt(1000000L) * scanned /
            (BigInt(nQ) * nCorpus)).toLong
        ksSorted.zipWithIndex.map { case (kk, ki) =>
          val h = hitRow.getLong(ni * ksSorted.length + ki)
          val nbf = nBfRow.getLong(ki)
          (np.toLong, kk.toLong, nQ, h, nbf,
            if (nbf == 0) 0L else 1000000L * h / nbf, scannedPpm)
        }
      }
      import spark.implicits._
      rows.toDF("n_probe", "k", "n_queries", "n_hits", "n_bf",
        "recall_ppm", "scanned_ppm")
    } finally Seq(assigned, probes, cand, bf).foreach(_.unpersist(false))
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
  /** Codebook rows = the corpus vectors named by `centroidIds`, in id
    * order — driver-collected, bounded by the quantizer-size contract. */
  private def collectCodebook(c: DataFrame,
                              centroidIds: Seq[Long]): Seq[Seq[Double]] = {
    val rows = c.filter(col("id").isInCollection(centroidIds))
      .orderBy(col("id"))
      .collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    // A silently shrunken codebook (missing or zero-norm centroid id)
    // would encode against fewer rows than the contract names — and an
    // EMPTY one would surface as an opaque codebook.head NPE in ADC.
    // DECLARED DIVERGENCE from the oracles (ADVICE r6): the e04-e07/d13
    // cb/cents CTEs silently continue with fewer centroid rows on the
    // same degenerate input — a shrunken-quantizer result, where this
    // engine fails the job. Fail-loud is the intended production
    // contract (a missing centroid means the quantizer inputs are
    // corrupt); the oracle comparison is only defined on inputs where
    // every named centroid resolves, which the driver corpora satisfy.
    require(rows.size == centroidIds.distinct.size,
      s"codebook resolved ${rows.size} of ${centroidIds.distinct.size} " +
        s"centroid ids — missing or degenerate (zero-norm) centroid vectors")
    rows
  }

  def pqEncode(corpus: DataFrame, vecCol: String, idCol: String,
               m: Int, centroidIds: Seq[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    pqEncodeOn(c, m, collectCodebook(c, centroidIds))
  }

  /** PQ encode against an EXPLICIT codebook (a [[KMeans.fitPqCodebook]]
    * packed fit — the trained form; the id-named overload above is the
    * stand-in special case where codebook rows are corpus vectors).
    * Same single map-only compiled pass. (Separate name: Seq[Long] and
    * Seq[Seq[Double]] erase identically, like cellAssignmentsTrained.) */
  def pqEncodeTrained(corpus: DataFrame, vecCol: String, idCol: String,
                      m: Int, codebook: Seq[Seq[Double]]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    pqEncodeOn(c, m, codebook)
  }

  private def pqEncodeOn(c: DataFrame, m: Int,
                         codebook: Seq[Seq[Double]]): DataFrame = {
    val st = graft.expressions.VectorExpressions.pqEncode(col("v"), codebook, m)
    c.select(col("id"), st.as("st"))
      .filter(col("st").isNotNull) // width-mismatched vectors drop, not NPE
      .select(col("id"), col("st.codes").as("codes"),
        round(col("st.err"), 6).as("recon_err"))
  }

  /** PQ asymmetric-distance (ADC) top-k — IVF-PQ's search half: each
    * query precomputes a per-subspace distance TABLE against the
    * codebook (m×k doubles, driver-side — queries are a bounded batch,
    * the same contract as [[bruteForceTopK]]'s broadcast), and scoring
    * a corpus vector is m table lookups over its CODES — never touching
    * the original embedding. That is the PQ payoff: the scored relation
    * carries m small ints per vector instead of `dim` doubles, and the
    * scan+score pass is bandwidth-bound on ~2% of the raw bytes.
    *
    * Plan shape: codes (map-only encode) × broadcast query tables →
    * codegen'd element_at lookups (no higher-order functions) → per-
    * query top-k window. Distances are the approximate d² implied by
    * the quantization, rounded to 6dp with id tiebreak for cross-engine
    * rank stability. */
  /** Per-query ADC distance tables, flat [j * kCent + cidx] — the
    * i-loop accumulation order matches the oracle's list_inner_product
    * slices. Driver-side: queries are a bounded batch, the same
    * contract as [[bruteForceTopK]]'s broadcast. */
  private def adcTables(queries: DataFrame, vecCol: String, idCol: String,
                        codebook: Seq[Seq[Double]], m: Int): DataFrame = {
    val dim = codebook.head.length
    val qRows = queries
      .select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
      .collect()
    val spark = queries.sparkSession
    import spark.implicits._
    qRows.toSeq.map { r =>
      val qv = r.getSeq[Double](1).toArray
      require(qv.length == dim,
        s"query ${r.getLong(0)} has dim ${qv.length}, codebook has $dim")
      (r.getLong(0), adcTableFor(qv, codebook, m).toSeq)
    }.toDF("query_id", "dt")
  }

  /** One flat [j·kCent + cidx] ADC table for a single (residual or raw)
    * query vector — the i-loop accumulation order matches the oracle's
    * list_inner_product slices. */
  private def adcTableFor(qv: Array[Double], codebook: Seq[Seq[Double]],
                          m: Int): Array[Double] = {
    val dim = codebook.head.length
    val sub = dim / m
    val kCent = codebook.length
    val dt = new Array[Double](m * kCent)
    var j = 0
    while (j < m) {
      var cidx = 0
      while (cidx < kCent) {
        var ipaa = 0.0; var ipab = 0.0; var ipbb = 0.0
        var i = j * sub
        val end = (j + 1) * sub
        while (i < end) {
          val a = qv(i); val b = codebook(cidx)(i)
          ipaa += a * a; ipab += a * b; ipbb += b * b
          i += 1
        }
        dt(j * kCent + cidx) = ipaa - 2 * ipab + ipbb
        cidx += 1
      }
      j += 1
    }
    dt
  }

  /** score = Σ_j dt[j*kCent + codes[j]] — explicit left-assoc chain of
    * codegen'd element_at lookups (1-based), matching the oracle's
    * chained additions. */
  private def adcScore(m: Int, kCent: Int): Column = (0 until m)
    .map(j => element_at(col("dt"),
      (col("codes").getItem(j) + lit(j * kCent) + 1).cast(IntegerType)))
    .reduce(_ + _)

  def pqAdcTopK(corpus: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, k: Int,
                m: Int, centroidIds: Seq[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    pqAdcTopKOn(corpus, queries, vecCol, idCol, k, m,
      collectCodebook(c, centroidIds))
  }

  /** ADC top-k over an EXPLICIT (trained) PQ codebook — same plan shape
    * as [[pqAdcTopK]]; only the codebook source differs. */
  def pqAdcTopKTrained(corpus: DataFrame, queries: DataFrame,
                       vecCol: String, idCol: String, k: Int,
                       m: Int, codebook: Seq[Seq[Double]]): DataFrame =
    pqAdcTopKOn(corpus, queries, vecCol, idCol, k, m, codebook)

  private def pqAdcTopKOn(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int,
                          m: Int, codebook: Seq[Seq[Double]]): DataFrame = {
    val codes = pqEncodeTrained(corpus, vecCol, idCol, m, codebook)
      .select(col("id"), col("codes"))
    val tables = adcTables(queries, vecCol, idCol, codebook, m)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("id").asc)
    codes.crossJoin(broadcast(tables))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc_d2", round(adcScore(m, codebook.length), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("adc_d2"))
  }

  /** The full IVF-PQ search — the production ANN shape at 100 TB:
    * coarse cells prune WHICH corpus rows are scored (e02's half),
    * PQ codes compress WHAT is read to score them (e05's half).
    * Each query probes its `nProbe` nearest coarse cells and
    * ADC-scores only the code rows in those cells: per query the scan
    * touches ~nProbe/nCells of the corpus at ~2% of the raw bytes.
    *
    * Plan shape: map-only cell assignment + PQ encode in ONE projection
    * over the corpus scan (both literal-codebook expressions, zero
    * shuffle); probes + ADC tables are driver/broadcast-side (bounded
    * query batch); the probe join is an equi-join on cell against a
    * broadcast; top-k via per-query window. At warehouse scale the code
    * table is written partitioned BY cell, so probes prune partitions
    * at the scan (IvfStorageSpec pins that property).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, k: Int,
                cellIds: Seq[Long], nProbe: Int,
                m: Int, pqCentroidIds: Seq[Long]): DataFrame =
    ivfPqSearch(corpus, queries, vecCol, idCol, k,
      cellAssignments(corpus, vecCol, idCol, cellIds),
      () => probeCells(corpus, queries, vecCol, idCol, cellIds, nProbe),
      m, collectCodebook(
        corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
          .filter(nonDegenerate(col("v"))), pqCentroidIds.distinct.sorted))

  /** IVF-PQ over a TRAINED coarse quantizer: cells come from a
    * [[KMeans.Model]] codebook (0..k-1); the PQ sub-codebook stays the
    * id-named contract. For the fully-trained form (PQ sub-codebooks
    * from per-subspace L2 k-means too) see [[ivfPqTopKFullyTrained]]. */
  def ivfPqTopKTrained(corpus: DataFrame, queries: DataFrame,
                       vecCol: String, idCol: String, k: Int,
                       cellCodebook: Seq[Seq[Double]], nProbe: Int,
                       m: Int, pqCentroidIds: Seq[Long]): DataFrame =
    ivfPqSearch(corpus, queries, vecCol, idCol, k,
      cellAssignmentsTrained(corpus, vecCol, idCol, cellCodebook),
      () => probeCellsOn(centsOf(corpus.sparkSession, cellCodebook),
        queries, vecCol, idCol, nProbe),
      m, collectCodebook(
        corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
          .filter(nonDegenerate(col("v"))), pqCentroidIds.distinct.sorted))

  /** The production IVF-PQ: BOTH quantizers trained — coarse cells from
    * the spherical k-means fit, PQ sub-codebooks from `m` independent
    * L2 k-means fits on the sub-vector slices ([[graft.operators
    * .KMeans]] with the L2 metric — the geometry PQ encoding argmins),
    * packed into full-width codebook rows (slice j of packed row c is
    * sub-centroid (j, c) — [[graft.expressions.PqEncodeExpr]] slices
    * subspaces independently, so the packed form encodes identically
    * to per-subspace codebooks with zero expression changes). */
  def ivfPqTopKFullyTrained(corpus: DataFrame, queries: DataFrame,
                            vecCol: String, idCol: String, k: Int,
                            cellCodebook: Seq[Seq[Double]], nProbe: Int,
                            m: Int, pqCodebook: Seq[Seq[Double]]): DataFrame =
    ivfPqSearch(corpus, queries, vecCol, idCol, k,
      cellAssignmentsTrained(corpus, vecCol, idCol, cellCodebook),
      () => probeCellsOn(centsOf(corpus.sparkSession, cellCodebook),
        queries, vecCol, idCol, nProbe),
      m, pqCodebook)

  /** IVF-PQ OPERATING SWEEP — (nProbe × ADC-shortlist depth) jointly
    * at fixed final k, the two knobs the PRODUCTION ANN path actually
    * serves with: probe width buys candidate coverage (scan cost),
    * shortlist depth buys back what lossy ADC ranking mis-orders
    * (rerank cost — the e06 contract measured instead of assumed).
    * Per grid cell: recall@k of [ADC-rank shortlist of depth r →
    * EXACT rerank → top-k] against the exact brute force, next to the
    * scanned corpus fraction. The final rerank ranks on the
    * exact-integer cosine key and the baseline is
    * [[bruteForceTopKExact]] (the e24/e25 gate contract); ADC scoring
    * keeps the round-6 float replay the e05/e07/e09 gates have proven.
    *
    * Efficiency contract (the e25 shape deepened): ONE coded candidate
    * scan at max(nProbes) (ADC-scored, probe rank attached); per probe
    * width ONE ADC window cut to max(rs), and the TRUE vectors attach
    * only to that bounded shortlist (nq·max(rs) rows — the rerank
    * never touches the corpus); each depth then re-ranks the in-memory
    * shortlist prefix. |nProbes| ADC windows + |nProbes| bounded
    * attach joins total; the depth axis is windows over ≤ nq·max(rs)
    * rows. n_bf is the depth-k baseline row count (denominator per
    * ADVICE r13). */
  def ivfPqOperatingSweepExact(corpus: DataFrame, queries: DataFrame,
                               vecCol: String, idCol: String, k: Int,
                               cellCodebook: Seq[Seq[Double]], m: Int,
                               pqCodebook: Seq[Seq[Double]],
                               rs: Seq[Int], nProbes: Seq[Int]): DataFrame = {
    require(k >= 1, s"bad k $k")
    require(rs.nonEmpty && rs.forall(_ >= k) && rs.distinct.size == rs.size,
      s"shortlist depths must be >= k=$k and distinct, got $rs")
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1) &&
      nProbes.distinct.size == nProbes.size, s"bad nProbes $nProbes")
    val spark = corpus.sparkSession
    val maxNp = nProbes.max
    val maxR = rs.max
    val assigned = cellAssignmentsTrained(corpus, vecCol, idCol,
      cellCodebook).persist()
    val coded = assigned
      .select(col("id"), col("cell"),
        graft.expressions.VectorExpressions
          .pqEncode(col("v"), pqCodebook, m).as("st"))
      .filter(col("st").isNotNull)
      .select(col("id"), col("cell"), col("st.codes").as("codes"))
    val cents = centsOf(spark, cellCodebook)
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    // probe ranking on the exact-integer key (r15) — THE shared
    // [[probeRanked]] formulation across the family. No qv kept:
    // unlike the exact sweep, ADC scoring reads the broadcast lookup
    // tables, so caching query vectors per probe row would be dead
    // weight (review r14 s2)
    val probes = probeRanked(cents, queries, vecCol, idCol, maxNp)
      .select(col("query_id"), col("cell"), col("prn"))
      .persist()
    val tables = adcTables(queries, vecCol, idCol, pqCodebook, m)
    val cand = coded
      .join(broadcast(probes.select("query_id", "cell", "prn")
        .join(tables, Seq("query_id"))), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc_d2", round(adcScore(m, pqCodebook.length), 6))
      .select(col("query_id"), col("id"), col("adc_d2"), col("prn"))
      // materialize query_id-partitioned: the per-probe ADC window and
      // the exact-key rerank then run with NO exchange (one shuffle
      // here replaces one per probe width)
      .repartition(col("query_id"))
      .persist()
    val bf = bruteForceTopKExact(corpus, queries, vecCol, idCol, k)
      .select(col("query_id"), col("id")).persist()
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    val corpusVecs = assigned.select(col("id"), col("v"))
    val nQ = q.count()
    val nCorpus = assigned.count()
    val nBf = bf.count()
    try {
      // ONE bounded aggregate for every probe width's scanned count,
      // and ONE window pass + ONE aggregate per probe width instead of
      // |rs| rerank windows × |rs| count jobs — the depth-r rank of a
      // shortlist row is the RUNNING COUNT of rows with ar ≤ r in
      // exact-key order (row_number over the ar ≤ r subset for exactly
      // those rows). The shortlist no longer needs a checkpoint: it is
      // consumed by one job. (Same restructure as
      // [[operatingGrid3dMulti]]; IvfPqGridSpec pins the cells equal.)
      val npSorted = nProbes.sorted
      val rsSorted = rs.sorted
      val scanAggs = npSorted.map(np => coalesce(
        sum(when(col("prn") <= np, col("cell_n")).otherwise(0L)), lit(0L)))
      val scanRow = probes.join(cellSizes, Seq("cell"))
        .agg(scanAggs.head, scanAggs.tail: _*).head
      val rows = npSorted.zipWithIndex.flatMap { case (np, npi) =>
        val scanned = scanRow.getLong(npi)
        val scannedPpm =
          if (nQ == 0 || nCorpus == 0) 0L
          else (BigInt(1000000L) * scanned / (BigInt(nQ) * nCorpus)).toLong
        val short = cand.filter(col("prn") <= np)
          .withColumn("ar", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("adc_d2").asc, col("id").asc)))
          .filter(col("ar") <= maxR)
          // the rerank attaches TRUE vectors to the bounded shortlist
          // only — nq·maxR rows, never the corpus
          .join(corpusVecs, Seq("id"))
          .join(q, Seq("query_id"))
          .withColumn("key", VectorExpressions.intCosKey(col("v"), col("qv")))
          .filter(col("key").isNotNull)
          .select(col("query_id"), col("id"), col("ar"), col("key"))
        val kw = Window.partitionBy("query_id")
          .orderBy(col("key").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = rsSorted.foldLeft(short)((df, r) =>
          df.withColumn(s"frank_$r",
            sum(when(col("ar") <= r, 1L).otherwise(0L)).over(kw)))
        // bf and the shortlist are both unique per (query_id, id), so
        // the inner join's conditional counts equal the left-semi
        // counts the per-depth jobs produced
        val joined = bf.join(ranked, Seq("query_id", "id"))
        val hitAggs = rsSorted.map(r => coalesce(
          sum(when(col("ar") <= r && col(s"frank_$r") <= k, 1L)
            .otherwise(0L)), lit(0L)))
        val hitRow = joined.agg(hitAggs.head, hitAggs.tail: _*).head
        rsSorted.zipWithIndex.map { case (r, ri) =>
          val hits = hitRow.getLong(ri)
          (np.toLong, r.toLong, nQ, hits, nBf,
            if (nBf == 0) 0L else 1000000L * hits / nBf, scannedPpm)
        }
      }
      import spark.implicits._
      rows.toDF("n_probe", "r_shortlist", "n_queries", "n_hits", "n_bf",
        "recall_ppm", "scanned_ppm")
    } finally Seq(assigned, probes, cand, bf).foreach(_.unpersist(false))
  }

  /** 3-D IVF-PQ OPERATING GRID — (nProbe × ADC-shortlist depth × k)
    * JOINTLY (VERDICT r14 next-#7 / missing-#3): the table a real
    * deployment actually tunes from. e25 covers (nProbe × k) on the
    * exact index, e26 covers (nProbe × r) at fixed k on the PQ path;
    * this composes both axes on the PQ path — probe width buys
    * candidate coverage, shortlist depth buys back ADC mis-ordering,
    * result depth k trades recall against serving cost, and all three
    * interact (deep shortlists only pay at wide k; narrow probes cap
    * recall regardless of r).
    *
    * Efficiency contract — e26's, with the k axis FREE (e25's trick):
    * ONE coded candidate scan at max(nProbes); per probe width ONE ADC
    * window cut to max(rs) with true vectors attached only to that
    * bounded shortlist; per (probe, r) ONE exact-key re-rank window cut
    * to max(ks) and ONE conditional aggregate emitting EVERY k's hit
    * count — |nProbes| ADC windows + |nProbes|·|rs| re-rank windows
    * total, row count multiplied by |ks| at zero extra scans. The
    * baseline is [[bruteForceTopKExact]] at max(ks), rank kept, so
    * each (k) divides by its own depth-k baseline row count (the
    * ADVICE-r13 denominator, per depth).
    *
    * Every cell with k matching [[ivfPqOperatingSweepExact]]'s fixed k
    * is spec-pinned EQUAL to that operator's (nProbe, r) point
    * (IvfPqGridSpec) — the 3-D grid is a strict widening, not a fork. */
  def ivfPqOperatingGrid3d(corpus: DataFrame, queries: DataFrame,
                           vecCol: String, idCol: String, ks: Seq[Int],
                           cellCodebook: Seq[Seq[Double]], m: Int,
                           pqCodebook: Seq[Seq[Double]],
                           rs: Seq[Int], nProbes: Seq[Int]): DataFrame =
    operatingGrid3dOn(corpus, queries, vecCol, idCol, ks, cellCodebook,
      rs, nProbes, pqCandOf(queries, vecCol, idCol, m, pqCodebook))

  // the PQ/ADC candidate scorer — shared by the standalone PQ grid and
  // the multi-family union, so the two paths cannot drift
  private def pqCandOf(queries: DataFrame, vecCol: String, idCol: String,
                       m: Int, pqCodebook: Seq[Seq[Double]])
      : (DataFrame, DataFrame, DataFrame) => DataFrame =
    (assigned, probes, _) => {
      val coded = assigned
        .select(col("id"), col("cell"),
          graft.expressions.VectorExpressions
            .pqEncode(col("v"), pqCodebook, m).as("st"))
        .filter(col("st").isNotNull)
        .select(col("id"), col("cell"), col("st.codes").as("codes"))
      val tables = adcTables(queries, vecCol, idCol, pqCodebook, m)
      coded
        .join(broadcast(probes.join(tables, Seq("query_id"))), Seq("cell"))
        .filter(col("id") =!= col("query_id"))
        .withColumn("score", round(adcScore(m, pqCodebook.length), 6))
        .select(col("query_id"), col("id"), col("score"), col("prn"))
    }

  /** IVF-SQ8 OPERATING GRID — [[ivfPqOperatingGrid3d]]'s (nProbe ×
    * shortlist × k) surface with the candidate stage scored by the SQ8
    * reconstruction ([[sqTopK]]'s asymmetric L2 over [[sqDecodeCol]])
    * instead of PQ/ADC tables: the scalar-quantizer FAMILY's operating
    * points, feeding the cross-family serving auto-choice the same way
    * e27 feeds e28. Plan shape is identical (shared skeleton below —
    * ONE coded candidate scan at max(nProbes), bounded shortlists,
    * exact-integer-key re-rank, conditional per-k aggregates), so the
    * two families' cost/recall cells are directly comparable: same
    * probe stage, same truth, same scanned_ppm denominator — only the
    * approximate scorer differs, which is exactly the axis a family
    * choice must isolate. */
  def ivfSqOperatingGrid3d(corpus: DataFrame, queries: DataFrame,
                           vecCol: String, idCol: String, ks: Seq[Int],
                           cellCodebook: Seq[Seq[Double]],
                           mins: Seq[Double], scales: Seq[Double],
                           rs: Seq[Int], nProbes: Seq[Int]): DataFrame =
    operatingGrid3dOn(corpus, queries, vecCol, idCol, ks, cellCodebook,
      rs, nProbes, sqCandOf(mins, scales))

  // the SQ8-reconstruction candidate scorer — shared like [[pqCandOf]]
  private def sqCandOf(mins: Seq[Double], scales: Seq[Double])
      : (DataFrame, DataFrame, DataFrame) => DataFrame =
    (assigned, probes, q) => {
      val decoded = assigned
        .select(col("id"), col("cell"),
          sqEncodeCol(col("v"), mins, scales).as("codes"))
        .select(col("id"), col("cell"),
          sqDecodeCol(col("codes"), mins, scales).as("rv"))
      decoded.join(broadcast(probes), Seq("cell"))
        .filter(col("id") =!= col("query_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("score", round(sqD2, 6))
        .select(col("query_id"), col("id"), col("score"), col("prn"))
    }

  /** IVF-BQ OPERATING GRID — the binary-quantization FAMILY's
    * (nProbe × shortlist × k) surface (VERDICT r16 next-#2): e14's
    * 1-bit sign codes + hamming shortlist ranking plugged into the
    * same skeleton as the PQ/SQ8 grids, so the modern vector-store
    * default (32× compression, XOR+popcount candidate scan, exact
    * rescore of the bounded shortlist) competes in the cross-family
    * choice on the identical probe stage, truth, and scanned-ppm
    * denominator. Hamming is round-free integer arithmetic — the one
    * family whose approximate scorer has zero float-replay risk. */
  def ivfBqOperatingGrid3d(corpus: DataFrame, queries: DataFrame,
                           vecCol: String, idCol: String, ks: Seq[Int],
                           cellCodebook: Seq[Seq[Double]],
                           thresholds: Seq[Double],
                           rs: Seq[Int], nProbes: Seq[Int]): DataFrame =
    operatingGrid3dOn(corpus, queries, vecCol, idCol, ks, cellCodebook,
      rs, nProbes, bqCandOf(thresholds))

  // the 1-bit sign-code candidate scorer — [[bqTopK]]'s hamming ranking
  // in the skeleton's score slot: corpus codes pack per 32-dim word in
  // the assignment projection, query codes broadcast, score =
  // XOR+popcount (exact integers; the double cast only satisfies the
  // skeleton's column type, it cannot reorder ties)
  private def bqCandOf(thresholds: Seq[Double])
      : (DataFrame, DataFrame, DataFrame) => DataFrame =
    (assigned, probes, q) => {
      val nw = (thresholds.length + 31) / 32
      val cc = assigned.select(col("id") +: col("cell") +:
        bqWords(col("v"), thresholds).zipWithIndex.map {
          case (w, i) => w.as(s"cw$i") }: _*)
      val qc = q.select(col("query_id") +:
        bqWords(col("qv"), thresholds).zipWithIndex.map {
          case (w, i) => w.as(s"qw$i") }: _*)
      val hamming = (0 until nw).map(i =>
        bit_count(col(s"cw$i").bitwiseXOR(col(s"qw$i")))).reduce(_ + _)
      cc.join(broadcast(probes), Seq("cell"))
        .filter(col("id") =!= col("query_id"))
        .join(broadcast(qc), Seq("query_id"))
        .withColumn("score", hamming.cast(DoubleType))
        .select(col("query_id"), col("id"), col("score"), col("prn"))
    }

  /** The PQ, SQ8, and BQ family grids over ONE shared substrate (see
    * [[operatingGrid3dMulti]]) — the relation the cross-family choices
    * (e31/e32/e33) consume: identical cells to running the three
    * standalone grids, with the probe stage, truth job, and baselines
    * computed once instead of three times. The OPQ family cannot join
    * the substrate (rotated corpus, its own quantizers) and unions in
    * from its standalone grid. Output: grid columns + `family` in
    * {"ivf_pq", "ivf_sq8", "ivf_bq"}. */
  def ivfFamilyOperatingGrids(corpus: DataFrame, queries: DataFrame,
                              vecCol: String, idCol: String, ks: Seq[Int],
                              cellCodebook: Seq[Seq[Double]], m: Int,
                              pqCodebook: Seq[Seq[Double]],
                              mins: Seq[Double], scales: Seq[Double],
                              bqThresholds: Seq[Double],
                              rs: Seq[Int], nProbes: Seq[Int]): DataFrame =
    operatingGrid3dMulti(corpus, queries, vecCol, idCol, ks, cellCodebook,
      rs, nProbes, Seq(
        "ivf_pq" -> pqCandOf(queries, vecCol, idCol, m, pqCodebook),
        "ivf_sq8" -> sqCandOf(mins, scales),
        "ivf_bq" -> bqCandOf(bqThresholds)))

  /** FILTERED IVF-PQ OPERATING GRID (VERDICT r16 next-#4): the e27
    * grid measured UNDER a metadata predicate — e17's pre-filter
    * contract (the corpus side is cut to `keepIds` BEFORE the probe
    * join; the index, trained on the FULL corpus, is shared). Two
    * filtered-serving semantics differ from the unfiltered grid and
    * both matter to the layout decision:
    *  - the brute-force truth is the FILTERED search's truth (exact
    *    top-k over the survivors — post-filtering an unfiltered top-k
    *    loses recall and would hash-mismatch);
    *  - `scanned_ppm` keeps the FULL corpus as its denominator, so a
    *    cell's cost is comparable to the predicate-pruned exact scan,
    *    whose cost is exactly `selectivity_ppm` (appended as a
    *    constant column). At 100 TB this is the real filtered-serving
    *    question: an index cell is only worth building if it scans
    *    fewer rows than the pruned flat scan the predicate already
    *    buys. */
  def ivfPqFilteredOperatingGrid3d(corpus: DataFrame, keepIds: DataFrame,
                                   queries: DataFrame, vecCol: String,
                                   idCol: String, ks: Seq[Int],
                                   cellCodebook: Seq[Seq[Double]], m: Int,
                                   pqCodebook: Seq[Seq[Double]],
                                   rs: Seq[Int], nProbes: Seq[Int])
      : DataFrame = {
    def cleanCount(df: DataFrame): Long =
      df.select(toDoubleArray(col(vecCol)).as("v"))
        .filter(nonDegenerate(col("v"))).count()
    val nFull = cleanCount(corpus)
    val filtered = corpus.join(keepIds, Seq(idCol))
    val nKept = cleanCount(filtered)
    require(nFull > 0, "filtered grid needs a non-empty corpus")
    operatingGrid3dMulti(filtered, queries, vecCol, idCol, ks,
        cellCodebook, rs, nProbes,
        Seq("" -> pqCandOf(queries, vecCol, idCol, m, pqCodebook)),
        scanDenomOverride = Some(nFull))
      .drop("family")
      .withColumn("selectivity_ppm", lit(1000000L * nKept / nFull))
  }

  /** FILTERED MULTI-FAMILY GRIDS — [[ivfPqFilteredOperatingGrid3d]]'s
    * pre-filter contract over [[operatingGrid3dMulti]]'s shared
    * substrate: the PQ, SQ8, and BQ families measured UNDER the
    * predicate with ONE filtered probe stage and ONE filtered truth
    * job, each cell charged against the FULL corpus (so every family's
    * cells compare to the predicate-pruned exact scan at
    * `selectivity_ppm`). The OPQ family is deliberately absent: its
    * rotated corpus cannot join the substrate, and a filtered serving
    * choice wants the families that share one index storage. Output:
    * grid columns + `family` + `selectivity_ppm`. */
  def ivfFilteredFamilyOperatingGrids(corpus: DataFrame, keepIds: DataFrame,
                                      queries: DataFrame, vecCol: String,
                                      idCol: String, ks: Seq[Int],
                                      cellCodebook: Seq[Seq[Double]], m: Int,
                                      pqCodebook: Seq[Seq[Double]],
                                      mins: Seq[Double], scales: Seq[Double],
                                      bqThresholds: Seq[Double],
                                      rs: Seq[Int], nProbes: Seq[Int])
      : DataFrame = {
    def cleanCount(df: DataFrame): Long =
      df.select(toDoubleArray(col(vecCol)).as("v"))
        .filter(nonDegenerate(col("v"))).count()
    val nFull = cleanCount(corpus)
    val filtered = corpus.join(keepIds, Seq(idCol))
    val nKept = cleanCount(filtered)
    require(nFull > 0, "filtered grids need a non-empty corpus")
    operatingGrid3dMulti(filtered, queries, vecCol, idCol, ks,
        cellCodebook, rs, nProbes, Seq(
          "ivf_pq" -> pqCandOf(queries, vecCol, idCol, m, pqCodebook),
          "ivf_sq8" -> sqCandOf(mins, scales),
          "ivf_bq" -> bqCandOf(bqThresholds)),
        scanDenomOverride = Some(nFull))
      .withColumn("selectivity_ppm", lit(1000000L * nKept / nFull))
  }

  /** The CHEAPEST-MEETING-CELL decision window shared by every serving
    * auto-choice (e28/e31/e32/e33/e36 and the curation index card —
    * review r17: six hand-rolled copies of this load-bearing ordering
    * had accumulated): per partition (the (k, target) or (tenant, k)
    * key), prefer cells meeting the target (`meets` = 1), then minimal
    * recall deficit (the best-available fallback when nothing meets),
    * then the lexicographic cost order — scanned corpus fraction first
    * (the at-scale dominant cost), then the caller's remaining
    * tiebreaks (shortlist depth, probe count, family name) as
    * already-directed columns. `cand` must carry integer `meets`,
    * `recall_ppm`, `scanned_ppm`. Returns the winning row per
    * partition (the `rn` helper column dropped). */
  def cheapestMeetingCell(cand: DataFrame, partitionCols: Seq[String],
                          costTail: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy((Seq(col("meets").desc,
        when(col("meets") === 1L, lit(0L))
          .otherwise(lit(1000000L) - col("recall_ppm")).asc,
        col("scanned_ppm").asc) ++ costTail): _*)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** The family-generic 3-D grid skeleton: everything in the e27
    * contract EXCEPT the approximate candidate scorer, which `candOf`
    * supplies as a (query_id, id, score, prn) relation built from the
    * persisted cell assignments, the probe table, and the skeleton's
    * filtered query relation (query_id, qv) (score ASC = more
    * promising, round-6dp, id tiebreak — the established shortlist
    * ordering contract). */
  private def operatingGrid3dOn(corpus: DataFrame, queries: DataFrame,
                                vecCol: String, idCol: String, ks: Seq[Int],
                                cellCodebook: Seq[Seq[Double]],
                                rs: Seq[Int], nProbes: Seq[Int],
                                candOf: (DataFrame, DataFrame, DataFrame)
                                  => DataFrame)
      : DataFrame =
    operatingGrid3dMulti(corpus, queries, vecCol, idCol, ks, cellCodebook,
      rs, nProbes, Seq("" -> candOf)).drop("family")

  /** MULTI-FAMILY grid: the skeleton run for SEVERAL candidate scorers
    * over ONE shared substrate — cell assignments, probe table,
    * brute-force truth, per-k baselines, and per-probe-width scanned
    * fractions are all family-independent, so computing them once and
    * scoring per family is the honest intra-query plan (the corpus is
    * scanned once per family for CODES, but the exchanges and the
    * truth job are not repeated). e31/e32/e33 select over this union;
    * the single-family operators delegate here with one entry, so the
    * shared and standalone paths cannot diverge (and the e31 spec
    * re-derives the choice from the standalone grids, pinning the
    * equality). Output: the grid columns + `family`. */
  private def operatingGrid3dMulti(corpus: DataFrame, queries: DataFrame,
                                   vecCol: String, idCol: String,
                                   ks: Seq[Int],
                                   cellCodebook: Seq[Seq[Double]],
                                   rs: Seq[Int], nProbes: Seq[Int],
                                   families: Seq[(String,
                                     (DataFrame, DataFrame, DataFrame)
                                       => DataFrame)],
                                   // scanned_ppm denominator override:
                                   // the filtered grid charges cells
                                   // against the FULL corpus so they
                                   // compare to the predicate-pruned
                                   // exact scan (None = |corpus|)
                                   scanDenomOverride: Option[Long] = None)
      : DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.distinct.size == ks.size,
      s"bad ks $ks")
    require(rs.nonEmpty && rs.forall(_ >= ks.max) &&
      rs.distinct.size == rs.size,
      s"shortlist depths must be >= max k=${ks.max} and distinct, got $rs")
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1) &&
      nProbes.distinct.size == nProbes.size, s"bad nProbes $nProbes")
    require(families.nonEmpty &&
      families.map(_._1).distinct.size == families.size,
      s"family tags must be distinct, got ${families.map(_._1)}")
    val spark = corpus.sparkSession
    val maxNp = nProbes.max
    val maxR = rs.max
    val kMax = ks.max
    val ksSorted = ks.sorted
    val assigned = cellAssignmentsTrained(corpus, vecCol, idCol,
      cellCodebook).persist()
    val cents = centsOf(spark, cellCodebook)
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    val probes = probeRanked(cents, queries, vecCol, idCol, maxNp)
      .select(col("query_id"), col("cell"), col("prn"))
      .persist()
    val cands = families.map { case (fam, candOf) =>
      fam -> candOf(assigned, probes, q)
        .select(col("query_id"), col("id"), col("score"), col("prn"))
        // materialize query_id-partitioned: every downstream window
        // (per-probe shortlist rank, exact-key rerank) then runs with
        // NO exchange — one shuffle here replaces one per probe width
        .repartition(col("query_id"))
        .persist()
    }
    val bf = bruteForceTopKExact(corpus, queries, vecCol, idCol, kMax)
      .select(col("query_id"), col("id"), col("rank").as("bfr"))
      .persist()
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    val corpusVecs = assigned.select(col("id"), col("v"))
    val nQ = q.count()
    val nCorpus = scanDenomOverride.getOrElse(assigned.count())
    val bfAggs = ksSorted.map(kk =>
      coalesce(sum(when(col("bfr") <= kk, 1L).otherwise(0L)), lit(0L)))
    val nBfRow = bf.agg(bfAggs.head, bfAggs.tail: _*).head
    try {
      // ONE bounded aggregate for every probe width's scanned count —
      // the per-np aggregates were identical scans of the same tiny
      // probe relation (guide §1: fewer jobs)
      val npSorted = nProbes.sorted
      val rsSorted = rs.sorted
      val scanAggs = npSorted.map(np => coalesce(
        sum(when(col("prn") <= np, col("cell_n")).otherwise(0L)), lit(0L)))
      val scanRow = probes.join(cellSizes, Seq("cell"))
        .agg(scanAggs.head, scanAggs.tail: _*).head
      val scannedPpmOf = npSorted.zipWithIndex.map { case (np, i) =>
        np -> (if (nQ == 0 || nCorpus == 0) 0L
          else (BigInt(1000000L) * scanRow.getLong(i) /
            (BigInt(nQ) * nCorpus)).toLong)
      }.toMap
      val rows = npSorted.flatMap { np =>
        val scannedPpm = scannedPpmOf(np)
        cands.flatMap { case (fam, cand) =>
          // ONE window pass + ONE aggregate per (probe, family)
          // instead of |rs| rerank windows × |rs| jobs: the depth-r
          // rank of a shortlist row is the RUNNING COUNT of rows with
          // ar ≤ r in exact-key order (for rows with ar ≤ r this
          // equals row_number over the ar ≤ r subset — predecessors
          // inclusive of self in a total order), so every (r, k) cell
          // reads off one conditional sum. The shortlist no longer
          // needs its own persist: it is consumed by exactly one job.
          val short = cand.filter(col("prn") <= np)
            .withColumn("ar", row_number().over(Window.partitionBy("query_id")
              .orderBy(col("score").asc, col("id").asc)))
            .filter(col("ar") <= maxR)
            .join(corpusVecs, Seq("id"))
            .join(q, Seq("query_id"))
            .withColumn("key",
              VectorExpressions.intCosKey(col("v"), col("qv")))
            .filter(col("key").isNotNull)
            .select(col("query_id"), col("id"), col("ar"), col("key"))
          val kw = Window.partitionBy("query_id")
            .orderBy(col("key").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val ranked = rsSorted.foldLeft(short)((df, r) =>
            df.withColumn(s"frank_$r",
              sum(when(col("ar") <= r, 1L).otherwise(0L)).over(kw)))
          val joined = bf.join(ranked, Seq("query_id", "id"))
          val hitAggs = for (r <- rsSorted; kk <- ksSorted) yield coalesce(
            sum(when(col("ar") <= r && col(s"frank_$r") <= kk &&
              col("bfr") <= kk, 1L).otherwise(0L)), lit(0L))
          val hitRow = joined.agg(hitAggs.head, hitAggs.tail: _*).head
          rsSorted.zipWithIndex.flatMap { case (r, ri) =>
            ksSorted.zipWithIndex.map { case (kk, ki) =>
              val h = hitRow.getLong(ri * ksSorted.length + ki)
              val nbf = nBfRow.getLong(ki)
              (np.toLong, r.toLong, kk.toLong, nQ, h, nbf,
                if (nbf == 0) 0L else 1000000L * h / nbf, scannedPpm, fam)
            }
          }
        }
      }
      import spark.implicits._
      rows.toDF("n_probe", "r_shortlist", "k", "n_queries", "n_hits",
        "n_bf", "recall_ppm", "scanned_ppm", "family")
    } finally
      (Seq(assigned, probes, bf) ++ cands.map(_._2))
        .foreach(_.unpersist(false))
  }

  private def ivfPqSearch(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int,
                          assigned: DataFrame,
                          probesOf: () => DataFrame,
                          m: Int, codebook: Seq[Seq[Double]]): DataFrame = {
    // one map-only projection: cell + codes per corpus row
    val coded = assigned
      .select(col("id"), col("cell"),
        graft.expressions.VectorExpressions
          .pqEncode(col("v"), codebook, m).as("st"))
      .filter(col("st").isNotNull)
      .select(col("id"), col("cell"), col("st.codes").as("codes"))
    val probes = probesOf()
      .select(col("query_id"), col("cell"))
    val tables = adcTables(queries, vecCol, idCol, codebook, m)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("id").asc)
    coded.join(broadcast(probes.join(tables, Seq("query_id"))), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc_d2", round(adcScore(m, codebook.length), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("adc_d2"))
  }

  /** SQ8 scalar-quantizer stats: per-dimension (min, scale=max−min)
    * over the corpus — the faiss IndexScalarQuantizer QT_8bit training
    * contract (no codebook fit; two exact extrema per dimension, so
    * the "training" is ONE bounded aggregate and the result is
    * engine-exact with no float-accumulation concerns at all). Returns
    * driver literals (dim pairs — broadcastable like a codebook). */
  def sqTrain(corpus: DataFrame, vecCol: String,
              idCol: String): (Seq[Double], Seq[Double]) = {
    val c = corpus.select(toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val stats = c.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i").collect()
    (stats.map(_.getDouble(1)).toSeq,
      stats.map(r => r.getDouble(2) - r.getDouble(1)).toSeq)
  }

  /** SQ8 search: corpus encoded to 1 byte/dim (8x compression vs
    * doubles, NO training beyond the per-dim extrema), queries score
    * the RECONSTRUCTION v̂ᵢ = minᵢ + codeᵢ/255·scaleᵢ by exact squared
    * L2 — the asymmetric-distance contract (query stays full
    * precision), round-6dp ASC with id tiebreak. Encode and decode are
    * per-row index lambdas against the driver-literal stats: map-only
    * at any corpus size, and a once-per-row cost (not a pairwise hot
    * path), so the interpreted higher-order functions are acceptable
    * here where the O(n²) kernels demanded compiled expressions.
    * Scale shape: the flat-SQ index — at 100 TB this composes with
    * IVF cell pruning exactly like e07's code table (partitioned BY
    * cell); the scored relation carries dim bytes instead of dim
    * doubles. Output: (query_id, rank, id, sq_d2). */
  // code_i = round(((v_i − mn_i) / sc_i) · 255); constant dims -> 0
  private def sqEncodeCol(v: Column, mins: Seq[Double],
                          scales: Seq[Double]): Column = {
    val mnLit = typedlit(mins)
    val scLit = typedlit(scales)
    transform(v, (x, i) =>
      when(element_at(scLit, i + 1) === 0.0, lit(0L))
        .otherwise(round((x - element_at(mnLit, i + 1)) /
          element_at(scLit, i + 1) * lit(255.0), 0).cast(LongType)))
  }

  // v̂_i = mn_i + (code_i / 255) · sc_i — the decode the oracles mirror
  private def sqDecodeCol(codes: Column, mins: Seq[Double],
                          scales: Seq[Double]): Column = {
    val mnLit = typedlit(mins)
    val scLit = typedlit(scales)
    transform(codes, (cd, i) =>
      element_at(mnLit, i + 1) +
        cd.cast(DoubleType) / lit(255.0) * element_at(scLit, i + 1))
  }

  private def sqD2: Column =
    VectorExpressions.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorExpressions.dot(col("qv"), col("rv")) +
      VectorExpressions.dot(col("rv"), col("rv"))

  def sqTopK(corpus: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int,
             mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val decoded = c
      .select(col("id"), sqEncodeCol(col("v"), mins, scales).as("codes"))
      .select(col("id"), sqDecodeCol(col("codes"), mins, scales).as("rv"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sq_d2").asc, col("id").asc)
    decoded.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("sq_d2", round(sqD2, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("sq_d2"))
  }

  /** IVF-SQ — the faiss IndexIVFScalarQuantizer composition: trained
    * coarse cells prune WHICH rows are scored (e02's half), SQ8 codes
    * compress WHAT is read to score them (e13's half, 8x). Same plan
    * shape as [[ivfPqTopKTrained]] with the SQ decode in place of ADC
    * tables: assignment + encode in one map-only projection chain over
    * the corpus scan, probes broadcast, per-query window top-k; at
    * warehouse scale the code table is written partitioned BY cell
    * (IvfStorageSpec's contract). Output: (query_id, rank, id, sq_d2). */
  def ivfSqTopK(corpus: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, k: Int,
                cellCodebook: Seq[Seq[Double]], nProbe: Int,
                mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    val decoded = cellAssignmentsTrained(corpus, vecCol, idCol, cellCodebook)
      .select(col("id"), col("cell"),
        sqEncodeCol(col("v"), mins, scales).as("codes"))
      .select(col("id"), col("cell"),
        sqDecodeCol(col("codes"), mins, scales).as("rv"))
    val probes = probeCellsOn(centsOf(corpus.sparkSession, cellCodebook),
        queries, vecCol, idCol, nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sq_d2").asc, col("id").asc)
    decoded.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sq_d2", round(sqD2, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("sq_d2"))
  }

  /** Binary-quantization thresholds: per-dimension means on the exact
    * int64 grid (Σ round(vᵢ·10⁹) summed exactly, ONE double division —
    * the [[KMeans]] centroid-mean contract, so the thresholds are
    * bit-identical across engines with no accumulation-order risk).
    * The 1-bit sign code against the per-dim mean is the classic
    * binary-quantization baseline (Charikar 2002 sign-random-projection
    * family; modern vector stores ship exactly this + rescoring). */
  def bqTrain(corpus: DataFrame, vecCol: String,
              idCol: String): Seq[Double] = {
    val c = corpus.select(toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    c.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(round(col("x") * lit(1000000000.0), 0).cast(LongType)).as("s"),
        count(lit(1)).as("n"))
      .orderBy("i").collect()
      .map(r => r.getLong(1).toDouble / (r.getLong(2) * 1000000000L).toDouble)
      .toSeq
  }

  /** Pack the sign bits (vᵢ > thrᵢ) into 32-dim words — compiled
    * constant-shift adds, so the per-row code is ⌈dim/32⌉ longs and the
    * pairwise stage is XOR+popcount, never a per-dim loop. */
  private def bqWords(v: Column, thr: Seq[Double]): Seq[Column] =
    thr.indices.grouped(32).map { idxs =>
      idxs.map(i => when(element_at(v, i + 1) > lit(thr(i)),
          lit(1L << (i % 32))).otherwise(lit(0L)))
        .reduce(_ + _)
    }.toSeq

  /** Hamming top-k over the 1-bit codes: 32x compression vs floats,
    * candidate ranking by popcount of XORed words (round-free integer
    * arithmetic — exact on any engine), hamming ASC with id tiebreak.
    * Output: (query_id, rank, id, hamming). The production use is the
    * SHORTLIST stage of [[bqRerankTopK]]; ranking quality of raw
    * 1-bit hamming alone is the lowest point of the compression
    * family, which is exactly why the rescore stage exists. */
  def bqTopK(corpus: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int,
             thresholds: Seq[Double]): DataFrame = {
    val nw = (thresholds.length + 31) / 32
    def coded(df: DataFrame, idAs: String, prefix: String): DataFrame = {
      val c = df.select(col(idCol).as(idAs), toDoubleArray(col(vecCol)).as("v"))
        .filter(nonDegenerate(col("v")))
      val ws = bqWords(col("v"), thresholds)
      c.select(col(idAs) +: ws.zipWithIndex.map {
        case (w, i) => w.as(s"$prefix$i") }: _*)
    }
    val cc = coded(corpus, "id", "cw")
    val qc = coded(queries, "query_id", "qw")
    val hamming = (0 until nw).map(i =>
      bit_count(col(s"cw$i").bitwiseXOR(col(s"qw$i")))).reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("id").asc)
    cc.join(broadcast(qc), col("id") =!= col("query_id"))
      .withColumn("hamming", hamming.cast(LongType))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("hamming"))
  }

  /** Binary-quantized retrieval + exact rerank — the modern vector-DB
    * default (1-bit codes prune the corpus at 32x compression, then
    * ONLY the shortlist's full vectors are read for an exact-cosine
    * rescore): hamming shortlist via [[bqTopK]], rerank via the shared
    * two-stage kernel. Same scale shape as [[pqRerankTopK]]. */
  def bqRerankTopK(corpus: DataFrame, queries: DataFrame,
                   vecCol: String, idCol: String, k: Int, shortlist: Int,
                   thresholds: Seq[Double]): DataFrame =
    pqRerankOn(corpus, queries, vecCol, idCol, k,
      bqTopK(corpus, queries, vecCol, idCol, k = shortlist, thresholds)
        .select(col("query_id"), col("id")), shortlist)

  /** (id, cell, rv) — every vector's coarse cell plus its RESIDUAL
    * against the assigned centroid: the IVFADC encoding input and the
    * relation the residual PQ codebook trains on. One map-only
    * projection chain (NearestCellExpr then CellResidualExpr, both
    * literal-codebook compiled calls — zero shuffle at any size). No
    * rounding grid: the subtraction of identical doubles is identical
    * in both engines. */
  def cellResiduals(corpus: DataFrame, vecCol: String, idCol: String,
                    cellCodebook: Seq[Seq[Double]]): DataFrame =
    cellAssignmentsTrained(corpus, vecCol, idCol, cellCodebook)
      .select(col("id"), col("cell"),
        VectorExpressions.cellResidual(col("v"), col("cell"), cellCodebook)
          .as("rv"))

  /** IVF-PQ with RESIDUAL encoding — IVFADC proper (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search" §IV-A; the
    * faiss IndexIVFPQ default): each vector PQ-encodes its residual
    * v − centroid(cell(v)) instead of the raw vector. Residuals
    * cluster near the origin with the inter-cell structure removed, so
    * the same PQ bit budget spends its centroids on LOCAL detail — the
    * published quality step past e09's raw-vector codes. The price:
    * a query's ADC table now depends on the probed cell (the query
    * residual differs per cell), so the driver builds |queries|×nProbe
    * tables instead of |queries| — still the bounded-batch contract.
    *
    * Plan shape: assignment + residual + PQ encode in ONE map-only
    * projection chain over the corpus scan (three literal-codebook
    * compiled calls, zero shuffle); the probe join is an equi-join on
    * cell against the broadcast (query_id, cell, dt) tables; top-k via
    * the per-query window. At warehouse scale the code table is
    * written partitioned BY cell exactly as e07 (IvfStorageSpec). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
                        vecCol: String, idCol: String, k: Int,
                        cellCodebook: Seq[Seq[Double]], nProbe: Int,
                        m: Int, pqCodebook: Seq[Seq[Double]]): DataFrame = {
    val dim = pqCodebook.head.length
    val coded = cellResiduals(corpus, vecCol, idCol, cellCodebook)
      .select(col("id"), col("cell"),
        graft.expressions.VectorExpressions
          .pqEncode(col("rv"), pqCodebook, m).as("st"))
      .filter(col("st").isNotNull)
      .select(col("id"), col("cell"), col("st.codes").as("codes"))
    val probeRows = probeCellsOn(centsOf(corpus.sparkSession, cellCodebook),
        queries, vecCol, idCol, nProbe)
      .select(col("query_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val qVecs = queries
      .select(col(idCol).cast(LongType).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val spark = queries.sparkSession
    import spark.implicits._
    val tables = probeRows.toSeq.flatMap { case (qid, cell) =>
      qVecs.get(qid).map { qv =>
        require(qv.length == dim,
          s"query $qid has dim ${qv.length}, codebook has $dim")
        val cent = cellCodebook(cell.toInt)
        val qr = new Array[Double](dim)
        var i = 0
        while (i < dim) { qr(i) = qv(i) - cent(i); i += 1 }
        (qid, cell, adcTableFor(qr, pqCodebook, m).toSeq)
      }
    }.toDF("query_id", "cell", "dt")
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("id").asc)
    coded.join(broadcast(tables), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc_d2", round(adcScore(m, pqCodebook.length), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("adc_d2"))
  }

  /** Two-stage retrieval — PQ shortlist + exact rerank (the standard
    * production ANN shape: ADC over compressed codes prunes the corpus
    * to `shortlist` candidates per query, then ONLY those candidates'
    * full vectors are read for an exact-cosine rerank to top-`k`).
    *
    * Scale shape: stage 1 is [[pqAdcTopK]] — bandwidth-bound on ~2% of
    * the raw bytes; stage 2 joins the (|queries| × shortlist)-row
    * candidate relation back to the corpus ON ID — a semi-join-sized
    * probe, broadcastable whenever the query batch is bounded, so the
    * full-width vectors are fetched for shortlist rows only, never
    * scanned wholesale. Rerank cost is |queries| × shortlist exact
    * kernels — independent of corpus size.
    */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame,
                   vecCol: String, idCol: String, k: Int, shortlist: Int,
                   m: Int, centroidIds: Seq[Long]): DataFrame =
    pqRerankOn(corpus, queries, vecCol, idCol, k,
      pqAdcTopK(corpus, queries, vecCol, idCol,
        k = shortlist, m = m, centroidIds = centroidIds)
        .select(col("query_id"), col("id")), shortlist)

  /** Shortlist + exact rerank over an EXPLICIT (trained) PQ codebook —
    * same two-stage shape as [[pqRerankTopK]]. */
  def pqRerankTopKTrained(corpus: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String, k: Int,
                          shortlist: Int, m: Int,
                          codebook: Seq[Seq[Double]]): DataFrame =
    pqRerankOn(corpus, queries, vecCol, idCol, k,
      pqAdcTopKTrained(corpus, queries, vecCol, idCol,
        k = shortlist, m = m, codebook = codebook)
        .select(col("query_id"), col("id")), shortlist)

  private def pqRerankOn(corpus: DataFrame, queries: DataFrame,
                         vecCol: String, idCol: String, k: Int,
                         short: DataFrame, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val c = corpus.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
    short.join(c, Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_r", round(VectorExpressions.cosine(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_r").as("cosine"))
  }

  /** Random-hyperplane LSH bucket key (8-bit sketch by default): the
    * scale path for near-dup joins — only same-bucket pairs compared. */
  def lshBuckets(df: DataFrame, vecCol: String, idCol: String,
                 nBits: Int = 8, dim: Int = 64): DataFrame =
    df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
      .withColumn("bucket", concat_ws("",
        (0 until nBits).map(s => hyperplaneBit(col("v"), s, dim).cast(StringType)): _*))

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) at λ = 1/2: retrieve `topN` exact-cosine candidates per
    * query, then greedily select `k` of them, each step taking the
    * candidate maximizing relevance − max-similarity-to-already-selected
    * — the diverse-retrieval shape RAG serving reaches for when the
    * top-k collapses onto near-duplicate passages.
    *
    * Determinism: both cosines live as MICRO-UNIT integers
    * (floor(round(cos,6)·1e6 + 0.5) — the t11 floor(x+0.5) contract one
    * scale down), so at λ = 1/2 the MMR objective argmax is an exact
    * integer difference rel_u − max(sim_u) with id-asc tie-break; every
    * greedy step replays in SQL as a materialized stage (the q51/t20
    * iterative-CTE pattern).
    *
    * Scale shape: candidates come from [[bruteForceTopK]] (broadcast
    * query batch, no corpus shuffle; swap in any trained index for the
    * shortlist — the greedy stage only sees (query, candidate) rows).
    * The candidate-pair sim relation is |queries| × topN² rows — batch-
    * bounded, built ONCE and localCheckpointed (it feeds every greedy
    * step); each of the k steps is one groupBy over that relation plus
    * a per-query argmax window. Nothing in the loop touches the corpus.
    *
    * Output: (query_id, rank 1..k, id, rel_u, score_u) — score_u of
    * rank 1 is its relevance (nothing selected yet). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, vecCol: String,
                idCol: String, topN: Int, k: Int): DataFrame = {
    require(k >= 1 && topN >= k, s"need 1 <= k <= topN; got k=$k topN=$topN")
    def micro(c: Column): Column = floor(c * 1e6 + 0.5).cast(LongType)
    val cands = bruteForceTopK(corpus, queries, vecCol, idCol, topN)
      .select(col("query_id"), col("id"), micro(col("cosine")).as("rel_u"))
      .localCheckpoint(false)
    val cvecs = cands.select("query_id", "id")
      .join(corpus.select(col(idCol).as("id"),
        toDoubleArray(col(vecCol)).as("v")), Seq("id"))
    val cp = cvecs.select(col("query_id"), col("id").as("a_id"), col("v").as("av"))
      .join(cvecs.select(col("query_id"), col("id").as("b_id"), col("v").as("bv")),
        Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        micro(round(VectorExpressions.cosine(col("av"), col("bv")), 6))
          .as("sim_u"))
      .localCheckpoint(false)
    val firstW = Window.partitionBy("query_id")
      .orderBy(col("rel_u").desc, col("id").asc)
    // each loop level references `selected` THREE times (max-sim join,
    // anti-join, union) — without a lineage cut the plan re-evaluates
    // the previous level per reference, 3^k-fold (the q51-oracle
    // MATERIALIZED lesson, Spark-side: measured 6.2 -> ~1 s on the
    // driver batch). The relation is k·|queries| rows — tiny.
    var selected = cands
      .withColumn("rn", row_number().over(firstW)).filter(col("rn") === 1)
      .select(col("query_id"), col("id"), col("rel_u"),
        lit(1L).as("rank"), col("rel_u").as("score_u"))
      .localCheckpoint(false)
    for (i <- 2 to k) {
      val sel = selected.select(col("query_id"), col("id").as("b_id"))
      val ms = cp.join(sel, Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id").as("id"))
        .agg(max(col("sim_u")).as("ms"))
      val remaining = cands.join(sel.withColumnRenamed("b_id", "id"),
        Seq("query_id", "id"), "left_anti")
      val stepW = Window.partitionBy("query_id")
        .orderBy((col("rel_u") - col("ms")).desc, col("id").asc)
      val pick = remaining.join(ms, Seq("query_id", "id"))
        .withColumn("rn", row_number().over(stepW)).filter(col("rn") === 1)
        .select(col("query_id"), col("id"), col("rel_u"),
          lit(i.toLong).as("rank"), (col("rel_u") - col("ms")).as("score_u"))
      selected = selected.unionByName(pick).localCheckpoint(false)
    }
    selected.select("query_id", "rank", "id", "rel_u", "score_u")
  }

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher, SIGIR 2009)
    * — the standard hybrid-retrieval combiner: two ranked lists over
    * the same id space (canonically a sparse/BM25 list and a dense/
    * vector list) fuse by score(d) = Σ 1/(kk + rank_i(d)), which
    * rewards ids ranked by BOTH retrievers without comparing their
    * incommensurable raw scores. Contributions are exact integer
    * units — floor(10^9 / (kk + rank)) — so the fused ordering is
    * engine-exact (the t11/t19 integer-units contract); an id absent
    * from a list contributes 0 there and keeps a NULL rank column.
    * Deterministic tie-break (rrf_u DESC, id).
    *
    * Scale shape: the inputs are top-N BOUNDED lists (the expensive
    * part is the upstream retrievers, verified separately), so the
    * fusion is a full-outer join + one window over ≤ 2N rows —
    * broadcast-sized at any corpus scale.
    *
    * Inputs: `a`, `b` each with (idCol, rankCol); ranks are 1-based.
    * Output: (id, rank_a, rank_b, rrf_u, fused_rank). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
              kk: Int = 60): DataFrame = {
    // kk >= 1 also keeps the div denominator nonzero for rank-1 rows
    require(kk >= 1, s"rrf kk must be >= 1, got $kk")
    // loud failure on a 0-based (or negative) rank list: a rank-0 row
    // under integer div would otherwise mis-weight silently (NULL
    // ranks — id absent from one list — pass, that's the contract)
    def checked(c: Column): Column = when(c < 1,
      raise_error(concat(lit("rrfFuse: ranks must be 1-based, got "),
        c.cast(StringType)))).otherwise(c)
    val la = a.select(col(idCol).as("id"),
      checked(col(rankCol)).as("rank_a"))
    val lb = b.select(col(idCol).as("id"),
      checked(col(rankCol)).as("rank_b"))
    la.join(lb, Seq("id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000000 div ($kk + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($kk + rank_b)"), lit(0L)))
      .withColumn("fused_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_u").desc, col("id"))).cast(LongType))
      .select(col("id"), col("rank_a"), col("rank_b"), col("rrf_u"),
        col("fused_rank"))
  }

  // -------------------------------------------------------------------
  // Graph-family ANN: NSW navigable-small-world build + beam search
  // (Malkov et al., Inf. Systems 2014; the flat-graph core of HNSW,
  // Malkov & Yashunin TPAMI 2018) — the production ANN family the
  // cell/code families cannot stand in for: search cost scales with
  // beam width × hops × degree, independent of any cell population.
  // -------------------------------------------------------------------

  /** The micro-unit cosine every graph stage ranks on:
    * floor(round(cos, 6)·1e6 + 0.5) as a Long — the exact-integer key
    * contract shared with [[mmrRerank]], so frontier selection, edge
    * ranking and the final top-k replay bit-for-bit in SQL. */
  private def microCos(a: Column, b: Column): Column =
    floor(round(VectorExpressions.cosine(a, b), 6) * 1e6 + 0.5)
      .cast(LongType)

  /** Deterministic kNN-graph build, the NSW way but batch: candidate
    * pairs from `bands` independent random-hyperplane sketches (band b
    * uses seeds [b·nBits, (b+1)·nBits) of the [[graft.functions
    * .GraftFunctions.hyperplane]] family — band 0 with nBits=8 IS the
    * e03 bucket pipeline), then each node keeps its `degree` best
    * co-bucketed neighbors by micro-unit cosine (ties to the smaller
    * id). Multiple bands give each node candidates from several
    * independent space cuts — the long-range links that make the walk
    * navigable. Scale shape: the self-join is banded (bucket-bounded,
    * never all-pairs), the per-src top-`degree` is one shuffle keyed
    * by src, and the result is |corpus|·degree skinny edge rows.
    * Output: (src, dst, cos_u). */
  def nswGraph(corpus: DataFrame, vecCol: String, idCol: String,
               nBits: Int, bands: Int, degree: Int,
               dim: Int = 64): DataFrame = {
    require(nBits >= 1 && bands >= 1 && degree >= 1,
      s"need nBits/bands/degree >= 1; got $nBits/$bands/$degree")
    val e = corpus.select(col(idCol).as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
    // Build plan left in the round-17 shape DELIBERATELY (r18
    // measured two rewrites and both lost): (a) per-band top-degree
    // windows before the shuffle — lossless, but WindowGroupLimit's
    // partial mode needs a SORT of every scored pair inside the join
    // stage, and sorting the O(Σ bucket²) relation costs more than
    // hash-deduping it (2.44 s → 4.42 s at sf0.1); (b) collapsing
    // distinct+window into repartition(src)+dropDuplicates — loses
    // distinct()'s map-side partial aggregation AND the window's
    // map-side WindowGroupLimit prune, which together keep both
    // exchanges small. The hash-distinct never sorts; the window's
    // rank≤degree filter is pushed down map-side by Spark's
    // WindowGroupLimit, so the src exchange only carries ~degree rows
    // per (src, partition).
    val bucketed = (0 until bands).map { b =>
      e.withColumn("bucket", concat(lit(s"$b:"), concat_ws("",
        (0 until nBits).map(s =>
          hyperplaneBit(col("v"), b * nBits + s, dim)
            .cast(StringType)): _*)))
    }.reduce(_ unionByName _)
    val cand = bucketed
      .select(col("bucket"), col("id").as("src"), col("v").as("sv"))
      .join(bucketed.select(col("bucket"), col("id").as("dst"),
        col("v").as("dv")), Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        microCos(col("sv"), col("dv")).as("cos_u"))
      .distinct() // a pair co-bucketed in several bands is ONE candidate
    val w = Window.partitionBy("src")
      .orderBy(col("cos_u").desc, col("dst").asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= degree)
      .select(col("src"), col("dst"), col("cos_u"))
  }

  /** NSW beam search over [[nswGraph]]: from ONE global entry point
    * (the corpus id minimizing md5(id) — query-independent, so the
    * entry is part of the index, not the query), expand `hops` rounds
    * of the frontier's `beamWidth` best visited nodes through the edge
    * list, then answer top-`k` of everything visited (self excluded).
    * Fixed `hops` instead of a convergence test keeps the walk
    * replayable as unrolled SQL stages (the t33/t36 unroll contract).
    *
    * Determinism: every ranking — frontier, final — orders by
    * micro-unit cosine desc, id asc; duplicate visits of one node
    * carry identical rows, so the distinct is order-free.
    *
    * Scale shape: state is |queries| × (1 + hops·beamWidth·degree)
    * rows AT MOST — never corpus-sized; each hop is one
    * broadcast-frontier map-side probe of the edge list plus one
    * hash-join against the corpus for the new nodes' vectors, and the
    * per-hop localCheckpoint cuts the iterative lineage exactly as
    * q51's power steps do. The exact-recall audit (`hit`) is the only
    * corpus × queries stage, and it is the e01 broadcast shape.
    *
    * Output: (query_id, rank 1..k, id, cos_u, hit, visited). */
  def nswBeamSearch(corpus: DataFrame, queries: DataFrame,
                    vecCol: String, idCol: String,
                    nBits: Int, bands: Int, degree: Int,
                    beamWidth: Int, hops: Int, k: Int,
                    dim: Int = 64): DataFrame =
    nswBeamSearchWithEdges(corpus, queries, vecCol, idCol,
      nswGraph(corpus, vecCol, idCol, nBits, bands, degree, dim),
      beamWidth, hops, k)

  /** [[nswBeamSearch]] over a CALLER-SUPPLIED edge list — the serving
    * path for a maintained graph ([[nswUpsertEdges]]): the index is
    * storage, the walk only reads it. */
  def nswBeamSearchWithEdges(corpus: DataFrame, queries: DataFrame,
                             vecCol: String, idCol: String,
                             edgeList: DataFrame,
                             beamWidth: Int, hops: Int, k: Int): DataFrame = {
    require(beamWidth >= 1 && hops >= 1 && k >= 1,
      s"need beamWidth/hops/k >= 1; got $beamWidth/$hops/$k")
    val e = corpus.select(col(idCol).as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
      .localCheckpoint(false) // streamed per hop — decode the source once
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
      .localCheckpoint(false) // reused per hop — scan the source once
    val edges = edgeList.localCheckpoint(false)
    val entry = e.orderBy(md5(col("id").cast(StringType)), col("id"))
      .limit(1)
    val fw = Window.partitionBy("query_id")
      .orderBy(col("cos_u").desc, col("id").asc)
    var state = q.crossJoin(broadcast(entry))
      .select(col("query_id"), col("id"),
        microCos(col("v"), col("qv")).as("cos_u"))
      .repartition(col("query_id")) // hop 1's window needs no exchange
      .localCheckpoint(false)
    for (_ <- 1 to hops)
      state = nswHop(state, edges, e, q, beamWidth)
    val visited = state.groupBy("query_id")
      .agg(count(lit(1)).as("visited"))
    val exact = bruteForceTopK(corpus, queries, vecCol, idCol, k)
      .select(col("query_id"), col("id"), lit(1L).as("hit"))
    state.filter(col("id") =!= col("query_id"))
      .withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= k)
      .join(exact, Seq("query_id", "id"), "left")
      .join(visited, Seq("query_id"))
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_u"), coalesce(col("hit"), lit(0L)).as("hit"),
        col("visited"))
  }

  /** HIERARCHICAL NSW SEARCH — the full HNSW shape (Malkov & Yashunin,
    * TPAMI 2018): walk a cascade of graphs coarse→fine, each level's
    * walk seeded by the PREVIOUS level's per-query best node, the
    * global entry fixed at the coarsest level's md5-min member. The
    * hierarchy is what makes graph search log-hop at scale: the
    * coarse levels cross the corpus in O(log n) cheap hops (tiny
    * graphs, narrow beams) and the bottom level only ever refines a
    * local neighborhood, so the flat walk's diameter-bound hop count
    * never applies to the full graph. Levels must be NESTED (every
    * coarse node is a member of every finer level, the standard HNSW
    * assignment) so a seed node always exists in the next graph.
    *
    * `levels` runs coarse→fine as (edges, beamWidth, hops);
    * `entryMembers` is the coarsest level's member ids (column `id`).
    * Output: the e40 shape — (query_id, rank, id, cos_u, hit,
    * visited), `visited` counting distinct nodes touched across ALL
    * levels (each level's cumulative state absorbs its seed, so the
    * union of level finals is the full visit set). */
  def hnswSearch(corpus: DataFrame, queries: DataFrame,
                 vecCol: String, idCol: String,
                 entryMembers: DataFrame,
                 levels: Seq[(DataFrame, Int, Int)], k: Int): DataFrame = {
    require(levels.nonEmpty, "need at least one level")
    require(k >= 1 && levels.forall { case (_, w, h) => w >= 1 && h >= 1 },
      "beamWidth/hops/k must be >= 1")
    val e = corpus.select(col(idCol).as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v")))
      .localCheckpoint(false) // streamed per hop — decode the source once
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv")))
      .localCheckpoint(false) // reused per hop — scan the source once
    val fw = Window.partitionBy("query_id")
      .orderBy(col("cos_u").desc, col("id").asc)
    val entry = e.join(entryMembers.select(col("id")), Seq("id"))
      .orderBy(md5(col("id").cast(StringType)), col("id")).limit(1)
    var state = q.crossJoin(broadcast(entry))
      .select(col("query_id"), col("id"),
        microCos(col("v"), col("qv")).as("cos_u"))
      .repartition(col("query_id")) // hop 1's window needs no exchange
      .localCheckpoint(false)
    val finals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    levels.zipWithIndex.foreach { case ((edgeList, wW, hH), li) =>
      val edges = edgeList.localCheckpoint(false)
      if (li > 0) // descend: seed from the previous level's best
        state = state.withColumn("__rn", row_number().over(fw))
          .filter(col("__rn") === 1)
          .select(col("query_id"), col("id"), col("cos_u"))
          .localCheckpoint(false)
      for (_ <- 1 to hH) state = nswHop(state, edges, e, q, wW)
      finals += state
    }
    val visited = finals.map(_.select(col("query_id"), col("id")))
      .reduce(_ unionByName _).distinct()
      .groupBy("query_id").agg(count(lit(1)).as("visited"))
    val exact = bruteForceTopK(corpus, queries, vecCol, idCol, k)
      .select(col("query_id"), col("id"), lit(1L).as("hit"))
    finals.last.filter(col("id") =!= col("query_id"))
      .withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= k)
      .join(exact, Seq("query_id", "id"), "left")
      .join(visited, Seq("query_id"))
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("id"), col("cos_u"), coalesce(col("hit"), lit(0L)).as("hit"),
        col("visited"))
  }

  /** INCREMENTAL NSW MAINTENANCE — insert a delta batch into an
    * existing graph WITHOUT rebuilding it: each new node takes its
    * `degree` best co-bucketed neighbors (old or new), and every base
    * node co-bucketed with a new node has the newcomers merged into
    * its edge list, re-capped at `degree` (the HNSW insert rule,
    * batch-deterministic). Under the top-degree-by-cosine rule this is
    * EXACTLY the batch rebuild: a base candidate dropped by the base
    * build is dominated by `degree` kept candidates and can never
    * re-enter any top-`degree` set, so merge-and-recap loses nothing
    * — NswSpec pins upsert ≡ [[nswGraph]] on the union, and the e43
    * gate proves it cross-engine (the Spark side runs THIS path, the
    * oracle replays the batch build; hash equality is the maintenance
    * contract). Cost is O(delta × bucket population + affected base
    * rows), never O(rebuild): only base nodes co-bucketed with a
    * newcomer are touched. */
  def nswUpsertEdges(base: DataFrame, delta: DataFrame,
                     vecCol: String, idCol: String,
                     nBits: Int, bands: Int, degree: Int,
                     dim: Int = 64): DataFrame = {
    val gBase = nswGraph(base, vecCol, idCol, nBits, bands, degree, dim)
    def bucketed(df: DataFrame): DataFrame = {
      val e = df.select(col(idCol).as("id"),
          toDoubleArray(col(vecCol)).as("v"))
        .filter(nonDegenerate(col("v")))
      (0 until bands).map { b =>
        e.withColumn("bucket", concat(lit(s"$b:"), concat_ws("",
          (0 until nBits).map(s =>
            hyperplaneBit(col("v"), b * nBits + s, dim)
              .cast(StringType)): _*)))
      }.reduce(_ unionByName _)
    }
    val allB = bucketed(base.unionByName(delta))
    val deltaIds = delta.select(col(idCol).as("id")).distinct()
    val dB = allB.join(deltaIds, Seq("id"))
    // pairs with a NEW endpoint, in both directions: (new -> anything)
    // seeds the newcomers' lists, (base -> new) feeds the reverse merge
    val touchingNew = allB
      .select(col("bucket"), col("id").as("src"), col("v").as("sv"))
      .join(dB.select(col("bucket"), col("id").as("dst"),
        col("v").as("dv")), Seq("bucket"))
      .filter(col("src") =!= col("dst"))
    // Plan left in the round-17 shape DELIBERATELY — the r18 rewrite
    // attempts (per-arm pre-cap windows; collapsing the distincts into
    // one repartition+dropDuplicates) both measured SLOWER at sf0.1
    // (4.72 s → 5.4–7.9 s): the distincts' map-side partial
    // aggregation plus the final window's WindowGroupLimit pushdown
    // already keep every exchange small, and the pre-cap's sort
    // costs more than the hash dedup it avoids (see nswGraph's note).
    val candNew = touchingNew
      .select(col("src"), col("dst"),
        microCos(col("sv"), col("dv")).as("cos_u"))
      .unionByName(touchingNew.select(col("dst").as("src"),
        col("src").as("dst"),
        microCos(col("sv"), col("dv")).as("cos_u")))
      .distinct()
    val w = Window.partitionBy("src")
      .orderBy(col("cos_u").desc, col("dst").asc)
    // newcomers: rank their candidates directly; base nodes: merge the
    // kept base list with the new candidates and re-cap
    val newSrc = candNew.join(deltaIds.withColumnRenamed("id", "src"),
      Seq("src"))
    val merged = gBase
      .unionByName(candNew.join(deltaIds.withColumnRenamed("id", "src"),
        Seq("src"), "left_anti"))
      .distinct()
    newSrc.unionByName(merged)
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= degree)
      .select(col("src"), col("dst"), col("cos_u"))
  }

  // ONE beam hop — frontier (top-`beamWidth` visited per query), expand
  // through the edge list, score the new nodes, dedup into the state.
  // Shared by nswBeamSearch and nswOperatingGrid so a hop-semantics
  // change can never fork the grid from the operator it measures.
  // Duplicate expansions (two frontier nodes sharing a neighbor) ride
  // through to the single state-level dedup — at most W·degree rows
  // per query, cheaper than a second shuffle per hop. The state is
  // referenced TWICE per later hop (frontier + union), so each hop
  // MUST end in a localCheckpoint: it is the only cut that makes the
  // state a true plan LEAF. (Measured on this tree: persist — lazy or
  // count()-forced — does NOT get substituted for the re-analyzed
  // subplans, so every hop recomputes the whole chain: 12 s → 70-103 s
  // for the e41 grid at sf0.1. The checkpoint blocks live until the
  // JVM drops the frames — the price of the leaf cut.)
  //
  // r18 optimization (guide §2.4): the hop carries ONE shuffle
  // exchange and zero corpus-sized broadcasts.
  //  - The state stays hash-partitioned by query_id across hops
  //    (checkpoint preserves outputPartitioning), so the frontier
  //    window needs no exchange; the dedup re-keys by query_id once
  //    per hop — HashPartitioning(query_id) satisfies
  //    ClusteredDistribution(query_id, id), so dropDuplicates adds no
  //    second exchange and the NEXT hop's window inherits the layout.
  //    Duplicate visits carry identical deterministic cos_u, so
  //    dropDuplicates(query_id, id) keeps exactly the distinct()'d
  //    row set.
  //  - The corpus-vector attach STREAMS `e` against a broadcast of
  //    the bounded expansion (≤ |q|·W·degree rows) instead of
  //    broadcasting/shuffling the corpus per hop — callers keep `e`
  //    persisted or checkpointed, so the per-hop stream is a cached
  //    scan. (Measured alternative: pre-joining dst vectors into the
  //    edge list removes this probe but materializes a dim-times
  //    wider edge checkpoint — slower for single walks, wash for
  //    grids.)
  //  - `q` is explicitly broadcast: it is a checkpoint/persisted leaf
  //    whose stats the planner may not know (an unhinted plan degrades
  //    to SMJ with two exchanges per hop — measured).
  private def nswHop(state: DataFrame, edges: DataFrame, e: DataFrame,
                     q: DataFrame, beamWidth: Int): DataFrame = {
    val fw = Window.partitionBy("query_id")
      .orderBy(col("cos_u").desc, col("id").asc)
    val frontier = state.withColumn("__rn", row_number().over(fw))
      .filter(col("__rn") <= beamWidth)
      .select(col("query_id"), col("id").as("src"))
    val expanded = broadcast(frontier)
      .join(edges, Seq("src"))
      .select(col("query_id"), col("dst").as("id"))
    val scored = e.join(broadcast(expanded), Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("id"),
        microCos(col("v"), col("qv")).as("cos_u"))
    state.unionByName(scored)
      .repartition(col("query_id"))
      .dropDuplicates("query_id", "id")
      .localCheckpoint(false)
  }

  /** NSW OPERATING GRID — [[nswBeamSearch]]'s (beamWidth × hops × k)
    * cells in the SAME row shape as the cell-family grids
    * ([[ivfFamilyOperatingGrids]]): n_probe := beamWidth, r_shortlist
    * := hops (the graph family's two knobs in the shared slots),
    * recall measured against the [[bruteForceTopKExact]] truth every
    * grid uses, and `scanned_ppm` = visited-node fraction — visited
    * nodes get an exact distance computed, which is precisely what
    * "scanned" charges the cell families for, so the numbers compete
    * honestly in one decision. One graph build and ONE walk per
    * beamWidth serve every (hops, k) cell: the chain snapshots its
    * state at each requested hop count (a prefix walk IS the shorter
    * walk, deterministically). Collects are bounded by
    * |queries|·max(k) (the hit join) — never corpus-shaped.
    * Output: (n_probe, r_shortlist, k, n_queries, n_hits, n_bf,
    * recall_ppm, scanned_ppm). */
  def nswOperatingGrid(corpus: DataFrame, queries: DataFrame,
                       vecCol: String, idCol: String, ks: Seq[Int],
                       nBits: Int, bands: Int, degree: Int,
                       beamWidths: Seq[Int], hopsList: Seq[Int],
                       dim: Int = 64): DataFrame =
    nswGridCore(corpus, None, queries, vecCol, idCol, ks, nBits, bands,
      degree, beamWidths, hopsList, dim)

  /** FILTERED NSW GRID — [[nswOperatingGrid]] under a metadata
    * predicate, with the production filtered-HNSW semantics
    * (Qdrant/Weaviate-style): the walk NAVIGATES the full graph
    * (non-matching nodes still route — deleting them would shatter
    * connectivity exactly when the predicate is selective), and only
    * the ANSWER set is restricted to the survivors. Accordingly:
    *  - the truth is the FILTERED exact top-k (e17's contract — post-
    *    filtering an unfiltered top-k loses recall);
    *  - `scanned_ppm` keeps the FULL corpus denominator and charges
    *    every visited node (non-matching visits still cost a distance
    *    computation), so cells compare to the predicate-pruned exact
    *    scan at `selectivity_ppm` (appended, the e35 contract). */
  def nswFilteredOperatingGrid(corpus: DataFrame, keepIds: DataFrame,
                               queries: DataFrame,
                               vecCol: String, idCol: String, ks: Seq[Int],
                               nBits: Int, bands: Int, degree: Int,
                               beamWidths: Seq[Int], hopsList: Seq[Int],
                               dim: Int = 64): DataFrame =
    nswGridCore(corpus, Some(keepIds), queries, vecCol, idCol, ks, nBits,
      bands, degree, beamWidths, hopsList, dim)

  private def nswGridCore(corpus: DataFrame, keepIds: Option[DataFrame],
                          queries: DataFrame,
                          vecCol: String, idCol: String, ks: Seq[Int],
                          nBits: Int, bands: Int, degree: Int,
                          beamWidths: Seq[Int], hopsList: Seq[Int],
                          dim: Int): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.distinct.size == ks.size,
      s"bad ks $ks")
    require(beamWidths.nonEmpty && beamWidths.forall(_ >= 1) &&
      beamWidths.distinct.size == beamWidths.size,
      s"bad beamWidths $beamWidths")
    require(hopsList.nonEmpty && hopsList.forall(_ >= 1) &&
      hopsList.distinct.size == hopsList.size, s"bad hopsList $hopsList")
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .filter(nonDegenerate(col("v"))).persist()
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .filter(nonDegenerate(col("qv"))).persist()
    val kMax = ks.max
    val ksSorted = ks.sorted
    val edges = nswGraph(corpus, vecCol, idCol, nBits, bands, degree, dim)
      .persist()
    // answer-set restriction + the filtered truth (None = unfiltered)
    val keep = keepIds.map(k =>
      k.select(col(idCol).as("id")).distinct().persist())
    val bfCorpus = keep.map(kp => corpus.join(
        kp.select(col("id").as(idCol)), Seq(idCol))).getOrElse(corpus)
    val bf = bruteForceTopKExact(bfCorpus, queries, vecCol, idCol, kMax)
      .select(col("query_id"), col("id"), col("rank").as("bfr")).persist()
    try {
      val nQ = q.count()
      val nCorpus = e.count()
      val selectivityPpm = keep.map { kp =>
        val nKept = e.join(kp, Seq("id")).count()
        if (nCorpus == 0) 0L else 1000000L * nKept / nCorpus
      }
      val bfAggs = ksSorted.map(kk =>
        coalesce(sum(when(col("bfr") <= kk, 1L).otherwise(0L)), lit(0L)))
      val nBfRow = bf.agg(bfAggs.head, bfAggs.tail: _*).head
      val nBfByK = ksSorted.zipWithIndex
        .map { case (kk, i) => kk -> nBfRow.getLong(i) }.toMap
      val entry = e.orderBy(md5(col("id").cast(StringType)), col("id"))
        .limit(1)
      val fw = Window.partitionBy("query_id")
        .orderBy(col("cos_u").desc, col("id").asc)
      val maxH = hopsList.max
      val rows = beamWidths.sorted.flatMap { w =>
        var state = q.crossJoin(broadcast(entry))
          .select(col("query_id"), col("id"),
            microCos(col("v"), col("qv")).as("cos_u"))
          .repartition(col("query_id")) // hop 1's window: no exchange
        (1 to maxH).flatMap { h =>
          state = nswHop(state, edges, e, q, w)
          if (!hopsList.contains(h)) Nil
          else {
            val visited = state.count()
            val scannedPpm =
              if (nQ == 0 || nCorpus == 0) 0L
              else (BigInt(1000000L) * visited /
                (BigInt(nQ) * nCorpus)).toLong
            // answers come from the visited SURVIVORS (filtered mode);
            // ranked AFTER the restriction, as a filtered serving
            // endpoint would rank what it may return
            val answerable = keep
              .map(kp => state.join(broadcast(kp), Seq("id")))
              .getOrElse(state)
            // bounded: ≤ nQ·kMax rows
            val joined = answerable.filter(col("id") =!= col("query_id"))
              .withColumn("rank",
                row_number().over(fw).cast(LongType))
              .filter(col("rank") <= kMax)
              .join(bf, Seq("query_id", "id"))
              .select(col("rank"), col("bfr")).collect()
            ksSorted.map { kk =>
              val hits = joined
                .count(r => r.getLong(0) <= kk && r.getLong(1) <= kk)
                .toLong
              val nbf = nBfByK(kk)
              (w.toLong, h.toLong, kk.toLong, nQ, hits, nbf,
                if (nbf == 0) 0L else 1000000L * hits / nbf, scannedPpm)
            }
          }
        }
      }
      import spark.implicits._
      val out = rows.toDF("n_probe", "r_shortlist", "k", "n_queries",
        "n_hits", "n_bf", "recall_ppm", "scanned_ppm")
      selectivityPpm.map(s => out.withColumn("selectivity_ppm", lit(s)))
        .getOrElse(out)
    } finally {
      e.unpersist(); q.unpersist(); edges.unpersist(); bf.unpersist()
      keep.foreach(_.unpersist())
    }
  }
}
