package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative graph algorithms beyond the pointer-doubling connected
  * components in [[Dedup]]. First resident: fixed-point PageRank — the
  * host/domain-importance signal web-crawl curation pipelines use as a
  * quality prior (OPIC/harmonic/PageRank centrality in Common-Crawl-style
  * ranking), here in EXACT integer arithmetic so the result is a pure
  * function of the graph — independent of engine, partitioning, and
  * float accumulation order, and therefore hash-replayable in SQL.
  */
object Graph {

  /** Fixed-point PageRank: `iterations` synchronous power steps with
    * damping 85/100 and uniform teleport, all arithmetic in BIGINT
    * "rank units" of 1e-12 (`scale` = 1_000_000_000_000 = total mass).
    *
    * Per step, with integer division `div` throughout:
    *   contrib(u) = ((rank_u * 85) div 100) div outdeg_u
    *   share      = (Σ_{outdeg=0} (rank_u * 85) div 100) div N
    *   rank'(v)   = teleport + share + Σ_{u→v} contrib(u)
    *   teleport   = ((scale * 15) div 100) div N
    *
    * The div-floor truncations leak a few units of mass per step — the
    * documented price of exactness (a float engine leaks ulps instead,
    * nondeterministically). Ranks stay positive and bounded by `scale`,
    * so rank*85 never overflows a long.
    *
    * Scale shape: the rank relation is skinny (node, outdeg, rank) and
    * hash-partitioned by node; each step is ONE shuffle — contributions
    * flow through the edge relation (joined on src, re-keyed by dst,
    * summed with map-side combine), the dangling mass is a 1-row
    * aggregate broadcast back, and the per-step localCheckpoint cuts the
    * iterative lineage so step N's plan doesn't replay steps 1..N-1
    * (same contract as connectedComponents). At a 100-TB edge relation
    * you'd bucket edges BY src so the contrib join never re-shuffles the
    * big side; ranks re-use the edge partitioning across steps.
    *
    * `edges` must carry long columns `src`, `dst` (directed; pass both
    * directions for an undirected graph). Output: (node, rank). */
  def pageRankFixedPoint(edges: DataFrame, iterations: Int,
                         scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && scale >= 1000000L, s"$iterations/$scale")
    val e = edges.select(col("src").cast(LongType).as("src"),
                         col("dst").cast(LongType).as("dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val n = nodes.count() // one bounded driver scalar: sizes the teleport
    val teleport = ((scale * 15L) / 100L) / n
    var ranks = nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(scale / n).as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val contrib = ranks.filter(col("outdeg") > 0)
        .join(e, ranks("node") === e("src"))
        .select(col("dst"), expr("((rank * 85) div 100) div outdeg").as("c"))
      val inflow = contrib.groupBy("dst").agg(sum(col("c")).as("inflow"))
      // dangling mass: a 1-row aggregate, broadcast via cross join (no
      // driver collect in the loop)
      val dang = ranks.filter(col("outdeg") === 0)
        .agg(coalesce(sum(expr("(rank * 85) div 100")), lit(0L)).as("dm"))
      ranks = ranks
        .join(inflow, ranks("node") === inflow("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("outdeg"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L)) +
            expr(s"dm div ${n}L")).as("rank"))
        .localCheckpoint(false)
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Level-synchronous BFS over a child→parent forest — the recursive-
    * CTE capability (hierarchy expansion: org charts, BOMs, category
    * trees) Spark SQL lacks natively, as a bounded fixpoint loop. From
    * the root set, each level joins the remaining edges against the
    * current frontier; levels accumulate (node, root, depth).
    *
    * Scale shape: one equi-join per LEVEL (not per node), keyed by the
    * parent column, with the frontier localCheckpointed so level N's
    * plan doesn't replay levels 1..N−1; total work = Σ level sizes =
    * |reachable nodes|. The loop is driver-bounded by `maxDepth` and
    * FAILS LOUD if the frontier hasn't emptied by then (a silent
    * truncation would misreport depths as coverage).
    *
    * `edges`: (child, parent) longs. `roots`: (node) longs.
    * Output: (node, root, depth) for every reachable node, roots at
    * depth 0. */
  def bfsDepths(edges: DataFrame, roots: DataFrame,
                maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth=$maxDepth")
    val e = edges.select(col("child").cast(LongType).as("child"),
      col("parent").cast(LongType).as("parent")).localCheckpoint(false)
    var frontier = roots
      .select(col("node").cast(LongType).as("node"),
        col("node").cast(LongType).as("root"), lit(0L).as("depth"))
      .localCheckpoint(false)
    var acc = frontier
    var level = 0
    while (level < maxDepth && !frontier.isEmpty) {
      frontier = e.join(frontier, e("parent") === frontier("node"))
        .select(col("child").as("node"), col("root"),
          (col("depth") + 1L).as("depth"))
        .localCheckpoint(false)
      acc = acc.unionByName(frontier)
      level += 1
    }
    require(frontier.isEmpty,
      s"frontier not empty after $maxDepth levels — raise maxDepth")
    acc
  }
}
