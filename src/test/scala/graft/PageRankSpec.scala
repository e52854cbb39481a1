package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** [[Graph.pageRankFixedPoint]] — the integer-arithmetic contract: the
  * distributed result must equal a sequential reference to the exact
  * rank unit, on graphs with dangling nodes, under any partitioning. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: same integer ops, same step order. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val teleport = ((scale * 15L) / 100L) / n
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val damped = nodes.map(v => v -> (rank(v) * 85L) / 100L).toMap
      val dang = nodes.filterNot(out.contains).map(damped).sum
      val share = dang / n
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => damped(s) / out(s) }.sum
      }
      rank = nodes.map(v =>
        v -> (teleport + share + inflow.getOrElse(v, 0L))).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int): Map[Long, Long] =
    Graph.pageRankFixedPoint(
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the sequential reference exactly, dangling node included") {
    // 1 -> 2 -> 3 -> 1 cycle, 4 feeds 2 and 3, 5 is DANGLING (in-only)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 2L, 4L -> 3L,
      2L -> 5L)
    val got = run(edges, 6, 3)
    val want = reference(edges, 6)
    assert(got === want)
    // sanity on the shape: the cycle nodes outrank the teleport-only
    // source, and the dangling sink got real mass
    assert(got(2L) > got(4L) && got(5L) > 0L)
  }

  test("partition count cannot move a single rank unit") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    val want = reference(edges, 5)
    assert(run(edges, 5, 1) === want)
    assert(run(edges, 5, 17) === want)
  }

  test("mass stays conserved up to documented div-floor leakage") {
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L, 2L -> 3L)
    val scale = 1000000000000L
    val total = run(edges, 8, 2).values.sum
    // each step floors at most (2 divisions + teleport) per node+edge;
    // leakage stays far under 1e-6 of the mass
    assert(total <= scale && total > scale - 1000000L, s"total=$total")
  }

  test("warm start: stationary on an unchanged graph, converges faster on a grown one") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def randEdges(n: Int, nodes: Int) = (1 to n)
      .map(_ => (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter(e => e._1 != e._2).distinct
    val g1 = randEdges(300, 50)
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = Graph.pageRankFixedPoint(g1.toDF("src", "dst"), 8)
      .localCheckpoint(false)
    val coldM = ranksOf(cold)
    def dist(a: Map[Long, Long], b: Map[Long, Long]): Long =
      (a.keySet ++ b.keySet).toSeq
        .map(k => math.abs(a.getOrElse(k, 0L) - b.getOrElse(k, 0L))).sum
    // unchanged graph: one warm step stays within fixed-point wobble
    val warm1 = ranksOf(Graph.pageRankWarmStart(g1.toDF("src", "dst"), cold, 1))
    assert(dist(warm1, coldM) < dist(ranksOf(
      Graph.pageRankFixedPoint(g1.toDF("src", "dst"), 1)), coldM) / 10,
      "a warm step on an unchanged graph must sit far closer to the " +
        "fixed point than a cold single step")
    // grown graph: 2 warm steps vs 2 cold steps, judged against the
    // grown graph's own 8-step reference
    val g2 = (g1 ++ randEdges(60, 60)).distinct
    val ref2 = ranksOf(Graph.pageRankFixedPoint(g2.toDF("src", "dst"), 8))
    val warm2 = ranksOf(Graph.pageRankWarmStart(g2.toDF("src", "dst"), cold, 2))
    val cold2 = ranksOf(Graph.pageRankFixedPoint(g2.toDF("src", "dst"), 2))
    assert(dist(warm2, ref2) < dist(cold2, ref2),
      s"warm ${dist(warm2, ref2)} should beat cold ${dist(cold2, ref2)}")
  }

  test("empty edge relation yields empty ranks, not a divide-by-zero") {
    // probe-found (ScaleProbe host_rank 64x): a df-capped syndication
    // build over a fully cross-duplicated corpus legitimately produces
    // ZERO edges; the rank must be an empty relation the downstream
    // gate coalesces to rank 0, never an ArithmeticException
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.pageRankFixedPoint(empty, 6).count() === 0L)
    val docs = Seq(
      (1L, "the same boilerplate text repeated everywhere ok", "h1"),
      (2L, "the same boilerplate text repeated everywhere ok", "h2"),
      (3L, "the same boilerplate text repeated everywhere ok", "h3"))
      .toDF("doc_id", "text", "source")
    // cap of 2 hosts/shingle excludes every (3-host) shingle -> no graph
    val ranks = graft.operators.Graph.hostSyndicationRank(
      docs, "text", "source", maxHostsPerShingle = 2)
    assert(ranks.count() === 0L)
  }

  test("bfsDepths: forest depths exact, loud failure on truncation") {
    import spark.implicits._
    // forest: 1 and 2 roots; chain 1<-10<-100<-1000, bush under 2
    val edges = Seq(10L -> 1L, 100L -> 10L, 1000L -> 100L,
      20L -> 2L, 21L -> 2L, 200L -> 20L).toDF("child", "parent")
    val roots = Seq(1L, 2L).toDF("node")
    val got = graft.operators.Graph.bfsDepths(edges, roots, maxDepth = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (1L, 0L), 2L -> (2L, 0L),
      10L -> (1L, 1L), 20L -> (2L, 1L), 21L -> (2L, 1L),
      100L -> (1L, 2L), 200L -> (2L, 2L), 1000L -> (1L, 3L)))
    // depth cap below the true depth must fail loud, not truncate
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.bfsDepths(edges, roots, maxDepth = 2).count()
    }
    assert(e.getMessage.contains("frontier not empty"))
  }
}
