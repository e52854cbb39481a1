package graft

import graft.expressions.KmvSketchAgg.kmvDistinct
import graft.functions.GraftFunctions.md5Long
import org.apache.spark.sql.functions._

/** KMV distinct sketch (q16's deterministic HLL replacement): the
  * estimate must be a pure function of the input SET — invariant under
  * partitioning (exercising map-side partial + merge), duplication, and
  * row order — exact below k, and within the ~1/sqrt(k-2) error band
  * above it. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(kmvDistinct(md5Long(col("v").cast("string")), k).as("e"))
      .head.getDouble(0)

  test("below k the sketch IS the distinct set: exact count") {
    val df = (1 to 100).toDF("v")
    assert(estimate(df, 256) == 100.0)
    // duplicates don't move it
    val dup = ((1 to 100) ++ (1 to 100)).toDF("v")
    assert(estimate(dup, 256) == 100.0)
  }

  test("estimate is invariant under partitioning and order") {
    val base = (1 to 20000).toDF("v")
    val e1 = estimate(base.repartition(1), 64)
    val e13 = estimate(base.repartition(13), 64)
    val eShuf = estimate(base.orderBy(md5Long(col("v").cast("string"))), 64)
    assert(e1 == e13 && e13 == eShuf,
      s"merge order must not matter: $e1 / $e13 / $eShuf")
  }

  test("above k the estimate lands in the error band") {
    val n = 20000
    val e = estimate((1 to n).toDF("v"), 256)
    // ~6.3% standard error at k=256; 4 sigma guard band
    assert(math.abs(e - n) / n < 0.25, s"estimate $e vs true $n")
  }

  test("group-by path: per-group sketches stay independent") {
    val df = (1 to 3000).map(i => (i % 3, i)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(kmvDistinct(md5Long(col("v").cast("string")), 2048).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // 1000 distinct per group, under k -> exact per group
    assert(out == Map(0 -> 1000.0, 1 -> 1000.0, 2 -> 1000.0))
  }

  // ------------------------------------------------------------------
  // KMV pair algebra (q52)
  // ------------------------------------------------------------------

  test("pair algebra: exact path gives exact union and intersection") {
    // groups under k=256 -> every estimate is an exact distinct count
    val rows =
      (1 to 100).map(i => ("a", i.toLong)) ++    // a = {1..100}
      (51 to 150).map(i => ("b", i.toLong)) ++   // b = {51..150}, |a∩b|=50
      (1000 to 1049).map(i => ("c", i.toLong))   // c disjoint from both
    val df = rows.toDF("g", "v")
      .select(col("g"), md5Long(col("v").cast("string")).as("h"))
    val out = graft.operators.SketchOps.kmvPairAlgebra(df, "g", "h", 256)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out(("a", "b")) == ((100.0, 100.0, 150.0, 50.0)))
    assert(out(("a", "c")) == ((100.0, 50.0, 150.0, 0.0)))
    assert(out(("b", "c")) == ((100.0, 50.0, 150.0, 0.0)))
  }

  test("pair algebra: estimates invariant under partitioning above k") {
    val rows = (1 to 4000).map(i => (if (i % 2 == 0) "x" else "y", i.toLong))
    val df = rows.toDF("g", "v")
      .select(col("g"), md5Long(col("v").cast("string")).as("h"))
    def go(parts: Int) = graft.operators.SketchOps
      .kmvPairAlgebra(df.repartition(parts), "g", "h", 64)
      .collect().map(r => r.toSeq).toSeq
    assert(go(1) == go(13))
  }

  // ------------------------------------------------------------------
  // Count-min sketch (t18)
  // ------------------------------------------------------------------

  private def cmsRows(df: org.apache.spark.sql.DataFrame, d: Int, w: Int,
                      topK: Int): Map[String, (Long, Long, Long)] =
    graft.operators.TextAnalysis.cmsHeavyHitters(df, "text", d, w, topK)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("CMS never underestimates, and is exact when buckets are wide") {
    val docs = Seq.tabulate(50) { i =>
      // skewed stream: 'alpha' dominates, tail of rarer tokens
      (i.toLong, ("alpha " * 10 + s"tok$i " + s"tok${i % 7} beta").trim)
    }.toDF("doc_id", "text")
    val tight = cmsRows(docs, 4, 16, 10)   // collisions guaranteed
    tight.foreach { case (tok, (exact, est, err)) =>
      assert(est >= exact, s"$tok: CMS underestimated $est < $exact")
      assert(err == est - exact)
    }
    val wide = cmsRows(docs, 4, 1 << 16, 10) // ~no collisions at 58 tokens
    wide.foreach { case (tok, (exact, est, err)) =>
      assert(est == exact && err == 0, s"$tok: $est != $exact with wide w")
    }
    assert(wide("alpha")._1 == 500L)
  }

  test("CMS estimates are invariant under partitioning (mergeable sums)") {
    val docs = (1 to 200).map(i => (i.toLong, s"a b c tok${i % 13}"))
      .toDF("doc_id", "text")
    val one = cmsRows(docs.repartition(1), 4, 32, 8)
    val many = cmsRows(docs.repartition(11), 4, 32, 8)
    assert(one == many)
  }
}
