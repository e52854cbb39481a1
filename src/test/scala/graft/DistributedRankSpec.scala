package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
  }

  private def assertEqualToWindow(df: org.apache.spark.sql.DataFrame,
                                  numParts: Int): Unit = {
    val got = DistributedRank.rankAndCount(df, "g", Seq("v", "id"), numParts)
      .select("id", "g", "v", "rn", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val want = windowForm(df).select("id", "g", "v", "rn", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("rankAndCount == window form, multi-group") {
    val df = (1L to 200L).map(i =>
        (i, if (i % 3 == 0) "fr" else if (i % 7 == 0) "de" else "en",
          (i * 37 % 101).toDouble / 10.0))
      .toDF("id", "g", "v")
    assertEqualToWindow(df, 8)
  }

  test("rankAndCount == window form under HEAVY skew (one dominant group)") {
    // the shape that kills the window plan: 95% of rows in one group,
    // which necessarily spans many range partitions — ranks must still
    // compose exactly across them
    val df = (1L to 1000L).map(i =>
        (i, if (i % 20 == 0) "rare" else "en", (i * 13 % 997).toDouble))
      .toDF("id", "g", "v")
    assertEqualToWindow(df, 16)
  }

  test("dominant group spans multiple partitions (no single-task stage)") {
    val df = (1L to 1000L).map(i => (i, "en", (i * 13 % 997).toDouble))
      .toDF("id", "g", "v")
    val ranked = DistributedRank.rankAndCount(df, "g", Seq("v", "id"), 16)
    // the one group's rows land in >1 partition — the property the
    // per-group window can never have
    val partsUsed = ranked.select(spark_partition_id()).distinct().count()
    assert(partsUsed > 1,
      s"dominant group confined to $partsUsed partition(s) — " +
        "the operator degenerated to the single-task window shape")
    assert(ranked.agg(max("rn")).head.getLong(0) == 1000L)
    assert(ranked.agg(min("rn")).head.getLong(0) == 1L)
    assert(ranked.select("rn").distinct().count() == 1000L)
  }

  test("duplicate order values with unique tiebreak stay exact") {
    val df = (1L to 100L).map(i => (i, "en", 1.0)).toDF("id", "g", "v")
    assertEqualToWindow(df, 8)
  }

  test("empty input and single row") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "g", "v")
    assert(DistributedRank.rankAndCount(empty, "g", Seq("v", "id"), 4)
      .count() == 0L)
    val one = Seq((1L, "en", 0.5)).toDF("id", "g", "v")
    val r = DistributedRank.rankAndCount(one, "g", Seq("v", "id"), 4).head
    assert(r.getAs[Long]("rn") == 1L && r.getAs[Long]("n") == 1L)
  }

  test("refuses rn/n column collisions") {
    val df = Seq((1L, "en", 0.5)).toDF("id", "g", "rn")
    intercept[IllegalArgumentException] {
      DistributedRank.rankAndCount(df, "g", Seq("rn"), 4)
    }
  }
}
