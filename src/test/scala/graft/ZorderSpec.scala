package graft

import graft.functions.GraftFunctions.zValue
import graft.io.Bucketing
import org.apache.spark.sql.functions._

/** Z-order layout ([[Bucketing.zorderLayout]]): the Morton curve must
  * interleave correctly, and the range-partitioned layout must bound the
  * per-file value spread on BOTH dimensions — the property that lets
  * min/max file stats prune either predicate, which a single-column sort
  * only gives on its sort key. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known values) and is monotone in locality") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(col("x"), col("y"), zValue(col("x"), col("y"), 4).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L && z((1L, 0L)) == 1L && z((0L, 1L)) == 2L
      && z((1L, 1L)) == 3L)
    // x=5 (101), y=3 (011): x0+2*y0+8*y1+16*x2 = 1+2+8+16 = 27
    assert(z((5L, 3L)) == 27L)
  }

  /** Mean per-partition (max-min) spread of a column under a layout. */
  private def spread(df: org.apache.spark.sql.DataFrame, c: String): Double =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max(col(c)) - min(col(c))).as("sp"))
      .agg(avg(col("sp"))).head.getDouble(0)

  test("z-order bounds per-file spread on both dims; single sort does not") {
    val n = 1 << 14
    val pts = spark.range(n).select(
      (col("id") * 2654435761L % 1024).as("x"),
      (col("id") * 40503L % 1024).as("y"))
    val zorder = Bucketing.zorderLayout(pts, "x", "y", bits = 10, nFiles = 16)
    val xsorted = pts.repartitionByRange(16, col("x"))
    val (zx, zy) = (spread(zorder, "x"), spread(zorder, "y"))
    val (sx, sy) = (spread(xsorted, "x"), spread(xsorted, "y"))
    // single-column layout: tight on x, FULL range on y
    assert(sx < 100, s"x-sorted layout should be tight on x: $sx")
    assert(sy > 900, s"x-sorted layout spreads y across the range: $sy")
    // z-order: bounded on BOTH (16 files ~ 4x4 squares of a 1024 grid
    // -> ideal spread ~256; allow curve-boundary slack)
    assert(zx < 520 && zy < 520,
      s"z-order must bound both spreads: x=$zx y=$zy vs single-sort y=$sy")
  }
}
