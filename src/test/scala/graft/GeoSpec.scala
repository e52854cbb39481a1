package graft

import graft.geo.{GeoJoin, Wkb}
import org.apache.spark.sql.functions.{col, expr, not, when}

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def square(x0: Double, y0: Double, x1: Double, y1: Double) =
    Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)

  test("WKB round-trip: polygon with hole, multipolygon, both parse") {
    val donut = Wkb.writePolygon(Seq(
      square(0, 0, 10, 10), square(4, 4, 6, 6)))
    val g = Wkb.parse(donut)
    assert(g.polygons.size == 1 && g.polygons.head.holes.size == 1)
    assert(Wkb.contains(g, 2, 2), "in outer ring")
    assert(!Wkb.contains(g, 5, 5), "inside the hole")
    assert(!Wkb.contains(g, 11, 5), "outside bbox")

    val multi = Wkb.writeMultiPolygon(Seq(
      Seq(square(0, 0, 1, 1)), Seq(square(10, 10, 11, 11))))
    val mg = Wkb.parse(multi)
    assert(mg.polygons.size == 2)
    assert(Wkb.contains(mg, 0.5, 0.5) && Wkb.contains(mg, 10.5, 10.5))
    assert(!Wkb.contains(mg, 5, 5))
  }

  test("WKB: a Point geometry contains exactly its own coordinates") {
    val le = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.put(1.toByte); le.putInt(1); le.putDouble(3.0); le.putDouble(4.0)
    val g = Wkb.parse(le.array())
    assert(g.points == Seq((3.0, 4.0)))
    assert(Wkb.contains(g, 3.0, 4.0),
      "a point-typed zone must match its own coordinates, not nothing")
    assert(!Wkb.contains(g, 3.0, 4.1))
  }

  test("WKB: big-endian and unsupported types") {
    // big-endian point at (3,4)
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte).putInt(1).putDouble(3.0).putDouble(4.0)
    val p = Wkb.parse(be.array())
    assert(p.points == Seq((3.0, 4.0)))
    // unsupported type code errors clearly
    val bad = java.nio.ByteBuffer.allocate(5)
      .put(0.toByte).putInt(2) // LineString
    intercept[IllegalArgumentException] { Wkb.parse(bad.array()) }
  }

  test("broadcast point-in-polygon join assigns zones, null for no match") {
    val zones = Seq(
      ("zoneA", Wkb.writePolygon(Seq(square(0, 0, 5, 5)))),
      ("zoneB", Wkb.writePolygon(Seq(square(5, 0, 10, 5)))))
      .toDF("zone_key", "wkb")
    val points = Seq(
      (1L, 2.0, 2.0),   // zoneA
      (2L, 7.0, 1.0),   // zoneB
      (3L, 20.0, 20.0)) // nowhere
      .toDF("id", "lng", "lat")
    val got = GeoJoin.assignZones(points, zones, "id", "lng", "lat",
        "zone_key", "wkb")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got == Map(1L -> Some("zoneA"), 2L -> Some("zoneB"), 3L -> None))
  }

  test("radiusPairs: grid candidates find exactly the within-radius pairs, no cross join") {
    // a tight cluster (pairwise < 3 km), one point ~5 km away, one far
    // — and the cluster straddles a cell boundary so the neighbor
    // explode is load-bearing
    val pts = Seq(
      (1L, 40.000, -74.000),
      (2L, 40.005, -74.000),  // ~0.56 km north of 1
      (3L, 40.000, -74.006),  // ~0.51 km west of 1
      (4L, 40.045, -74.000),  // ~5 km north of 1
      (5L, 40.900, -74.900))  // far away
      .toDF("id", "lat", "lng")
    val df = GeoJoin.radiusPairs(pts, "id", "lat", "lng",
      radiusKm = 3.0, latStepDeg = 0.03, lngStepDeg = 0.04)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the cluster's 3 pairs, got $got")
    // candidates come from an equi-join on the cell key — a cartesian
    // or nested-loop join here would be the quadratic the grid exists
    // to prevent
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"radius join must be an equi-join on the grid key:\n$plan")
  }

  test("radiusPairs: salted hot-cell path is row-identical to the plain path") {
    // clustered skew: 60 points packed into ONE cell (the hot cell),
    // 20 spread across other cells — includes cross-cell neighbor
    // pairs so the salt must preserve hot<->cold pairs too
    val dense = (0 until 60).map { i =>
      (i.toLong, 40.001 + (i % 10) * 0.002, -74.001 - (i / 10) * 0.004)
    }
    val sparse = (0 until 20).map { i =>
      (100L + i, 40.001 + i * 0.031, -74.001 - i * 0.041)
    }
    val pts = (dense ++ sparse).toDF("id", "lat", "lng")
    def run(salt: Int) = GeoJoin.radiusPairs(pts, "id", "lat", "lng",
        radiusKm = 3.0, latStepDeg = 0.03, lngStepDeg = 0.04,
        saltBuckets = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val plain = run(0)
    val salted = run(8)
    assert(plain.nonEmpty, "fixture must produce pairs")
    assert(salted == plain, "salt is an internal fan-out, never semantics")
  }

  test("PointInPolygonExpr == the HOF ray cast, null vertices included") {
    // random polygons (3-7 vertices) x random points, plus a polygon
    // with a NULL vertex: the compiled kernel must agree with the
    // higher-order formulation the oracles replay, edge for edge
    val rnd = new scala.util.Random(31)
    val polys = (0 until 12).map { z =>
      val nv = 3 + rnd.nextInt(5)
      (z.toLong, (0 until nv).map(_ =>
        (40.0 + rnd.nextDouble() * 0.1, -74.0 + rnd.nextDouble() * 0.1)))
    }
    val pts = (0 until 40).map(i =>
      (i.toLong, 40.0 + rnd.nextDouble() * 0.1, -74.0 + rnd.nextDouble() * 0.1))
    val df = polys.toDF("zid", "raw")
      .select(col("zid"), expr(
        "transform(raw, v -> struct(v._1 AS lat, v._2 AS lng))").as("verts"))
      // inject one NULL vertex into polygon 0
      .withColumn("verts", when(col("zid") === 0,
        expr("transform(verts, (v, i) -> CASE WHEN i = 1 THEN NULL ELSE v END)"))
        .otherwise(col("verts")))
      .crossJoin(pts.toDF("pid", "plat", "plng"))
    val hof = expr(
      """size(filter(sequence(0, size(verts) - 1), i ->
        |  ((verts[i].lat > plat) != (verts[CAST((i+1) % size(verts) AS INT)].lat > plat))
        |  AND plng < (verts[CAST((i+1) % size(verts) AS INT)].lng - verts[i].lng)
        |      * (plat - verts[i].lat)
        |      / (verts[CAST((i+1) % size(verts) AS INT)].lat - verts[i].lat)
        |      + verts[i].lng)) % 2 = 1""".stripMargin)
    val cmp = df.select(col("zid"), col("pid"), hof.as("a"),
      graft.expressions.GeoExpressions.pointInPolygon(
        col("plat"), col("plng"), col("verts")).as("b"))
    val diff = cmp.filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L, cmp.filter(not(col("a") <=> col("b")))
      .collect().take(5).mkString(" "))
    assert(cmp.filter(col("b")).count() > 0L, "fixture must have containments")
  }

  test("gridPolygonJoin: salted dense-cell path is row-identical to the plain path") {
    // downtown-density shape: one big polygon whose bbox covers many
    // cells plus a small one over the hot cell; 60 points packed into
    // that one cell, 20 spread wide — hot and cold containments both
    def diamond(clat: Double, clng: Double, w: Double) = Seq(
      (clat + w, clng), (clat, clng + w), (clat - w, clng), (clat, clng - w))
    val zs = Seq((10L, diamond(40.00, -74.00, 0.40)),
                 (20L, diamond(40.00, -74.00, 0.02)))
      .toDF("zid", "raw")
      .select(col("zid"), expr(
        "transform(raw, v -> struct(v._1 AS lat, v._2 AS lng))").as("verts"))
    val dense = (0 until 60).map { i =>
      (i.toLong, 40.001 + (i % 10) * 0.002, -74.001 - (i / 10) * 0.003)
    }
    val sparse = (0 until 20).map { i =>
      (100L + i, 40.001 + i * 0.031, -74.001 - i * 0.041)
    }
    val pts = (dense ++ sparse).toDF("id", "lat", "lng")
    def run(salt: Int) = GeoJoin.gridPolygonJoin(pts, "id", "lat", "lng",
        zs, "zid", "verts", latStepDeg = 0.03, lngStepDeg = 0.04,
        saltBuckets = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq // multiset compare: salting must not dup
    val plain = run(0)
    val salted = run(8)
    assert(plain.size > 60, s"fixture must produce dense containments: $plain")
    assert(salted == plain, "salt is an internal fan-out, never semantics")
  }

  test("gridPolygonJoin: containments match brute-force ray cast, no cross join") {
    // two diamonds; points inside each, on the seam between cells, and
    // outside both; polygon 20 overlaps polygon 10's area partially so
    // a point can be in BOTH (two output rows)
    def diamond(clat: Double, clng: Double, w: Double) = Seq(
      (clat + w, clng), (clat, clng + w), (clat - w, clng), (clat, clng - w))
    val zs = Seq((10L, diamond(40.00, -74.00, 0.05)),
                 (20L, diamond(40.03, -74.00, 0.05)))
      .toDF("zid", "raw")
      .select(col("zid"), expr(
        "transform(raw, v -> struct(v._1 AS lat, v._2 AS lng))").as("verts"))
    val pts = Seq(
      (1L, 40.000, -74.000),  // center of 10, inside 20's lower tip? dist .03 < .05 yes
      (2L, 40.060, -74.000),  // inside 20 only
      (3L, 40.015, -74.000),  // inside both (within L1 0.05 of both centers)
      (4L, 40.000, -74.049),  // near 10's west vertex, inside 10 only
      (5L, 41.000, -75.000))  // far outside
      .toDF("id", "lat", "lng")
    val df = GeoJoin.gridPolygonJoin(pts, "id", "lat", "lng",
      zs, "zid", "verts", latStepDeg = 0.03, lngStepDeg = 0.04)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: diamond containment is the L1 test
    // |dlat| / w + |dlng| / w < 1 (strict: boundary points excluded by
    // the ray cast's half-open convention; fixtures avoid boundaries)
    val centers = Map(10L -> (40.00, -74.00), 20L -> (40.03, -74.00))
    val ptsSeq = Seq((1L, 40.000, -74.000), (2L, 40.060, -74.000),
      (3L, 40.015, -74.000), (4L, 40.000, -74.049), (5L, 41.000, -75.000))
    val want = (for {
      (pid, plat, plng) <- ptsSeq
      (zid, (clat, clng)) <- centers.toSeq
      if math.abs(plat - clat) + math.abs(plng - clng) < 0.05
    } yield (pid, zid)).toSet
    assert(got == want, s"got $got want $want")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"polygon join must be an equi-join on the grid key:\n$plan")
  }
}
