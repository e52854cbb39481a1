package graft.geo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broadcast spatial join: assign each (lng, lat) point to the polygon
  * zone containing it — the staged reference capability (lat/lng fact
  * columns x the 2327-polygon NTA dimension, SURVEY.md §2.1 S7).
  *
  * Shape chosen for scale: the polygon dimension is SMALL (thousands of
  * zones) and the point side is the 100 TB fact — so parse the WKB once
  * on the driver, broadcast the parsed polygons (with cached bboxes),
  * and stream the fact through a map-only stage. No shuffle of the
  * points; bbox rejection makes the per-point cost ~O(candidate zones).
  * (A billion-polygon right side would need an R-tree grid join — out
  * of scope for the reference's data model.)
  */
object GeoJoin {

  /** Grid-bucketed RADIUS self-join — the both-sides-large spatial
    * join [[assignZones]]'s broadcast shape scopes out: every point
    * lands in a grid cell, one side explodes to its 3×3 neighborhood,
    * and candidates come from a plain EQUI-JOIN on the cell key —
    * never a cross join — before the exact haversine predicate keeps
    * true pairs. Each qualifying pair is produced exactly once
    * (left-side offsets reach the right cell once; id1 < id2 kills
    * the mirror), so no distinct pass is needed.
    *
    * Coverage contract (caller-supplied cell sizes): with
    * `latStepDeg >= radiusKm / 110.574` and `lngStepDeg >= radiusKm /
    * (111.320 · cos(maxAbsLat))` the 3×3 neighborhood contains every
    * pair within the radius. At 100 TB both sides shuffle ONCE on the
    * cell key (9x fan-out on one side only), pairwise work is
    * confined to cells — the same bucket-confinement contract as the
    * LSH dedup family. The distance predicate thresholds the
    * round-3dp distance, the cross-engine-stable boundary the q06
    * oracle kernel already pins.
    *
    * LIMITATION (ADVICE r8): cells come from `floor(lng / lngStepDeg)`
    * with no longitude wraparound, so the coverage contract EXCLUDES
    * pairs straddling the ±180° antimeridian (their cells are
    * numerically far apart and the pair is silently dropped). Callers
    * with a global corpus must normalize longitudes away from the seam
    * or pre-duplicate points within `lngStepDeg` of ±180° into the
    * opposite sign's cell range; bounded-extent corpora (the NYC box
    * q49 runs on) are unaffected. Latitude has no such seam (poles are
    * range endpoints, not a wrap).
    *
    * DENSE-CELL SKEW (VERDICT r8 next-#5): pairwise work concentrates
    * in dense cells — a Manhattan-density hot cell makes one task do
    * |cell|² candidate checks while the rest of the cluster idles.
    * `saltBuckets > 0` routes the cell-key equi-join through
    * [[graft.operators.SkewJoin.saltedInnerJoin]]: sampled hot-cell
    * detection, left rows of hot cells salted into n buckets, the hot
    * cells' right rows replicated ×n — per-task work drops to
    * |cell|²/n, output row-identical to the plain path (GeoSpec pins
    * it). Same AQE-FIRST policy as the operator: leave 0 and let AQE
    * split skewed SMJ partitions from runtime stats where it can;
    * reach for the salt in AQE-less plans (streaming micro-batches) or
    * when the mitigation must be engine-independent. Probe
    * (SkewProbe radius): 200k points, 70% in one cell — plain
    * co-locates the dense cell on one task; salted spreads it.
    *
    * Output: (id1, id2, dist_km), id1 < id2. */
  def radiusPairs(points: DataFrame, idCol: String, latCol: String,
                  lngCol: String, radiusKm: Double,
                  latStepDeg: Double, lngStepDeg: Double,
                  saltBuckets: Int = 0): DataFrame = {
    import graft.functions.GraftFunctions.distLatLng
    val p = points.select(col(idCol).as("id"),
      col(latCol).cast(DoubleType).as("lat"),
      col(lngCol).cast(DoubleType).as("lng"))
    val cells = p
      .withColumn("cx", floor(col("lng") / lngStepDeg).cast(LongType))
      .withColumn("cy", floor(col("lat") / latStepDeg).cast(LongType))
    val offs = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) }
      yield (dx, dy)
    val l = cells.select(col("id").as("id1"), col("lat").as("lat1"),
        col("lng").as("lng1"), col("cx"), col("cy"))
      .withColumn("off", explode(typedlit(offs)))
      .select(col("id1"), col("lat1"), col("lng1"),
        (col("cx") + col("off._1")).as("cx"),
        (col("cy") + col("off._2")).as("cy"))
    val r = cells.select(col("id").as("id2"), col("lat").as("lat2"),
      col("lng").as("lng2"), col("cx"), col("cy"))
    val joined =
      if (saltBuckets <= 0) l.join(r, Seq("cx", "cy"))
      else {
        // pack the composite cell key into one column for the salted
        // join (collision-free: cy spans far less than 2^21 cells)
        val pack = (col("cx") * lit(1L << 21)) + col("cy")
        graft.operators.SkewJoin.saltedInnerJoin(
          l.withColumn("__cell", pack).drop("cx", "cy"),
          r.withColumn("__cell", pack).drop("cx", "cy"),
          "__cell", saltBuckets)
          .drop("__cell")
      }
    joined
      .filter(col("id1") < col("id2"))
      .withColumn("dist_km", round(distLatLng(col("lat1"), col("lng1"),
        col("lat2"), col("lng2"), "km"), 3))
      .filter(col("dist_km") <= radiusKm)
      .select(col("id1"), col("id2"), col("dist_km"))
  }

  /** Grid-bucketed POINT-IN-POLYGON join where BOTH sides are large —
    * the billion-polygon shape [[assignZones]]'s broadcast contract
    * scopes out (VERDICT r8 next-#4). Each polygon explodes to every
    * grid cell its bounding box touches; each point lands in its ONE
    * cell; candidates come from a plain equi-join on the cell key, and
    * the exact even-odd ray cast (the same crossing rule
    * [[Wkb.contains]] and the q48 oracle pin) keeps true containments.
    * A (point, polygon) candidate arises at most once — the point has
    * one cell and the polygon covers that cell once — so no distinct
    * pass. The ray cast runs as a Catalyst higher-order-function
    * predicate over the vertex array (codegen-planned `filter`/`size`),
    * not a UDF.
    *
    * Scale shape: one shuffle each side on the cell key; polygon
    * fan-out = bbox cell count (bounded by polygon extent / step, the
    * caller's contract); per-candidate cost = O(vertices). Same
    * antimeridian exclusion as [[radiusPairs]]. Horizontal edges
    * short-circuit arithmetically: the crossing test's `(y1>py) !=
    * (y2>py)` leg is false, and IEEE inf/NaN from the slope division
    * compare false — identically in every engine, so no divide guard.
    *
    * DENSE-CELL SKEW (VERDICT r10 next-#6, same recipe as
    * [[radiusPairs]]): when many polygon bboxes cover one cell AND the
    * point mass concentrates there (the downtown-density shape), one
    * task does |points_cell|·|polys_cell| ray casts while the cluster
    * idles. `saltBuckets > 0` routes the cell equi-join through
    * [[graft.operators.SkewJoin.saltedInnerJoin]] — hot cells detected
    * from a point-side sample, their point rows salted into n buckets,
    * their polygon rows replicated ×n — per-task work drops to
    * ~|cell|·|polys|/n, output row-identical to the plain path (GeoSpec
    * pins it; a candidate still arises at most once, so salting cannot
    * duplicate). Same AQE-FIRST policy: leave 0 and let AQE split
    * skewed partitions where it can; salt in AQE-less plans or when the
    * mitigation must be engine-independent.
    *
    * @param polys polyIdCol + vertsCol: array<struct<lat:double,
    *              lng:double>> — CLOSED implicitly (last vertex joins
    *              the first); no self-intersection requirement (even-
    *              odd rule, holes-by-winding like q48's fixtures)
    * Output: (pid, zid), one row per containment. */
  def gridPolygonJoin(points: DataFrame, idCol: String, latCol: String,
                      lngCol: String, polys: DataFrame, polyIdCol: String,
                      vertsCol: String,
                      latStepDeg: Double, lngStepDeg: Double,
                      saltBuckets: Int = 0): DataFrame = {
    val p = points.select(col(idCol).as("pid"),
      col(latCol).cast(DoubleType).as("plat"),
      col(lngCol).cast(DoubleType).as("plng"))
      .withColumn("cx", floor(col("plng") / lngStepDeg).cast(LongType))
      .withColumn("cy", floor(col("plat") / latStepDeg).cast(LongType))
    val lats = transform(col("verts"), v => v("lat"))
    val lngs = transform(col("verts"), v => v("lng"))
    val z = polys.select(col(polyIdCol).as("zid"), col(vertsCol).as("verts"))
      .withColumn("cx", explode(sequence(
        floor(array_min(lngs) / lngStepDeg).cast(LongType),
        floor(array_max(lngs) / lngStepDeg).cast(LongType))))
      .withColumn("cy", explode(sequence(
        floor(array_min(lats) / latStepDeg).cast(LongType),
        floor(array_max(lats) / latStepDeg).cast(LongType))))
    // even-odd crossing count over edges i -> (i+1) mod n, as a
    // COMPILED expression ([[graft.expressions.PointInPolygonExpr]] —
    // bit-identical to the HOF chain the oracle replays edge-by-edge
    // with 1-based CASE arithmetic: same doubles, same comparisons).
    // The ray cast IS the per-candidate cost of this join, and the HOF
    // form paid an interpreted lambda per EDGE — measured 21→3.4 s on
    // the 15.5M-candidate dense-cell probe (PLANS.md round-11)
    val inside = graft.expressions.GeoExpressions.pointInPolygon(
      col("plat"), col("plng"), col("verts"))
    val joined =
      if (saltBuckets <= 0) p.join(z, Seq("cx", "cy"))
      else {
        // pack the composite cell key for the salted join (same
        // collision-free packing as radiusPairs: cy spans << 2^21)
        val pack = (col("cx") * lit(1L << 21)) + col("cy")
        graft.operators.SkewJoin.saltedInnerJoin(
          p.withColumn("__cell", pack).drop("cx", "cy"),
          z.withColumn("__cell", pack).drop("cx", "cy"),
          "__cell", saltBuckets)
          .drop("__cell")
      }
    joined
      .filter(inside)
      .select(col("pid"), col("zid"))
  }

  /** @param points  fact side: idCol, lngCol, latCol
    * @param zones   dim side: zoneKeyCol (string), wkbCol (binary WKB)
    * @return (idCol, lng, lat, zone) — zone null when no polygon matches
    */
  def assignZones(points: DataFrame, zones: DataFrame,
                  idCol: String, lngCol: String, latCol: String,
                  zoneKeyCol: String, wkbCol: String): DataFrame = {
    val spark = points.sparkSession
    // dim is small by contract: parse once, broadcast parsed form.
    // Sorted by zone key so first-containing-polygon wins DETERMINISTICALLY
    // for boundary/overlap points (collect() order is partitioning-dependent).
    val parsed: Array[(String, Wkb.Geometry)] = zones
      .select(col(zoneKeyCol), col(wkbCol)).collect()
      .map { r: Row => (r.getString(0), Wkb.parse(r.getAs[Array[Byte]](1))) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(parsed)

    // the id column keeps its OWN type: force-casting to Long would
    // silently null every non-numeric id (e.g. Citibike's string
    // ride_id), destroying row identity with no error
    val outSchema = StructType(Seq(
      StructField(idCol, points.schema(idCol).dataType),
      StructField("lng", DoubleType),
      StructField("lat", DoubleType),
      StructField("zone", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    points.select(col(idCol), col(lngCol).cast(DoubleType),
        col(latCol).cast(DoubleType))
      .mapPartitions { rows =>
        val zs = bc.value
        rows.map { r =>
          // NULL coords (exactly the rows a staging validity flag marks)
          // must yield a NULL zone, not an NPE from getDouble on null
          if (r.isNullAt(1) || r.isNullAt(2)) {
            Row(r.get(0),
              if (r.isNullAt(1)) null else r.getDouble(1),
              if (r.isNullAt(2)) null else r.getDouble(2), null)
          } else {
            val x = r.getDouble(1); val y = r.getDouble(2)
            var zone: String = null
            var i = 0
            while (zone == null && i < zs.length) {
              if (Wkb.contains(zs(i)._2, x, y)) zone = zs(i)._1
              i += 1
            }
            Row(r.get(0), x, y, zone)
          }
        }
      }(enc)
  }
}
