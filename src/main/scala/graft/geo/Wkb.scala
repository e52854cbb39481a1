package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB (Well-Known Binary) geometry reader — no external deps
  * (offline build; SURVEY.md §7.4). Covers what the reference's staged
  * geo dimension needs (`nyc_nta_zones.parquet`, 2327 polygons stored as
  * WKB in a binary column): Point (1), Polygon (3), MultiPolygon (6),
  * both byte orders, with 2D coordinates (Z/M flags not used by the
  * staged data and rejected explicitly).
  */
object Wkb {

  /** One polygon: outer ring + zero or more hole rings. Rings are flat
    * (x0, y0, x1, y1, ...) arrays, closed or open. */
  final case class Polygon(outer: Array[Double], holes: Seq[Array[Double]]) {
    // cached bbox for the cheap pre-filter
    val (minX, minY, maxX, maxY) = {
      var i = 0
      var mnx = Double.MaxValue; var mny = Double.MaxValue
      var mxx = Double.MinValue; var mxy = Double.MinValue
      while (i < outer.length) {
        val x = outer(i); val y = outer(i + 1)
        if (x < mnx) mnx = x; if (x > mxx) mxx = x
        if (y < mny) mny = y; if (y > mxy) mxy = y
        i += 2
      }
      (mnx, mny, mxx, mxy)
    }
  }

  final case class Geometry(polygons: Seq[Polygon], points: Seq[(Double, Double)])

  /** Parse a WKB byte array into polygons and/or points. */
  def parse(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    parseGeom(buf)
  }

  private def parseGeom(buf: ByteBuffer): Geometry = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val typeCode = buf.getInt()
    require((typeCode & 0xffff) == typeCode,
      s"WKB Z/M/SRID-flagged geometries unsupported (type=$typeCode)")
    typeCode match {
      case 1 => // Point
        Geometry(Nil, Seq((buf.getDouble(), buf.getDouble())))
      case 3 => // Polygon
        Geometry(Seq(parsePolygonBody(buf)), Nil)
      case 6 => // MultiPolygon
        val n = buf.getInt()
        val polys = (0 until n).map { _ =>
          val g = parseGeom(buf) // each element is a full WKB polygon
          g.polygons.head
        }
        Geometry(polys, Nil)
      case other =>
        throw new IllegalArgumentException(s"unsupported WKB geometry type $other")
    }
  }

  private def parsePolygonBody(buf: ByteBuffer): Polygon = {
    val nRings = buf.getInt()
    val rings = (0 until nRings).map { _ =>
      val nPts = buf.getInt()
      val ring = new Array[Double](nPts * 2)
      var i = 0
      while (i < nPts * 2) { ring(i) = buf.getDouble(); i += 1 }
      ring
    }
    // POLYGON EMPTY (nRings=0) is legal WKB: empty outer ring gives an
    // inverted bbox, so contains() is always false — no crash.
    if (rings.isEmpty) Polygon(Array.empty[Double], Nil)
    else Polygon(rings.head, rings.tail)
  }

  /** Ray-casting point-in-ring test (crossing number, half-open edges —
    * standard even-odd rule). */
  private[geo] def inRing(ring: Array[Double], x: Double, y: Double): Boolean = {
    var inside = false
    val n = ring.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Point-in-polygon with holes, bbox pre-filtered. */
  def contains(p: Polygon, x: Double, y: Double): Boolean =
    x >= p.minX && x <= p.maxX && y >= p.minY && y <= p.maxY &&
      inRing(p.outer, x, y) && !p.holes.exists(inRing(_, x, y))

  def contains(g: Geometry, x: Double, y: Double): Boolean =
    g.polygons.exists(contains(_, x, y)) ||
      // a Point geometry (parse() accepts WKB type 1) "contains" exactly
      // its own coordinates — without this branch a point-typed zone
      // could never match anything, silently
      g.points.exists { case (px, py) => px == x && py == y }

  // -------------------------------------------------------------------
  // WKB writer (tests/fixtures only — builds the bytes we then parse)
  // -------------------------------------------------------------------

  def writePolygon(rings: Seq[Array[Double]]): Array[Byte] = {
    val size = 1 + 4 + 4 + rings.map(r => 4 + r.length * 8).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(rings.size)
    rings.foreach { r =>
      buf.putInt(r.length / 2)
      r.foreach(buf.putDouble)
    }
    buf.array()
  }

  def writeMultiPolygon(polys: Seq[Seq[Array[Double]]]): Array[Byte] = {
    val bodies = polys.map(writePolygon)
    val buf = ByteBuffer.allocate(1 + 4 + 4 + bodies.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(6).putInt(polys.size)
    bodies.foreach(buf.put)
    buf.array()
  }
}
