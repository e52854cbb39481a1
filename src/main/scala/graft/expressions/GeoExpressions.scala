package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd even-odd ray cast: is (plat, plng) inside the polygon given
  * as array<struct<lat:double, lng:double>> (implicitly closed)?
  *
  * Bit-identical to the higher-order formulation the q48/q50 oracles pin
  * (`size(filter(sequence(...), i -> crossing(i))) % 2 = 1`): the same
  * per-edge comparisons in the same order, the same IEEE inf/NaN
  * behavior on horizontal edges (the slope division's non-finite result
  * compares false — no divide guard, identically in every engine), and
  * the filter-drops-null-elements semantics for null vertices. The HOF
  * dispatches an interpreted lambda per EDGE with boxed ordinals —
  * measured ~10-20x slower per candidate on the q50 grid join, where the
  * ray cast IS the per-candidate cost (PLANS.md round-11 probe) — so the
  * both-sides-large polygon join gets the same "custom Expression with
  * doGenCode beats interpreted" treatment as the vector kernels
  * (SURVEY.md §7.3).
  */
case class PointInPolygonExpr(plat: Expression, plng: Expression,
                              verts: Expression) extends TernaryExpression {

  override def first: Expression = plat
  override def second: Expression = plng
  override def third: Expression = verts

  override def checkInputDataTypes(): TypeCheckResult = {
    def dbl(e: Expression) = e.dataType == DoubleType
    val vOk = verts.dataType match {
      case ArrayType(st: StructType, _) =>
        Seq("lat", "lng").forall(f =>
          st.fields.exists(x => x.name == f && x.dataType == DoubleType))
      case _ => false
    }
    if (dbl(plat) && dbl(plng) && vOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double, array<struct<lat:double," +
        s"lng:double>>); got (${plat.dataType.simpleString}, " +
        s"${plng.dataType.simpleString}, ${verts.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_point_in_polygon"

  private lazy val st =
    verts.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val latIdx = st.fieldIndex("lat")
  private lazy val lngIdx = st.fieldIndex("lng")
  private lazy val nFields = st.size

  override def nullSafeEval(py0: Any, px0: Any, vs0: Any): Any = {
    val py = py0.asInstanceOf[Double]
    val px = px0.asInstanceOf[Double]
    val vs = vs0.asInstanceOf[ArrayData]
    val n = vs.numElements()
    var crossings = 0
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      // a null vertex (or null coordinate) makes the HOF's predicate
      // NULL and filter() drops the element — mirror by not counting
      if (!vs.isNullAt(i) && !vs.isNullAt(j)) {
        val vi = vs.getStruct(i, nFields)
        val vj = vs.getStruct(j, nFields)
        if (!vi.isNullAt(latIdx) && !vi.isNullAt(lngIdx) &&
            !vj.isNullAt(latIdx) && !vj.isNullAt(lngIdx)) {
          val y1 = vi.getDouble(latIdx); val x1 = vi.getDouble(lngIdx)
          val y2 = vj.getDouble(latIdx); val x2 = vj.getDouble(lngIdx)
          if (((y1 > py) != (y2 > py)) &&
              px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) crossings += 1
        }
      }
      i += 1
    }
    crossings % 2 == 1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val cr = ctx.freshName("crossings")
    val vi = ctx.freshName("vi")
    val vj = ctx.freshName("vj")
    val y1 = ctx.freshName("y1"); val x1 = ctx.freshName("x1")
    val y2 = ctx.freshName("y2"); val x2 = ctx.freshName("x2")
    nullSafeCodeGen(ctx, ev, (py, px, vs) => s"""
      int $n = $vs.numElements();
      int $cr = 0;
      for (int $i = 0; $i < $n; $i++) {
        int $j = ($i + 1 == $n) ? 0 : $i + 1;
        if (!$vs.isNullAt($i) && !$vs.isNullAt($j)) {
          org.apache.spark.sql.catalyst.InternalRow $vi = $vs.getStruct($i, $nFields);
          org.apache.spark.sql.catalyst.InternalRow $vj = $vs.getStruct($j, $nFields);
          if (!$vi.isNullAt($latIdx) && !$vi.isNullAt($lngIdx) &&
              !$vj.isNullAt($latIdx) && !$vj.isNullAt($lngIdx)) {
            double $y1 = $vi.getDouble($latIdx);
            double $x1 = $vi.getDouble($lngIdx);
            double $y2 = $vj.getDouble($latIdx);
            double $x2 = $vj.getDouble($lngIdx);
            if ((($y1 > $py) != ($y2 > $py)) &&
                $px < ($x2 - $x1) * ($py - $y1) / ($y2 - $y1) + $x1) $cr++;
          }
        }
      }
      ${ev.value} = ($cr % 2 == 1);
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(plat = newFirst, plng = newSecond, verts = newThird)
}

object GeoExpressions {
  /** Column wrapper: point-in-polygon even-odd ray cast over a
    * lat/lng struct-array polygon (implicitly closed). */
  def pointInPolygon(plat: Column, plng: Column, verts: Column): Column =
    Bridge.column(PointInPolygonExpr(
      Bridge.expression(plat.cast("double")),
      Bridge.expression(plng.cast("double")),
      Bridge.expression(verts)))
}
