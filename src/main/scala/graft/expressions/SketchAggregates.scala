package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the DETERMINISTIC replacement for HLL in checked queries
  * (VERDICT r8 next-#2, retiring q16's rows-only status): the estimate
  * is a pure function of the SET of 60-bit input hashes, independent of
  * partitioning, merge order, and engine, so a DuckDB oracle replays it
  * exactly from md5 alone — which engine-internal HLL register layouts
  * never allow.
  *
  * State is the k smallest DISTINCT hash values seen (a bounded sorted
  * set — KMV over a set is order-free). Estimator (Bar-Yossef 2002 /
  * Beyer 2007 unbiased form): with fewer than k distinct hashes the
  * state IS the distinct set, so the count is exact; otherwise
  * (k-1) · 2^60 / h_(k), where h_(k) is the k-th smallest hash over the
  * [0, 2^60) hash space. Relative error ~ 1/sqrt(k-2) (~6.3% at k=256).
  *
  * Scale shape: a true TypedImperativeAggregate — partial aggregation
  * runs map-side with O(k) state per group and partials merge by set
  * union + trim, so the exchange carries one k-long sketch per
  * (partition, group) instead of the exact-distinct path's one row per
  * distinct value (q15's shuffle, the thing this operator exists to
  * avoid at 100 TB). Feed it 60-bit hashes
  * ([[graft.functions.GraftFunctions.md5Long]] of the value's string
  * form) so the oracle can reproduce them.
  */
case class KmvSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      b.add(v.asInstanceOf[Long])
      if (b.size > k) b.pollLast() // keep the k smallest
    }
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) {
      b.add(it.next())
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any =
    if (b.size < k) b.size.toDouble
    else (k - 1).toDouble * KmvSketchAgg.HashSpace / b.last.toDouble

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val b = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.add(bb.getLong())
    b
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** 2^60 — the size of the md5Long hash space, exactly representable
    * as a double. */
  val HashSpace: Double = 1152921504606846976.0

  /** KMV distinct estimate over a column of 60-bit hashes. */
  def kmvDistinct(hashes: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(hashes), k)
      .toAggregateExpression())
}
