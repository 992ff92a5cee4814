package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The set-valued sibling of [[KmvSketch]]: keeps the k smallest
  * DISTINCT hash values and evaluates to the SORTED ASCENDING array of
  * whatever it holds (fewer than k values while the group is small —
  * the exact regime; exactly k once saturated). Where [[KmvSketch]]
  * answers "how many distinct?" with one threshold, the retained set
  * supports SET ALGEBRA between sketches (the theta-sketch trick,
  * q38): union/intersection estimates between groups come from
  * comparing two k-sets below their combined threshold — no re-scan of
  * the data.
  *
  * Same bounded-state contract: ≤ k longs of partial state per group,
  * O(k) merges, order-independent result — so a second engine derives
  * the identical set by sorting distinct hashes (the DuckDB oracle).
  */
case class KmvSetSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] with UnaryLike[Expression] {

  require(k > 0, "graft_kmv_set k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last && buf.add(x)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[Long], b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    b2.forEach(x => add(b1, x))
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(x => bb.putLong(x))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_set expects a BIGINT hash column, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSetSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSetSketch =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv_set"
}
