package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
  * DISTINCT hash values seen and evaluates to the k-th smallest (the
  * sketch threshold), or null while fewer than k distinct values have
  * arrived. Downstream, `(k−1) * P div threshold` estimates the
  * distinct count with ~1/√k relative error.
  *
  * This is the library's bounded-state twin of `countDistinct`
  * (q09 ↔ q36, the q25↔q25b pattern): exact distinct aggregation
  * shuffles every distinct value per group, which at 10¹¹ rows is the
  * group's whole cardinality in flight; this aggregate's partial state
  * is ≤ k longs per group — map-side partials combine in O(k) — no
  * matter how many distinct values stream through. The value is
  * deterministic (k-th smallest distinct is order-independent), so a
  * second engine computes the identical threshold from the identical
  * hash column, which is what the DuckDB oracle does.
  *
  * TypedImperativeAggregate (ObjectHashAggregate at plan level) — the
  * standard home for sketch state; codegen does not apply to buffers,
  * but the hash-column input it consumes stays in the codegen'd scan.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] with UnaryLike[Expression] {

  require(k > 0, "graft_kmv k must be positive")

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

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) null else buf.last

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

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT hash column, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv"
}
