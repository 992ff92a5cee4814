package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** Native projection of an ML Vector column onto a fixed ascending
  * index selection — the hot row-wise step of
  * [[graft.ml.ReliefFRSelectorModel.transform]] (reference
  * FeatureSelectionUtils.scala:38-73 semantics: dense stays dense,
  * sparse stays sparse with re-indexed positions).
  *
  * A Scala UDF here pays the VectorUDT deserialize → closure →
  * re-serialize round trip on EVERY row of every downstream pipeline.
  * This expression stays inside whole-stage codegen and works directly
  * on the UDT's serialized struct (type, size, indices, values): the
  * dense path is a bare gather loop over the unsafe array, the sparse
  * path a two-pointer merge — no Vector object, no encoder, no
  * closure dispatch. Output bits are identical to the UDF's (the spec
  * pins byte-for-byte parquet equality).
  */
case class VectorCompress(child: Expression, selection: Array[Int])
    extends UnaryExpression {

  require(selection.nonEmpty, "selection must be non-empty")
  require(selection.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "selection must be strictly ascending")

  override def dataType: DataType = SQLDataTypes.VectorType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == SQLDataTypes.VectorType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_compress expects a vector column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    compressRow(input.asInstanceOf[InternalRow])

  /** Walks the VectorUDT serialized layout: (type: byte — 0 sparse /
    * 1 dense, size: int, indices: array<int>, values: array<double>).
    */
  def compressRow(row: InternalRow): InternalRow = {
    if (row.getByte(0) == 1) { // dense: gather
      val values = row.getArray(3)
      val out = new Array[Double](selection.length)
      var i = 0
      while (i < selection.length) {
        out(i) = values.getDouble(selection(i)); i += 1
      }
      new GenericInternalRow(
        Array[Any](1.toByte, null, null, new GenericArrayData(out)))
    } else { // sparse: two-pointer merge over ascending indices
      val indices = row.getArray(2)
      val values = row.getArray(3)
      val n = indices.numElements()
      val outIdx = new Array[Int](math.min(selection.length, n))
      val outVal = new Array[Double](outIdx.length)
      var a = 0; var b = 0; var k = 0
      while (a < selection.length && b < n) {
        val s = selection(a); val x = indices.getInt(b)
        if (s == x) { outIdx(k) = a; outVal(k) = values.getDouble(b); k += 1; a += 1; b += 1 }
        else if (s < x) a += 1
        else b += 1
      }
      new GenericInternalRow(Array[Any](0.toByte, selection.length,
        new GenericArrayData(java.util.Arrays.copyOf(outIdx, k)),
        new GenericArrayData(java.util.Arrays.copyOf(outVal, k))))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The struct surgery (UDT layout walk + GenericInternalRow build)
    // lives in compressRow; generated code dispatches to it through a
    // bound reference — one virtual call per row, zero encoder work,
    // and the expression stays inside the whole-stage-codegen span
    // (no BatchEvalPython/ScalaUDF iterator boundary).
    val self = ctx.addReferenceObj("vecCompress", this, classOf[VectorCompress].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (InternalRow) $self.compressRow((InternalRow) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorCompress =
    copy(child = newChild)

  override def prettyName: String = "graft_vec_compress"

  // case-class equality on an Array field is identity-based, which
  // would make two semantically identical expressions never compare
  // equal — semanticEquals / canonicalization / common-subexpression
  // elimination would silently miss. Content-compare the selection.
  override def equals(other: Any): Boolean = other match {
    case v: VectorCompress =>
      child == v.child && java.util.Arrays.equals(selection, v.selection)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(selection)
}

/** Column ↔ Expression bridge for Spark 4 classic. The Scala object
  * `org.apache.spark.sql.classic.ExpressionUtils` is private[sql]; its
  * JVM static forwarders are public bytecode, so one reflective lookup
  * at class-load time (NOT per row — the expression itself is fully
  * codegen'd) gives model code a supported way to wrap a custom
  * Catalyst expression in a user-facing Column without planting a shim
  * inside Spark's namespace.
  */
object ColumnBridge {
  private val util =
    try Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
    catch {
      case e: ClassNotFoundException => throw new IllegalStateException(
        "graft requires Spark 4.x classic: " +
          "org.apache.spark.sql.classic.ExpressionUtils not found on the " +
          "classpath (Spark Connect-only or a repackaged Spark build?)", e)
    }
  private val toColumn = util.getMethod("column", classOf[Expression])
  private val toExpression = util.getMethod("expression", classOf[org.apache.spark.sql.Column])

  def column(e: Expression): org.apache.spark.sql.Column =
    toColumn.invoke(null, e).asInstanceOf[org.apache.spark.sql.Column]

  def expression(c: org.apache.spark.sql.Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]
}
