package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The composable formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,x) -> s+x)` allocates
  * an intermediate array per row-pair and evaluates two lambda chains;
  * inside a similarity join that is the hot path. This expression
  * whole-stage-codegens to a bare fused multiply-add loop over the
  * unsafe array data — no allocation, no virtual calls — and keeps the
  * exact left-to-right summation order (bit-identical results to the
  * composable form and to DuckDB's list_dot_product, which the oracles
  * rely on).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Session extensions: registers graft-native functions. Install with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an int literal, got $other")
        }
        MinHashSignature(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_str"),
      new ExpressionInfo(classOf[SimHashFromStrings].getName, "graft_simhash_str"),
      (children: Seq[Expression]) => SimHashFromStrings(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_str"),
      new ExpressionInfo(classOf[MinHashFromStrings].getName, "graft_minhash_str"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_str numHashes must be an int literal, got $other")
        }
        MinHashFromStrings(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hypersig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hypersig"),
      (children: Seq[Expression]) => {
        val bits = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hypersig bits must be an int literal, got $other")
        }
        HyperplaneSig(children(0), bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sigmatch"),
      new ExpressionInfo(classOf[SigMatch].getName, "graft_sigmatch"),
      (children: Seq[Expression]) => SigMatch(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an int literal, got $other")
        }
        KmvSketch(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_set"),
      new ExpressionInfo(classOf[KmvSetSketch].getName, "graft_kmv_set"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_set k must be an int literal, got $other")
        }
        KmvSetSketch(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => {
        def longLit(e: Expression, what: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_polyhash $what must be an integer literal, got $other")
        }
        PolyHash(children(0), longLit(children(1), "seed"), longLit(children(2), "mult"))
      }))
  }
}
