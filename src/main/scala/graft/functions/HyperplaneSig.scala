package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH signature over an array<double> —
  * bit j = sign(v · h_j), h_j[d] = ±1 from the parity of
  * ((a_j·(d+1) + b_j) mod P)² mod P with the shared universal-hash
  * family constants (see graft.sim.Sim.bucketColOf, which holds the
  * composable formulation this must stay bit-identical to).
  *
  * The composable form is a transform/zip_with/aggregate chain —
  * CodegenFallback, paid per corpus row in every ANN operator
  * (e02/e03/e05). This expression codegens to two nested loops of long
  * arithmetic and a left-to-right double accumulation per bit — the
  * identical summation order, so signatures (and therefore buckets,
  * candidates and the DuckDB oracles) are unchanged.
  */
case class HyperplaneSig(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bits >= 1 && bits <= 63 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_hypersig expects (array<double>, bits in [1,63]), got (${child.dataType.sql}, $bits)")
  }

  private final val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      val aj = (j + 1) * 906150257L % P
      val bj = (j * 741103597L + 13L) % P
      var s = 0.0
      var d = 0
      while (d < n) {
        val h1 = (aj * (d + 1) + bj) % P
        val w = (h1 * h1 % P % 2L) * 2L - 1L
        s += v.getDouble(d) * w
        d += 1
      }
      if (s > 0.0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val aj = ctx.freshName("aj")
      val bj = ctx.freshName("bj")
      val h1 = ctx.freshName("h1")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  long $aj = ($j + 1) * 906150257L % ${P}L;
         |  long $bj = ($j * 741103597L + 13L) % ${P}L;
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $h1 = ($aj * ($d + 1) + $bj) % ${P}L;
         |    long $w = ($h1 * $h1 % ${P}L % 2L) * 2L - 1L;
         |    $s += $a.getDouble($d) * $w;
         |  }
         |  if ($s > 0.0) $bucket |= 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "graft_hypersig"
}
