package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused tokens→SimHash kernel: each token is double-poly-hashed
  * (seeds 17/19, mults 31/37 — the packed h1·P+h2 token hash of
  * [[graft.dedup.Dedup.simhash]]) and its ±1 bit votes accumulated in
  * one pass. Bit-identical to the two-step
  * `graft_simhash(transform(toks, t -> graft_polyhash(t,17,31)*P + graft_polyhash(t,19,37)))`
  * — the transform() wrapper there is a higher-order function, the
  * same codegen hole [[MinHashFromStrings]] closes for MinHash.
  */
case class SimHashFromStrings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_str expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h1 = 17L
        var h2 = 19L
        var c = 0
        while (c < bytes.length) {
          val ch = bytes(c) & 0xff
          h1 = (h1 * 31L + ch) % PolyHash.P
          h2 = (h2 * 37L + ch) % PolyHash.P
          c += 1
        }
        val h = h1 * PolyHash.P + h2
        var b = 0
        while (b < 64) { votes(b) += ((h >>> b) & 1L) * 2L - 1L; b += 1 }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val ch = ctx.freshName("ch")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      val bts = ctx.freshName("bts")
      val p = s"${PolyHash.P}L"
      s"""
         |int $n = $arr.numElements();
         |long[] $votes = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    byte[] $bts = $arr.getUTF8String($i).getBytes();
         |    long $h1 = 17L;
         |    long $h2 = 19L;
         |    for (int $c = 0; $c < $bts.length; $c++) {
         |      int $ch = $bts[$c] & 0xff;
         |      $h1 = ($h1 * 31L + $ch) % $p;
         |      $h2 = ($h2 * 37L + $ch) % $p;
         |    }
         |    long $h = $h1 * $p + $h2;
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += (($h >>> $b) & 1L) * 2L - 1L;
         |    }
         |  }
         |}
         |long $sim = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sim |= 1L << $b;
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFromStrings =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_str"
}
