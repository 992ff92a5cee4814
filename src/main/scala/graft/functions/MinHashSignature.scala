package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of (already mod-P poly-hashed)
  * shingles: sig[s] = min over h of (a_s · (h mod P) + b_s) mod P, the
  * classic universal-hash permutation family with
  * a_s = (s+1)·906150257 mod P, b_s = s·741103597 + 13 mod P,
  * P = 1e9+7. Every intermediate stays below 2^63, so a
  * checked-arithmetic SQL engine reproduces the signature exactly —
  * this is what makes the LSH operators DuckDB-oracle-checkable.
  *
  * Bit-identical to the composable form
  * `transform(sequence(0, k-1), s -> array_min(transform(shash,
  *   h -> (((s+1) * 906150257L) % P * pmod(h, P) + (s * 741103597L + 13L) % P) % P)))`
  * but whole-stage-codegens to one fused k×n loop with a single
  * primitive output array: no k intermediate arrays, no lambda
  * dispatch. On the near-dup path this is the dominant per-document
  * cost.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<bigint>, positive literal), got ${child.dataType.sql}")
  }

  @transient private lazy val aCoef: Array[Long] =
    Array.tabulate(numHashes)(s => (s + 1L) * 906150257L % PolyHash.P)
  @transient private lazy val bCoef: Array[Long] =
    Array.tabulate(numHashes)(s => (s * 741103597L + 13L) % PolyHash.P)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      var min = Long.MaxValue
      val a = aCoef(s); val b = bCoef(s)
      var i = 0
      while (i < n) {
        val hm = hs.getLong(i) % PolyHash.P
        val h = if (hm < 0) hm + PolyHash.P else hm
        val v = (a * h + b) % PolyHash.P
        if (v < min) min = v
        i += 1
      }
      sig(s) = min
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val as = ctx.addReferenceObj("aCoef", aCoef, "long[]")
      val bs = ctx.addReferenceObj("bCoef", bCoef, "long[]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      val v = ctx.freshName("v")
      val hm = ctx.freshName("hm")
      val p = s"${PolyHash.P}L"
      s"""
         |int $n = $hs.numElements();
         |long[] $sig = new long[$numHashes];
         |for (int $s = 0; $s < $numHashes; $s++) {
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hm = $hs.getLong($i) % $p;
         |    if ($hm < 0) $hm += $p;
         |    long $v = ($as[$s] * $hm + $bs[$s]) % $p;
         |    if ($v < $min) $min = $v;
         |  }
         |  $sig[$s] = $min;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}
