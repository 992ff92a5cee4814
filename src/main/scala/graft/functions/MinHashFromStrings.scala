package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingles→MinHash-signature kernel: each shingle string is
  * poly-hashed (seed 17, mult 31 — the [[PolyHash]] primitive) and fed
  * straight into the k universal-hash minima of [[MinHashSignature]],
  * with no intermediate hash array and no higher-order-function layer.
  *
  * Bit-identical to the two-step pipeline
  * `graft_minhash(transform(shingles, s -> graft_polyhash(s, 17, 31)), k)`
  * (min is order-independent; the per-shingle hash and the permutation
  * arithmetic are the same longs), but the `transform` wrapper of the
  * two-step form is a higher-order function — the codegen hole this
  * fusion closes on the near-dup signature projection, the dominant
  * per-document cost of d06/d08/d11/s05.
  */
case class MinHashFromStrings(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_str expects (array<string>, positive literal), got ${child.dataType.sql}")
  }

  @transient private lazy val aCoef: Array[Long] =
    Array.tabulate(numHashes)(s => (s + 1L) * 906150257L % PolyHash.P)
  @transient private lazy val bCoef: Array[Long] =
    Array.tabulate(numHashes)(s => (s * 741103597L + 13L) % PolyHash.P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = 17L
        var c = 0
        while (c < bytes.length) {
          h = (h * 31L + (bytes(c) & 0xff)) % PolyHash.P
          c += 1
        }
        var s = 0
        while (s < numHashes) {
          val v = (aCoef(s) * h + bCoef(s)) % PolyHash.P
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val as = ctx.addReferenceObj("aCoef", aCoef, "long[]")
      val bs = ctx.addReferenceObj("bCoef", bCoef, "long[]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val bts = ctx.freshName("bts")
      val p = s"${PolyHash.P}L"
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    byte[] $bts = $arr.getUTF8String($i).getBytes();
         |    long $h = 17L;
         |    for (int $c = 0; $c < $bts.length; $c++) {
         |      $h = ($h * 31L + ($bts[$c] & 0xff)) % $p;
         |    }
         |    for (int $s = 0; $s < $numHashes; $s++) {
         |      long $v = ($as[$s] * $h + $bs[$s]) % $p;
         |      if ($v < $sig[$s]) $sig[$s] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashFromStrings =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_str"
}
