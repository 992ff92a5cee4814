package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of (already-hashed) shingles:
  * sig[s] = min over h of xxhash64(s, h), for s in 0 until numHashes.
  *
  * Bit-identical to the composable form
  * `transform(sequence(0, k-1), s -> array_min(transform(shash, h -> xxhash64(s, h))))`
  * — same XXH64 chain (seed 42 → hashInt(s) → hashLong(h)) — but
  * whole-stage-codegens to one fused k×n loop with a single primitive
  * output array: no k intermediate arrays, no lambda dispatch. On the
  * near-dup path this is the dominant per-document cost.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<bigint>, positive literal), got ${child.dataType.sql}")
  }

  /** Per-seed initial XXH64 state: xxhash64's running fold over
    * (seedLiteral, value) children is hashInt(seed, 42) then
    * hashLong(value, that) — precompute the first step.
    */
  @transient private lazy val seedInits: Array[Long] =
    Array.tabulate(numHashes)(s => XXH64.hashInt(s, 42L))

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      var min = Long.MaxValue
      val init = seedInits(s)
      var i = 0
      while (i < n) {
        val v = XXH64.hashLong(hs.getLong(i), init)
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
      val seeds = ctx.addReferenceObj("seedInits", seedInits, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $sig = new long[$numHashes];
         |for (int $s = 0; $s < $numHashes; $s++) {
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $xxh.hashLong($hs.getLong($i), $seeds[$s]);
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
