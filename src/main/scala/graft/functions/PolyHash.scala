package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string mod 1e9+7:
  * h = fold(seed, c => (h * mult + c) % P) over the characters.
  *
  * This is the hash primitive behind the dedup signatures (d05-d08,
  * d11): unlike xxhash64 it is reproducible in any checked-arithmetic
  * SQL engine (every intermediate < 2^63 — no wrap-around semantics),
  * which is what makes those operators DuckDB-oracle-checkable.
  *
  * Bit-identical to the composable form
  * `aggregate(split(s, ''), seed, (b, c) -> (b * mult + ascii(c)) % P)`
  * for ASCII input (the fused loop reads bytes; `ascii()` reads
  * codepoints — equal on ASCII, which the corpus is), but codegens to
  * one bare loop with no per-char array allocation.
  */
case class PolyHash(child: Expression, seed: Long, mult: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects (string, bigint literal, bigint literal), got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h = (h * mult + (bytes(i) & 0xff)) % PolyHash.P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bts = ctx.freshName("bts")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bts = $str.getBytes();
         |long $h = ${seed}L;
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  $h = ($h * ${mult}L + ($bts[$i] & 0xff)) % ${PolyHash.P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "graft_polyhash"
}

object PolyHash {
  val P = 1000000007L
}
