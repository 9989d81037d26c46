package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 64-bit SimHash (Charikar 2002, STOC "Similarity estimation
  * techniques from rounding algorithms") over whitespace tokens — one
  * codegen'd kernel per row instead of the 64-term Column vote tree it
  * replaces (each term of which re-read the token-hash array).
  *
  * Semantics (mirrored bit-exactly by the DuckDB oracle in
  * DedupQueries):
  *   tokens  = non-empty maximal runs of non-(ASCII-)whitespace in
  *             lower(text) (same token set as
  *             `filter(split(lower(text), "\\s+"), t -> t <> '')`)
  *   th(tok) = FNV-1a 64 over the token's UTF-8 bytes ([[Fnv1a64]] —
  *             public-domain constants, reproducible in any engine)
  *   bit b of the signature = majority vote of bit b over all token
  *   hashes, ties to 1 (vote >= 0).
  *
  * Single pass over the bytes, no per-token allocation: the FNV state
  * accumulates while scanning and votes flush at token boundaries.
  */
object SimHash64 {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Runtime kernel shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.toLowerCase.getBytes
    val votes = new Array[Int](64)
    var h = Fnv1a64.OffsetBasis
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val atEnd = i == bytes.length
      if (!atEnd && !isWs(bytes(i))) {
        h ^= (bytes(i) & 0xffL)
        h *= Fnv1a64.Prime
        inTok = true
      } else if (inTok) {
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        h = Fnv1a64.OffsetBasis
        inTok = false
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Reference implementation on a JVM String (spec oracle). */
  def hashString(s: String): Long = hash(UTF8String.fromString(s))

  def simhash(c: Column): Column =
    graftShim.column(SimHash64Expr(graftShim.expression(c)))
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${child.dataType}")
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
