package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 128-way MinHash signature (Broder 1997, "On the resemblance
  * and containment of documents") over char-5-gram shingles — one
  * codegen'd pass per row.
  *
  * Bit-identical to the declarative formulation in
  * [[graft.operators.Dedup.minhashSignature]] (spec-enforced), which
  * builds 128 ArrayAggregate expressions that EACH re-evaluate the
  * shingle-hash array: Catalyst has no common-subexpression
  * elimination across aggregate HOFs, so the Column tree hashes every
  * shingle 128 times — measured 266 s for 6 000 documents at sf0.1
  * (local[16]). This kernel hashes each shingle once and updates the
  * 128 running minima in a local array: the shingling stage drops to
  * O(shingles + 128·shingles) cheap multiply-mods per document.
  *
  * Semantics per shingle (the coefficients come from
  * [[graft.operators.Dedup.coeffs]], the prime is
  * [[graft.operators.Dedup.MinhashPrime]]):
  *   h   = xxhash64(substr(text, i, 5))        (seed 42, Spark's fn)
  *   x32 = ((h >> 32) ^ h) & 0xFFFFFFFF
  *   m_j = (a_j * x32 + b_j) mod p, minimized over shingles.
  */
object MinHash128 {

  val NumHashes = 128

  private val as: Array[Long] =
    graft.operators.Dedup.coeffs(NumHashes).map(_._1).toArray
  private val bs: Array[Long] =
    graft.operators.Dedup.coeffs(NumHashes).map(_._2).toArray
  private val P: Long = graft.operators.Dedup.MinhashPrime

  /** Runtime kernel shared by interpreted eval and generated code.
    *
    * Round 17 (optimization): two changes to the same arithmetic.
    *  - The shingle window walks BYTE offsets incrementally (one
    *    `numBytesForFirstByte` step per char) and hashes the slice
    *    zero-copy via `XXH64.hashUnsafeBytes` — the previous
    *    `substringSQL(i + 1, 5)` re-walked the string from char 0 on
    *    every shingle (O(n²) per document) and copied each 5-char
    *    window into a fresh UTF8String. Identical bytes reach XXH64
    *    (hashUTF8String is hashUnsafeBytes over the string's own
    *    base/offset/len), so hashes are bit-identical.
    *  - `x mod (2^32+15)` uses the special form of the prime:
    *    t = q·2^32 + lo ≡ lo − 15q (mod P) since 2^32 ≡ −15 (mod P).
    *    With a ≤ 2^29 and x32 < 2^32, t < 2^61, so q < 2^29,
    *    lo − 15q ∈ (−2·P, P) and at most two conditional adds land it
    *    in [0, P) — integer-exact, no 64-bit division. Bit-equality
    *    with the declarative form stays spec-enforced
    *    (DedupStressSpec / CoercionPropertySpec).
    */
  def sig(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    // endB = byte offset just past the window's last char; the first
    // window spans chars [0, 5) (the whole string when shorter).
    var startB = 0
    var endB = 0
    var k = 0
    while (k < 5 && endB < nb) {
      endB += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + endB))
      k += 1
    }
    if (endB > nb) endB = nb // malformed-UTF8 clamp (substringSQL clamps too)
    var more = true
    while (more) {
      val h = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, 42L)
      val x32 = ((h >>> 32) ^ h) & 0xFFFFFFFFL
      var j = 0
      while (j < NumHashes) {
        val t = as(j) * x32 + bs(j)
        val q = t >>> 32
        var m = (t & 0xFFFFFFFFL) - 15L * q
        if (m < 0L) { m += P; if (m < 0L) m += P }
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      // one more shingle exists iff the window end hasn't hit the end
      more = endB < nb
      if (more) {
        startB += UTF8String.numBytesForFirstByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + startB))
        endB += UTF8String.numBytesForFirstByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + endB))
        if (endB > nb) endB = nb
        if (startB > endB) startB = endB
      }
    }
    new GenericArrayData(mins)
  }

  def signature(text: Column): Column =
    graftShim.column(MinHash128Expr(graftShim.expression(text)))
}

case class MinHash128Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash128 requires a string input, got ${child.dataType}")
  override def prettyName: String = "minhash128"

  override protected def nullSafeEval(input: Any): Any =
    MinHash128.sig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash128.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash128Expr =
    copy(child = newChild)
}
