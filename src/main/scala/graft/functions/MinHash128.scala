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

  /** Runtime kernel shared by interpreted eval and generated code. */
  def sig(s: UTF8String): GenericArrayData = {
    val nShingles = math.max(1, s.numChars() - 4)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val h = XXH64.hashUTF8String(s.substringSQL(i + 1, 5), 42L)
      val x32 = ((h >>> 32) ^ h) & 0xFFFFFFFFL
      var j = 0
      while (j < NumHashes) {
        val m = (as(j) * x32 + bs(j)) % P
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
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
