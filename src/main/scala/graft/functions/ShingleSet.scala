package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused sorted-distinct char-5-gram shingle set — one codegen'd pass
  * per row, bit-identical to the declarative
  * `array_sort(array_distinct(Dedup.shingleHashes(text)))` it replaces
  * in the exact set-overlap dedup family (spec-enforced equality).
  *
  * Why (round 17, optimization): the declarative form pays three
  * separate array operators per row (transform + array_distinct's
  * per-row hash set + array_sort), and the `substr(i, 5)` inside the
  * transform re-walks the string from char 0 for every shingle —
  * O(n²) per document, exactly the cost the fused MinHash128 kernel
  * removed from the signature side. This kernel walks the UTF-8 byte
  * offsets incrementally, hashes each window zero-copy with the same
  * `xxhash64` (seed 42) the declarative form uses, then sorts and
  * uniquifies a primitive long buffer in place: O(n log n), no
  * per-element allocation.
  *
  * Shingle semantics match `Dedup.shingleHashes` exactly:
  * `max(1, numChars - 4)` windows of 5 chars (the whole string when
  * shorter than 5 chars, the empty string hashing as itself).
  */
object ShingleSet {

  /** Runtime kernel shared by interpreted eval and generated code. */
  def sortedSet(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    // shingle count = max(1, numChars - 4) <= max(1, nb)
    val buf = new Array[Long](math.max(1, nb))
    var cnt = 0
    var startB = 0
    var endB = 0
    var k = 0
    while (k < 5 && endB < nb) {
      endB += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + endB))
      k += 1
    }
    if (endB > nb) endB = nb
    var more = true
    while (more) {
      buf(cnt) = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, 42L)
      cnt += 1
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
    java.util.Arrays.sort(buf, 0, cnt)
    // in-place unique on the sorted prefix
    var w = 0
    var i = 1
    while (i < cnt) {
      if (buf(i) != buf(w)) { w += 1; buf(w) = buf(i) }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 0, w + 1))
  }

  def sorted(text: Column): Column =
    graftShim.column(ShingleSetExpr(graftShim.expression(text)))
}

case class ShingleSetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires a string input, got ${child.dataType}")
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.sortedSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.sortedSet($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}
