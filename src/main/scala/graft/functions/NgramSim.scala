package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused ClickHouse-`ngramDistance` kernel (SURVEY §2 C48): one
  * codegen'd pass per row computing BOTH set sizes the similarity
  * needs — the document's distinct char-3-gram count and the size of
  * its intersection with a build-time query gram set — as
  * `array<bigint>[n_grams, inter]`.
  *
  * Why a kernel and not the Column tree (the round-14 verdict's weak
  * flag, TextQueries.scala `text_ngram_sim`): the declarative form
  * `array_distinct(transform(sequence(...), i -> lower(text).substr(i,3)))`
  * (a) re-evaluates `lower(text)` once PER TRIGRAM because HOF lambda
  * bodies evaluate per element — O(L) evaluations of an O(L)
  * expression — and (b) higher-order functions are CodegenFallback,
  * so the whole tree runs interpreted. Measured 11.08 s at sf0.1 in
  * the driver bench; this kernel lowercases once and walks the bytes
  * once inside whole-stage codegen — the [[MinHash128]] precedent
  * (106× on the same failure shape) applied verbatim.
  *
  * EXACTNESS (the gate hash-compares against DuckDB's true
  * `list_distinct`, so a probabilistic distinct would be wrong by
  * construction): a 3-char gram spanning ≤ 7 bytes packs INJECTIVELY
  * into one long — `(len << 56) | bytes` — and dedups in a primitive
  * open-addressing set (zero allocation; covers all-ASCII and most
  * 2-byte-char text). Grams spanning > 7 bytes (3 chars can reach 12)
  * fall back to a UTF8String object set. The two classes are disjoint
  * by byte length, so `distinct = longSet.size + objSet.size` is the
  * exact distinct-gram count.
  *
  * Semantics are BIT-IDENTICAL to the declarative form (spec-pinned
  * in NgramSimSpec): grams are the char-based 3-substrings of
  * `lower(text)` at positions 1..len-2; len < 3 → [0, 0]. The DuckDB
  * oracle replays the same decomposition independently
  * (TextQueries.ngramSimSql).
  */
object NgramSim {

  /** Open-addressing set of NONZERO longs (0 = empty slot; packed
    * grams are nonzero by construction — the length prefix is ≥ 3).
    * Linear probing, grow at 50% load.
    */
  private final class LongSet(initCap: Int) {
    private var mask = {
      var c = 16; while (c < initCap * 2) c <<= 1; c - 1
    }
    private var arr = new Array[Long](mask + 1)
    var size = 0
    /** true iff v was newly inserted */
    def add(v: Long): Boolean = {
      var i = mix(v) & mask
      while (true) {
        val cur = arr(i)
        if (cur == v) return false
        if (cur == 0L) {
          arr(i) = v; size += 1
          if (size * 2 > mask) grow()
          return true
        }
        i = (i + 1) & mask
      }
      false
    }
    def contains(v: Long): Boolean = {
      var i = mix(v) & mask
      while (true) {
        val cur = arr(i)
        if (cur == v) return true
        if (cur == 0L) return false
        i = (i + 1) & mask
      }
      false
    }
    private def mix(v: Long): Int = {
      val h = v * -0x61c8864680b583ebL // golden-ratio multiplier
      (h ^ (h >>> 32)).toInt
    }
    private def grow(): Unit = {
      val old = arr
      mask = mask * 2 + 1
      arr = new Array[Long](mask + 1)
      var j = 0
      while (j < old.length) {
        val v = old(j)
        if (v != 0L) {
          var i = mix(v) & mask
          while (arr(i) != 0L) i = (i + 1) & mask
          arr(i) = v
        }
        j += 1
      }
    }
  }

  /** Pack gram bytes b[from, to) (to-from ≤ 7) into one long:
    * injective via the length prefix; nonzero since len ≥ 3.
    */
  private def pack(b: Array[Byte], from: Int, to: Int): Long = {
    var v = (to - from).toLong << 56
    var k = from
    while (k < to) { v |= (b(k) & 0xffL) << ((to - 1 - k) * 8); k += 1 }
    v
  }

  /** Immutable query gram set, shipped to executors via
    * `ctx.addReferenceObj` (serialized once per task, not per row).
    * Grams are pre-lowered at query-set build; both representations
    * (packed long / UTF8String) are held so membership tests match
    * the document-side class split.
    */
  final class QuerySet(grams: Array[String]) extends Serializable {
    @transient private lazy val (packed, objs) = {
      val ls = new java.util.HashSet[java.lang.Long]()
      val os = new java.util.HashSet[UTF8String]()
      grams.foreach { g =>
        val u = UTF8String.fromString(g).toLowerCase
        val b = u.getBytes
        if (b.length <= 7) ls.add(pack(b, 0, b.length)) else os.add(u)
      }
      (ls, os)
    }
    def containsPacked(v: Long): Boolean = packed.contains(v)
    def containsObj(g: UTF8String): Boolean = objs.contains(g)
  }

  /** Runtime kernel shared by interpreted eval and generated code:
    * one toLowerCase, one byte walk, zero allocation per ASCII gram.
    * O(L) per row.
    */
  def counts(s: UTF8String, q: QuerySet): GenericArrayData = {
    val t = s.toLowerCase
    val b = t.getBytes
    val nBytes = b.length
    val set = new LongSet(64)
    var objSet: java.util.HashSet[UTF8String] = null
    var inter = 0L
    // circular buffer of the last 4 char-start offsets: the gram
    // starting at char c-2 ends where char c ends
    val starts = new Array[Int](4)
    var nChars = 0
    var j = 0
    while (j < nBytes) {
      starts(nChars & 3) = j
      nChars += 1
      j += UTF8String.numBytesForFirstByte(b(j))
      if (nChars >= 3) {
        val gs = starts((nChars - 3) & 3)
        if (j - gs <= 7) {
          val v = pack(b, gs, j)
          if (set.add(v) && q.containsPacked(v)) inter += 1
        } else {
          if (objSet == null) objSet = new java.util.HashSet[UTF8String]()
          val g = UTF8String.fromBytes(b, gs, j - gs)
          if (objSet.add(g) && q.containsObj(g)) inter += 1
        }
      }
    }
    val nGrams = set.size.toLong +
      (if (objSet == null) 0L else objSet.size.toLong)
    new GenericArrayData(Array(nGrams, inter))
  }

  /** NULL text counts as zero grams — the semantics of the
    * declarative tree this kernel replaced (`when(length >= 3, ...)
    * .otherwise(array())`: a NULL length falls to the empty array)
    * and of the DuckDB oracle's `CASE ... ELSE []` (round-16 ADVICE
    * fix — UnaryExpression null propagation had made NULL text yield
    * a NULL array, a latent gate divergence on NULL-bearing corpora).
    */
  def countsNullSafe(s: UTF8String, q: QuerySet): GenericArrayData =
    if (s == null) new GenericArrayData(Array(0L, 0L)) else counts(s, q)

  /** `[n_grams, inter]` of `text` against the fixed `queryGrams`. */
  def counts(text: Column, queryGrams: Seq[String]): Column =
    graftShim.column(
      NgramSimExpr(graftShim.expression(text), queryGrams))
}

case class NgramSimExpr(child: Expression, queryGrams: Seq[String])
    extends UnaryExpression {

  @transient private lazy val qset =
    new NgramSim.QuerySet(queryGrams.toArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_sim requires a string input, got ${child.dataType}")
  override def prettyName: String = "ngram_sim"

  // NULL text counts as zero grams ([0, 0]) — never NULL out, matching
  // the replaced declarative tree and the oracle (round-16 ADVICE fix)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    NgramSim.countsNullSafe(
      child.eval(input).asInstanceOf[UTF8String], qset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("ngramQuerySet", qset,
      classOf[NgramSim.QuerySet].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.functions.NgramSim.countsNullSafe(
          ${childGen.isNull} ? null : ${childGen.value}, $q);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramSimExpr =
    copy(child = newChild)
}
