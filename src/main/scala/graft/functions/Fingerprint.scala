package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a rolling hash over a string's UTF-8 bytes — the
  * document-fingerprint primitive (SURVEY.md §2 C11). A native Catalyst
  * `Expression` with `doGenCode`, so it stays inside whole-stage codegen
  * on the 100 TB scan path (a Scala UDF here would break the codegen
  * span and serialize every row through an encoder).
  *
  * FNV-1a is public domain (Fowler–Noll–Vo); constants are the standard
  * 64-bit offset basis / prime.
  */
object Fnv1a64 {
  final val OffsetBasis = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** Runtime kernel shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Reference implementation on a JVM String (spec oracle). */
  def hashString(s: String): Long =
    hash(UTF8String.fromString(s))

  def fingerprint(c: Column): Column =
    graftShim.column(Fnv1a64Expr(graftShim.expression(c)))
}

case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 requires a string input, got ${child.dataType}")
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}
