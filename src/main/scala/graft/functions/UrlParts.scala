package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-parse URL decomposition (round 18, optimization) — the fused
  * form of the CH URL function family's N separate `parse_url(u,
  * part)` calls, each of which re-runs `new java.net.URI(u)` per row.
  * A projection like q_url_parse's (8 URL functions over one url
  * column) paid 8 URI parses per row; rewriting every registered URL
  * function as a field of THIS struct makes the 8 subtrees share one
  * identical `url_parts(u)` child, which whole-stage codegen's
  * subexpression elimination evaluates once.
  *
  * Field semantics replay Spark's `ParseUrlEvaluator` (decompiled
  * from the shipped spark-catalyst jar, and spec-pinned against live
  * `parse_url` in UrlPartsSpec) exactly:
  *   - parse = `new URI(url.toString)`; URISyntaxException → NULL
  *     struct (every field NULL, the failOnError=false contract);
  *   - protocol = getScheme, host = getHost, path = getRawPath,
  *     query = getRawQuery, ref = getRawFragment; a missing part is a
  *     NULL field.
  */
object UrlParts {

  val schema: StructType = StructType(Seq(
    StructField("protocol", StringType), StructField("host", StringType),
    StructField("path", StringType), StructField("query", StringType),
    StructField("ref", StringType)))

  // field indices, used by the GraftExtensions builders
  val Protocol = 0; val Host = 1; val Path = 2; val Query = 3; val Ref = 4

  private def f(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Runtime kernel: one URI parse, all five parts. */
  def parts(u: UTF8String): InternalRow = {
    val uri =
      try new java.net.URI(u.toString)
      catch { case _: java.net.URISyntaxException => null }
    if (uri == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](f(uri.getScheme), f(uri.getHost), f(uri.getRawPath),
        f(uri.getRawQuery), f(uri.getRawFragment)))
  }
}

case class UrlPartsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlParts.schema
  override def nullable: Boolean = true
  override def prettyName: String = "url_parts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"url_parts requires a string input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    UrlParts.parts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("urlParts")
      s"""
         |InternalRow $r = graft.functions.UrlParts.parts($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlPartsExpr =
    copy(child = newChild)
}
