package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ClickHouse `empty`/`notEmpty`: defined over strings AND arrays/maps
  * (arrays are the primary CH use). Spark's Length only accepts
  * string/binary, so the replacement is picked per the resolved child
  * type — a RuntimeReplaceable, so codegen sees only the plain
  * Size/Length comparison.
  */
case class EmptyLike(child: Expression, negate: Boolean)
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = {
    val sz = child.dataType match {
      case _: ArrayType | _: MapType => Size(child)
      case _                         => Length(child)
    }
    if (negate) GreaterThan(sz, Literal(0)) else EqualTo(sz, Literal(0))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Shared runtime kernels of the fused numeric-array folds (round 18).
  * Element extraction replays `Cast(x, DoubleType)` per element type;
  * the fold order is the declarative lambda's (left to right, one IEEE
  * add per element), so results are bit-identical to the
  * `ArrayAggregate` forms they replace.
  */
object CompatKernels {
  // element-type tags so generated code stays a single static call
  final val TDouble = 0; final val TFloat = 1; final val TLong = 2
  final val TInt = 3; final val TShort = 4; final val TByte = 5
  final val TDecimal = 6

  def tagOf(dt: DataType): Int = dt match {
    case DoubleType => TDouble
    case FloatType => TFloat
    case LongType => TLong
    case IntegerType => TInt
    case ShortType => TShort
    case ByteType => TByte
    case _: DecimalType => TDecimal
  }

  private def getD(a: ArrayData, i: Int, tag: Int, p: Int, s: Int): Double =
    tag match {
      case TDouble => a.getDouble(i)
      case TFloat => a.getFloat(i).toDouble
      case TLong => a.getLong(i).toDouble
      case TInt => a.getInt(i).toDouble
      case TShort => a.getShort(i).toDouble
      case TByte => a.getByte(i).toDouble
      case TDecimal => a.getDecimal(i, p, s).toDouble
    }

  /** aggregate(arr, 0.0, (acc, x) -> acc + double(x)): a NULL element
    * nulls the running sum and every later add keeps it NULL, so the
    * fused form returns NULL on the first NULL element.
    */
  def doubleFold(a: ArrayData, tag: Int, p: Int, s: Int): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += getD(a, i, tag, p, s)
      i += 1
    }
    acc
  }

  /** Running double sums: out(i) = out(i-1) + double(x_i) with out(-1)
    * = 0.0; a NULL element (or NULL running sum) makes out(i) and
    * every later element NULL — exactly the declarative
    * `aggregate(..., concat(acc, [last + x]))` build, minus its O(n²)
    * array copies.
    */
  def cumSumDouble(a: ArrayData, tag: Int, p: Int, s: Int): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var last: java.lang.Double = 0.0
    var i = 0
    while (i < n) {
      if (last == null || a.isNullAt(i)) { out(i) = null; last = null }
      else {
        val v: java.lang.Double = last.doubleValue() + getD(a, i, tag, p, s)
        out(i) = v.doubleValue()
        last = v
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused left-to-right double sum over a numeric array (round 18) —
  * bit-identical to `aggregate(arr, 0d, (acc, x) -> acc + double(x))`,
  * whose interpreted lambda walks dominated the CH array-function
  * gates at 10× scale.
  */
case class DoubleFoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_fold"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def decP: Int = elemType match {
    case d: DecimalType => d.precision; case _ => 0 }
  private def decS: Int = elemType match {
    case d: DecimalType => d.scale; case _ => 0 }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_fold requires array<numeric>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CompatKernels.doubleFold(input.asInstanceOf[ArrayData],
      CompatKernels.tagOf(elemType), decP, decS)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tag = CompatKernels.tagOf(elemType)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("folded")
      s"""
         |java.lang.Double $r =
         |  graft.functions.CompatKernels.doubleFold($c, $tag, $decP, $decS);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DoubleFoldExpr =
    copy(child = newChild)
}

/** Fused running double sums over a numeric array (round 18) — the
  * linear form of the declarative arrayCumSum fold, which rebuilt the
  * accumulator array per element (O(n²) copies through an interpreted
  * lambda).
  */
case class CumSumDoubleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cum_sum_double"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def decP: Int = elemType match {
    case d: DecimalType => d.precision; case _ => 0 }
  private def decS: Int = elemType match {
    case d: DecimalType => d.scale; case _ => 0 }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cum_sum_double requires array<numeric>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CompatKernels.cumSumDouble(input.asInstanceOf[ArrayData],
      CompatKernels.tagOf(elemType), decP, decS)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tag = CompatKernels.tagOf(elemType)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompatKernels.cumSumDouble($c, $tag, $decP, $decS)")
  }

  override protected def withNewChildInternal(newChild: Expression): CumSumDoubleExpr =
    copy(child = newChild)
}
