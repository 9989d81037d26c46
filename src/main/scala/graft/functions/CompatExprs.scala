package graft.functions

import org.apache.spark.sql.catalyst.expressions._
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
