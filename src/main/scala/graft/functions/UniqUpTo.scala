package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse `uniqUpTo(N)` as a genuinely BOUNDED-STATE aggregate
  * (round 12): exact distinct count while ≤ N values have been seen,
  * the sentinel N+1 as soon as more exist. The buffer holds AT MOST
  * N+1 values at any point — once it saturates it stops absorbing —
  * so per-group state is N+1 longs at any corpus size, map-side
  * combinable, exactly CH's own state contract (a `least(countDistinct,
  * N+1)` computes the same NUMBER but shuffles every distinct value;
  * this is the version that survives a 100 TB group).
  */
object UniqUpTo {

  final case class Buf(var seen: List[Long], var saturated: Boolean)

  class UniqUpToAgg(n: Int) extends Aggregator[Long, Buf, Long] {
    require(n >= 1)
    override def zero: Buf = Buf(Nil, saturated = false)
    private def add(b: Buf, v: Long): Buf = {
      if (!b.saturated && !b.seen.contains(v)) {
        b.seen = v :: b.seen
        if (b.seen.size > n) { b.saturated = true; b.seen = Nil }
      }
      b
    }
    override def reduce(b: Buf, v: Long): Buf = add(b, v)
    override def merge(a: Buf, b: Buf): Buf = {
      if (a.saturated || b.saturated) { a.saturated = true; a.seen = Nil }
      else b.seen.foreach(add(a, _))
      a
    }
    override def finish(b: Buf): Long =
      if (b.saturated) n + 1L else b.seen.size.toLong
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column aggregate: uniqUpTo(n)(v) → exact distinct if ≤ n, else n+1. */
  def uniqUpTo(n: Int)(v: Column): Column =
    udaf(new UniqUpToAgg(n), Encoders.scalaLong).apply(v)
}
