package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation (SURVEY.md §5): keeps the k best
  * (score, id) pairs per group IN THE PARTIAL AGGREGATE, so a top-k
  * over a 100 TB scored join shuffles at most k rows per group per
  * input partition — where a window row_number() plan would shuffle and
  * sort every scored row.
  *
  * Order: score descending, id ascending on ties — a total order, so
  * results are deterministic and engine-comparable.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  final case class Buf(var entries: List[Entry])

  private def ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)] { case (s, id) => (-s, id) }

  private def trim(xs: List[Entry], k: Int): List[Entry] =
    xs.sorted(ord).take(k)

  class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, e: Entry): Buf = {
      b.entries = trim(e :: b.entries, k); b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      a.entries = trim(a.entries ++ b.entries, k); a
    }
    override def finish(b: Buf): Seq[Entry] = trim(b.entries, k)
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column aggregate: topk(score, id) -> array<struct<_1: double, _2: bigint>>. */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}
