package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** ClickHouse `topK(k)` / `approxTopK` — frequency heavy hitters via
  * the SpaceSaving sketch (Metwally, Agrawal, El Abbadi, "Efficient
  * computation of frequent and top-k elements in data streams",
  * ICDT 2005), the missing member of the repo's mergeable-sketch
  * family (HLL = distincts, grid = quantiles, CMS = point counts —
  * this one is top-k frequencies).
  *
  * State is AT MOST k counters (item, count, err) per group at any
  * corpus size. Weighted insert: a tracked item adds to its counter;
  * an untracked item with free space starts at (w, 0); otherwise it
  * REPLACES the minimum counter m, inheriting its count — (item,
  * m.count + w, err = m.count). Invariants (the sketch's guarantee,
  * spec-pinned): count ≥ true ≥ count − err for every tracked item,
  * and any item with true frequency > n/k is tracked.
  *
  * Eviction picks the least (count, item) pair — the item tie-break
  * makes the sketch a DETERMINISTIC function of its insertion
  * sequence, which is what lets the gate replay it register-for-
  * register in DuckDB.
  *
  * Two build paths, one kernel:
  *  - [[topKSketch]]: the production aggregate (Aggregator, k-bounded
  *    state, map-side combinable, merge per Mergeable Summaries —
  *    Agarwal et al., PODS 2012). Like CH's own `topK`, its registers
  *    depend on partition merge order — fine for serving, not oracle-
  *    replayable.
  *  - [[foldOrdered]]: the deterministic register-level build the GATE
  *    uses — folds the (grp, item)-collapsed cell table in ascending
  *    item order through the identical insert rule, as one `aggregate`
  *    HOF; DuckDB replays the same fold as a recursive CTE. Input is
  *    the distinct-item cell table (ksTest's state-bounding move), so
  *    the collected array is distinct-value-bounded — the UNBOUNDED-
  *    corpus path is [[topKSketch]]; this one is the semantics pin.
  */
object SpaceSaving {

  final case class Ctr(v: Long, c: Long, e: Long)

  // ------------------------------------------------ plain-Scala kernel

  /** One weighted insert. Deterministic: eviction takes the least
    * (count, item) counter.
    */
  def insert(regs: List[Ctr], v: Long, w: Long, k: Int): List[Ctr] = {
    require(w > 0 && k >= 1)
    val i = regs.indexWhere(_.v == v)
    if (i >= 0) regs.updated(i, regs(i).copy(c = regs(i).c + w))
    else if (regs.size < k) regs :+ Ctr(v, w, 0L)
    else {
      val m = regs.minBy(r => (r.c, r.v))
      regs.map(r =>
        if (r.c == m.c && r.v == m.v) Ctr(v, r.c + w, r.c) else r)
    }
  }

  /** Conservative overestimate-preserving merge (Agarwal et al. 2012):
    * an item absent from one side takes that side's minimum counter as
    * both count and error contribution (the largest count an untracked
    * item could have had there), then the union truncates to the top k
    * by (count desc, item asc). Under-k sides have min 0, so merging
    * exact (under-k) sketches is EXACT — the property the map-side
    * combine leans on early in a scan.
    */
  def merge(a: List[Ctr], b: List[Ctr], k: Int): List[Ctr] = {
    val minA = if (a.size < k) 0L else a.map(_.c).min
    val minB = if (b.size < k) 0L else b.map(_.c).min
    val am = a.map(r => r.v -> r).toMap
    val bm = b.map(r => r.v -> r).toMap
    (am.keySet ++ bm.keySet).toSeq
      .map { v =>
        val ra = am.get(v); val rb = bm.get(v)
        Ctr(v,
          ra.map(_.c).getOrElse(minA) + rb.map(_.c).getOrElse(minB),
          ra.map(_.e).getOrElse(minA) + rb.map(_.e).getOrElse(minB))
      }
      .sortBy(r => (-r.c, r.v)).take(k).toList
  }

  // ------------------------------------------- production Aggregator

  final case class Buf(var regs: List[Ctr])

  class TopKAgg(k: Int) extends Aggregator[(Long, Long), Buf, Seq[Ctr]] {
    require(k >= 1)
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, x: (Long, Long)): Buf = {
      b.regs = insert(b.regs, x._1, x._2, k); b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      a.regs = SpaceSaving.merge(a.regs, b.regs, k); a
    }
    override def finish(b: Buf): Seq[Ctr] =
      b.regs.sortBy(r => (-r.c, r.v))
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Ctr]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ctr]]()
  }

  /** Production aggregate: topKSketch(k)(item, weight) → array of
    * (v, c, e) registers sorted by (count desc, item). k-bounded
    * state, map-side combinable; registers depend on merge order
    * (like CH topK) — serve from it, don't oracle-gate it.
    */
  def topKSketch(k: Int)(v: Column, w: Column): Column =
    udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(v, w)

  // ------------------------------------- deterministic ordered build

  /** Register-level deterministic build: fold a SORTED array of
    * struct(v, c) cells through the insert rule. One `aggregate` HOF
    * with a ≤k-element array state — no per-step column blowup; the
    * exact fold DuckDB replays as a recursive CTE.
    */
  def foldOrdered(cells: Column, k: Int): Column = {
    require(k >= 1)
    aggregate(
      cells,
      expr("CAST(array() AS array<struct<v:bigint,c:bigint,e:bigint>>)"),
      (acc, x) => {
        val xv = x.getField("v")
        val xc = x.getField("c")
        val hit = exists(acc, s => s.getField("v") === xv)
        val minS = array_min(transform(acc, s =>
          struct(s.getField("c").as("c"), s.getField("v").as("v"))))
        when(hit,
          transform(acc, s =>
            when(s.getField("v") === xv,
              struct(s.getField("v").as("v"),
                (s.getField("c") + xc).as("c"),
                s.getField("e").as("e")))
              .otherwise(s)))
          .when(size(acc) < k,
            concat(acc, array(struct(xv.as("v"), xc.as("c"),
              lit(0L).as("e")))))
          .otherwise(
            transform(acc, s =>
              when(s.getField("c") === minS.getField("c") &&
                s.getField("v") === minS.getField("v"),
                struct(xv.as("v"), (s.getField("c") + xc).as("c"),
                  s.getField("c").as("e")))
                .otherwise(s)))
      })
  }
}
