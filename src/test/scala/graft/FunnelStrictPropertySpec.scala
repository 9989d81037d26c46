package graft

import org.apache.spark.sql.functions._
import graft.operators.ChAnalytics

/** windowFunnelStrictOrder vs a plain-Scala simulation on randomized
  * event streams — the operator's window algebra (rank + per-step
  * mins + consecutive-prefix level) must agree with the obvious
  * sequential definition on every stream shape, including ties,
  * repeats, missing anchors, and window cutoffs.
  */
class FunnelStrictPropertySpec extends SparkFunSuite {
  import spark.implicits._

  private val types = Vector("view", "click", "purchase", "other")
  private val steps = Vector("view", "click", "purchase")

  /** The sequential definition: sort by (ts, eid); anchor = first
    * 'view'; level = 1 + longest prefix of steps found at CONSECUTIVE
    * positions after the anchor, each within `window` of the anchor.
    */
  private def simulate(events: Seq[(Long, Long, String)],
                       window: Long): Int = {
    val sorted = events.sortBy(e => (e._2, e._1)) // (ts, eid)
    val a = sorted.indexWhere(_._3 == "view")
    if (a < 0) return 0
    val t0 = sorted(a)._2
    var lvl = 1
    var pos = a
    var next = 1
    while (next < steps.length && pos + 1 < sorted.length &&
      sorted(pos + 1)._3 == steps(next) && sorted(pos + 1)._2 <= t0 + window) {
      lvl += 1; pos += 1; next += 1
    }
    lvl
  }

  test("random streams: operator level == sequential simulation") {
    val rnd = new scala.util.Random(4242)
    val users = 400
    val evs = (0 until users).flatMap { u =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map { i =>
        // coarse ts grid on purpose: ties are common, the (ts, eid)
        // tie-break must resolve them identically on both sides
        (u.toLong, (u * 1000 + i).toLong,
          rnd.nextInt(8).toLong * 10, types(rnd.nextInt(types.length)))
      }
    }
    val df = evs.toDF("user_id", "event_id", "ts", "event_type")
    val got = ChAnalytics.windowFunnelStrictOrder(df, col("user_id"),
        col("ts"), col("event_id"), 35L,
        steps.map(t => col("event_type") === t))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = evs.groupBy(_._1).view.mapValues { es =>
      simulate(es.map(e => (e._2, e._3, e._4)).map(t => (t._1, t._2, t._3)), 35L)
    }.toMap
    assert(got.keySet == expected.keySet)
    val diffs = got.collect {
      case (u, l) if l != expected(u) => (u, l, expected(u))
    }
    assert(diffs.isEmpty, s"mismatches (user, got, expected): ${diffs.take(5)}")
  }
}
