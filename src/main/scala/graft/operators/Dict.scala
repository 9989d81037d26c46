package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse external dictionaries (round 12): `dictGet('dim',
  * 'attr', key)` — the hot-dimension pattern where the dim table is
  * loaded ONCE and every lookup is a local hash probe, never a join.
  *
  * Spark-first shape: the dimension collects to a driver map (bounded
  * and guarded — the trained-model precedent: centroids, codebooks,
  * BPE merges) and compiles into the plan as a `typedlit` map literal;
  * `element_at` is then a codegen'd per-row probe with NO shuffle, no
  * broadcast exchange, not even a BroadcastHashJoin build side. For a
  * 25-row nation dim this beats any join at any fact scale; the loud
  * `maxRows` guard keeps the pattern honest (a dim too big to compile
  * in is a broadcast JOIN, not a dictionary — refuse, don't spill).
  *
  * Missing keys → NULL ([[get]]) or a caller default ([[getOrDefault]]
  * — CH's dictGetOrDefault).
  */
object Dict {

  /** Collect (key → value) off a dimension table; refuses loudly past
    * `maxRows` (compile-time plan literals must stay small).
    *
    * Default set from the MEASURED typedlit-map plan envelope
    * (tools/plan_envelope_r13.json, dict_map probe): 16384 entries ≈
    * 0.75 MB serialized ≈ 0.05-0.14 s marginal per stage launch
    * (32-256 tasks) — cheap; 65536 entries ≈ 3 MB ≈ 0.23-0.62 s per
    * stage launch — at that size a broadcast join (one build, reused
    * across stages) is already the better shape, which is exactly
    * what the refusal message says to do.
    */
  def fromTable(dim: DataFrame, keyCol: String, valCol: String,
                maxRows: Int = 16384): Map[Long, String] = {
    val rows = dim.select(col(keyCol).cast("long"),
      col(valCol).cast("string")).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"Dict.fromTable: dimension exceeds maxRows=$maxRows — use a " +
        "broadcast join for dims too big to compile into the plan")
    rows.map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  /** dictGet: per-row codegen'd map probe; missing keys → NULL. */
  def get(dict: Map[Long, String], key: Column): Column =
    element_at(typedlit(dict), key.cast("long"))

  /** dictGetOrDefault. */
  def getOrDefault(dict: Map[Long, String], key: Column,
                   default: String): Column =
    coalesce(get(dict, key), lit(default))
}
