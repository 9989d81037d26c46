package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data clustering — the file-skipping layout for
  * multi-column predicates (the ClickHouse analogue is a compound
  * ORDER BY; Z-order beats it when queries filter BOTH dimensions
  * independently, e.g. (user, time-range) point-range lookups over
  * events).
  *
  * At 100 TB the win is not the query plan but the FILE STATISTICS:
  * parquet row-group/file min-max on z-clustered data gives every
  * file a tight box in (a, b) space, so a conjunctive predicate
  * prunes ~sqrt-proportionally many files instead of scanning all of
  * them. The cluster step is one range shuffle on the z-value — the
  * same cost as any global sort-write.
  *
  * The interleave itself is five mask-shift rounds per dimension
  * (the standard Morton spread) — pure 64-bit integer ops, fully
  * inside whole-stage codegen, and bit-identical in any engine with
  * integer shifts, which is what lets the DuckDB oracle gate it.
  */
object ZOrder {

  /** Spread the low 31 bits of x to even bit positions (Morton).
    *
    * 31 bits/dim (not 32) is deliberate: the odd-position dimension is
    * shifted left once more, so a 32nd bit would land on bit 63 — the
    * sign bit of a two's-complement BIGINT — and z values would flip
    * negative for ids >= 2^31, breaking the signed-comparison ordering
    * that both Spark's range partitioner and DuckDB's ORDER BY use.
    * 31 bits keeps the full z in bits 0..61, always non-negative, and
    * raises the aliasing threshold from 65,535 (the old 16-bit spread)
    * to 2,147,483,647 — beyond any per-key id a 100 TB events table
    * produces before keys must be re-hashed anyway.
    */
  private def spread31(x: Column): Column = {
    val m = x.bitwiseAND(lit(0x7FFFFFFFL))
    val a = (m.bitwiseOR(shiftleft(m, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x3333333333333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Z-value interleaving the low 31 bits of `a` (even
    * positions) and `b` (odd). Monotone in each dimension when the
    * other is fixed. Inputs must be non-negative.
    */
  def zValue(a: Column, b: Column): Column =
    spread31(a.cast("long"))
      .bitwiseOR(shiftleft(spread31(b.cast("long")), 1))

  /** Rewrite `df` into `nFiles` z-clustered output slices: range-
    * partition on the z-value, sort within partitions. Each output
    * file then covers a compact Z-curve segment = a tight (a, b) box
    * for min-max pruning. One shuffle, same cost as a sort-write.
    */
  def cluster(df: DataFrame, a: Column, b: Column, nFiles: Int): DataFrame =
    df.withColumn("_z", zValue(a, b))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** The same Morton spread as DuckDB SQL over expression `x`. */
  private def spread31Sql(x: String): String = {
    val m = s"(CAST($x AS BIGINT) & 2147483647)"
    val a = s"((($m | ($m << 16)) & 281470681808895))"
    val b = s"((($a | ($a << 8)) & 71777214294589695))"
    val c = s"((($b | ($b << 4)) & 1085102592571150095))"
    val d = s"((($c | ($c << 2)) & 3689348814741910323))"
    s"((($d | ($d << 1)) & 6148914691236517205))"
  }

  /** DuckDB replica of [[zValue]]. */
  def zValueSql(aExpr: String, bExpr: String): String =
    s"(${spread31Sql(aExpr)} | (${spread31Sql(bExpr)} << 1))"
}
