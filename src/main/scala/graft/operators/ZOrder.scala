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

  /** Spread the low 16 bits of x to even bit positions (Morton). */
  private def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = (m.bitwiseOR(shiftleft(m, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value interleaving the low 16 bits of `a` (even
    * positions) and `b` (odd). Monotone in each dimension when the
    * other is fixed. Inputs must be non-negative.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long"))
      .bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

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
  private def spread16Sql(x: String): String = {
    val m = s"(CAST($x AS BIGINT) & 65535)"
    val a = s"((($m | ($m << 8)) & 16711935))"
    val b = s"((($a | ($a << 4)) & 252645135))"
    val c = s"((($b | ($b << 2)) & 858993459))"
    s"((($c | ($c << 1)) & 1431655765))"
  }

  /** DuckDB replica of [[zValue]]. */
  def zValueSql(aExpr: String, bExpr: String): String =
    s"(${spread16Sql(aExpr)} | (${spread16Sql(bExpr)} << 1))"
}
