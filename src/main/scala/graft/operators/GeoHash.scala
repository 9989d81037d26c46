package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse geo functions (round 12): geohashEncode — the standard
  * public-domain geohash (Niemeyer 2008): alternate longitude/latitude
  * bisections MSB-first (lon gets the first bit), 5 bits per base32
  * character from the alphabet 0-9 b-z (minus a,i,l,o).
  *
  * Implementation: ONE fixed 2^20 × 2^20 grid — cell = floor of the
  * affine map into [0, 2^20) per dimension — interleaved by the same
  * five mask-shift Morton rounds as [[ZOrder]] (geohash's bit layout IS
  * Morton order with lon on the odd LSB positions, which is exactly
  * `ZOrder.zValue(lat, lon)` for a 40-bit code). Any precision p ≤ 8
  * is the top 5p bits of that one 40-bit z: floor(f·2^20) >> (20−k) =
  * floor(f·2^k), so truncating the fine grid equals encoding on the
  * coarse one — no per-precision grids.
  *
  * Portability: the affine map is a fixed IEEE tree (one add, one
  * divide, one multiply, floor); everything after is 64-bit integer
  * ops — bit-identical in any engine, which is what lets the DuckDB
  * oracle replay it ([[encodeSql]], same discipline as
  * ZOrder.zValueSql). Whole-stage-codegen friendly: no UDF, no
  * per-row allocation beyond the output string.
  *
  * At 100 TB geohash prefixes are the PARTITION KEY for geo data —
  * groupBy(gh4) is a plain hash shuffle on a low-cardinality string,
  * and prefix ranges map to z-curve ranges for file skipping (the
  * ZOrder.cluster story, same curve).
  */
object GeoHash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private val Grid = 1048576.0 // 2^20 cells per dimension
  private val MaxCell = 1048575L

  /** floor of the affine map of v from [-off, -off+range) onto the
    * 2^20 grid, clamped so the upper boundary (v = -off+range exactly)
    * lands in the last cell — matching reference geohash encoders.
    */
  private def cell(v: Column, off: Double, range: Double): Column =
    least(greatest(
      floor((v + lit(off)) / lit(range) * lit(Grid)).cast("long"),
      lit(0L)), lit(MaxCell))

  /** Geohash of (lon, lat) at `precision` ∈ [1, 8] characters. */
  def encode(lon: Column, lat: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 8,
      s"geohash precision must be in [1, 8], got $precision")
    val z = ZOrder.zValue(cell(lat, 90.0, 180.0), cell(lon, 180.0, 360.0))
    val alpha = array(Alphabet.map(c => lit(c.toString)): _*)
    concat((0 until precision).map { i =>
      element_at(alpha,
        (shiftright(z, 35 - 5 * i).bitwiseAND(lit(31L)) + 1L).cast("int"))
    }: _*)
  }

  /** ClickHouse `pointInPolygon((x, y), polygon)` (round 12) over
    * INTEGER coordinates — even-odd ray casting with the division-free
    * sign-adjusted cross-product test, so every decision is exact
    * 64-bit arithmetic and replays verbatim in any engine:
    *
    * edge (x1,y1)→(x2,y2) crosses the +x ray from (px,py) iff
    * (y1 > py) ≠ (y2 > py)  — the half-open vertex rule — and
    * px is left of the intersection: with d = y2−y1,
    * (d > 0 ∧ (px−x1)·d < (x2−x1)·(py−y1)) ∨ (d < 0 ∧ flipped).
    *
    * Boundary points follow the half-open rule (deterministic, the
    * standard crossing-number convention). Products stay < 2^63 for
    * coordinates up to ~2^31 — centi-degree grids use 16 bits.
    * The unrolled per-edge expression chain is pure codegen'd integer
    * ops — no UDF, no trig (unlike great-circle predicates).
    */
  def pointInPolygon(px: Column, py: Column,
                     polygon: Seq[(Long, Long)]): Column = {
    require(polygon.size >= 3, "polygon needs >= 3 vertices")
    val crossings = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.size)
      val straddles = (lit(y1) > py) =!= (lit(y2) > py)
      val d = y2 - y1
      val lhs = (px - lit(x1)) * lit(d)
      val rhs = lit(x2 - x1) * (py - lit(y1))
      val crosses =
        if (d > 0) straddles && (lhs < rhs)
        else if (d < 0) straddles && (lhs > rhs)
        else lit(false) // horizontal edge never crosses the +x ray
      when(crosses, 1L).otherwise(0L)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** DuckDB replica of [[pointInPolygon]] — the same unrolled edges,
    * the same half-open rule and sign-adjusted comparisons.
    */
  def pointInPolygonSql(pxExpr: String, pyExpr: String,
                        polygon: Seq[(Long, Long)]): String = {
    require(polygon.size >= 3)
    val terms = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.size)
      val d = y2 - y1
      val straddles = s"(($y1 > ($pyExpr)) <> ($y2 > ($pyExpr)))"
      val lhs = s"((($pxExpr) - $x1) * $d)"
      val rhs = s"(${x2 - x1} * (($pyExpr) - $y1))"
      val crosses =
        if (d > 0) s"($straddles AND $lhs < $rhs)"
        else if (d < 0) s"($straddles AND $lhs > $rhs)"
        else "FALSE"
      s"(CASE WHEN $crosses THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** DuckDB replica of [[encode]] over SQL expressions — same affine
    * tree, same Morton rounds (via ZOrder.zValueSql), same alphabet.
    */
  def encodeSql(lonExpr: String, latExpr: String, precision: Int): String = {
    require(precision >= 1 && precision <= 8)
    def cellSql(v: String, off: String, range: String) =
      s"least(greatest(CAST(floor((($v) + $off) / $range * 1048576.0) AS BIGINT), 0), 1048575)"
    val z = ZOrder.zValueSql(cellSql(latExpr, "90.0", "180.0"),
      cellSql(lonExpr, "180.0", "360.0"))
    val chars = (0 until precision).map { i =>
      s"substring('$Alphabet', CAST((($z >> ${35 - 5 * i}) & 31) AS INTEGER) + 1, 1)"
    }
    chars.mkString("concat(", ", ", ")")
  }
}
