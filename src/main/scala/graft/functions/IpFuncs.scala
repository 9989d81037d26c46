package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse IPv4 functions (round 13): `IPv4NumToString`,
  * `IPv4StringToNum`, `IPv4CIDRToRange` — the log-analytics address
  * family (subnet rollups, CIDR range predicates). Everything is
  * integer arithmetic + string assembly — no floats anywhere, so every
  * output replays exactly in any engine.
  *
  * Addresses are unsigned 32-bit values carried in LONGs (CH's UInt32
  * discipline, like uint_wraparound); out-of-range inputs are the
  * caller's contract, matching CH (which truncates silently — callers
  * mask with `& 0xFFFFFFFF` first).
  */
object IpFuncs {

  /** 192.168.0.1-style dotted quad from the numeric address. */
  def ipv4NumToString(n: Column): Column =
    concat_ws(".",
      shiftright(n, 24).bitwiseAND(lit(255L)).cast("string"),
      shiftright(n, 16).bitwiseAND(lit(255L)).cast("string"),
      shiftright(n, 8).bitwiseAND(lit(255L)).cast("string"),
      n.bitwiseAND(lit(255L)).cast("string"))

  /** Numeric address from a dotted quad (the inverse — gate-proven
    * roundtrip). Malformed strings yield NULL — strictly: exactly four
    * dot-separated fields, each a numeric octet in [0,255]. Without the
    * gate, '300.1.1.1' would silently wrap into arithmetic garbage and
    * '1.2.3.4.5' would parse as its first four octets (r13 advice).
    */
  def ipv4StringToNum(s: Column): Column = {
    // shape-gate BEFORE any cast: under ANSI mode a bare cast on a
    // non-numeric field throws instead of nulling, so the regex must
    // prove every field is 1-3 digits (exactly four fields) first
    val shaped = s.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
    val p = split(s, "\\.")
    def oct(i: Int): Column = element_at(p, i).cast("long")
    val inRange = oct(1) <= 255L && oct(2) <= 255L &&
      oct(3) <= 255L && oct(4) <= 255L
    when(shaped && inRange,
      oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4))
      .otherwise(lit(null).cast("long"))
  }

  /** CIDR range [lo, hi] of the /prefix network containing `n`
    * (CH IPv4CIDRToRange). prefix is a literal 0..32.
    */
  def ipv4CidrRange(n: Column, prefix: Int): (Column, Column) = {
    require(prefix >= 0 && prefix <= 32, s"bad prefix $prefix")
    val span = if (prefix == 32) 1L else 1L << (32 - prefix)
    val mask = 0xFFFFFFFFL - (span - 1) // pure integer masking — no
    val lo = n.bitwiseAND(lit(mask))    // division, replays as & in SQL
    (lo, lo + lit(span - 1))
  }
}
