package graft

import org.apache.spark.sql.functions._
import graft.functions.IpFuncs

/** IPv4 function family (round 13; strict parse gating round 14).
  * The r13 advice found `ipv4StringToNum` silently accepting
  * out-of-range octets ('300.1.1.1' → wrapped arithmetic value) and
  * over-length quads ('1.2.3.4.5' → first four octets), contradicting
  * its malformed→NULL contract. These pins hold the strict contract.
  */
class IpFuncsSpec extends SparkFunSuite {

  test("ipv4StringToNum: well-formed quads roundtrip through NumToString") {
    import spark.implicits._
    val ips = Seq(0L, 1L, 255L, 256L, 0x7f000001L, 0xC0A80001L,
      0xFFFFFFFFL).toDF("ip")
    val rt = ips
      .withColumn("s", IpFuncs.ipv4NumToString(col("ip")))
      .withColumn("back", IpFuncs.ipv4StringToNum(col("s")))
    assert(rt.where(col("back") =!= col("ip")).count() == 0)
    // spot pin: textbook addresses format canonically
    val m = rt.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(0x7f000001L) == "127.0.0.1")
    assert(m(0xFFFFFFFFL) == "255.255.255.255")
  }

  test("ipv4StringToNum: malformed inputs are NULL, not wrapped garbage") {
    import spark.implicits._
    val bad = Seq(
      "300.1.1.1",    // out-of-range octet (r13 advice: wrapped before)
      "1.2.3.4.5",    // over-length quad (parsed first four before)
      "1.2.3",        // short
      "a.b.c.d",      // non-numeric
      "1.2.3.-4",     // negative octet
      "",             // empty
      "256.0.0.0",    // boundary violation
      "1..2.3").toDF("s")
    val out = bad.withColumn("n", IpFuncs.ipv4StringToNum(col("s")))
    assert(out.where(col("n").isNotNull).count() == 0)
    // and the in-range boundary still parses
    val ok = Seq("0.0.0.0", "255.255.255.255").toDF("s")
      .withColumn("n", IpFuncs.ipv4StringToNum(col("s")))
      .collect().map(_.getLong(1))
    assert(ok.toSeq == Seq(0L, 0xFFFFFFFFL))
  }

  test("ipv4CidrRange: /24 and edge prefixes") {
    import spark.implicits._
    val df = Seq(0xC0A80180L).toDF("ip") // 192.168.1.128
    val (lo24, hi24) = IpFuncs.ipv4CidrRange(col("ip"), 24)
    val r = df.select(lo24.as("lo"), hi24.as("hi")).collect()(0)
    assert(r.getLong(0) == 0xC0A80100L && r.getLong(1) == 0xC0A801FFL)
    val (lo32, hi32) = IpFuncs.ipv4CidrRange(col("ip"), 32)
    val r32 = df.select(lo32, hi32).collect()(0)
    assert(r32.getLong(0) == 0xC0A80180L && r32.getLong(1) == 0xC0A80180L)
    val (lo0, hi0) = IpFuncs.ipv4CidrRange(col("ip"), 0)
    val r0 = df.select(lo0, hi0).collect()(0)
    assert(r0.getLong(0) == 0L && r0.getLong(1) == 0xFFFFFFFFL)
  }
}
