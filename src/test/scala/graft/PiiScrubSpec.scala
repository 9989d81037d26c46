package graft

import org.apache.spark.sql.functions._
import graft.operators.PiiScrub

class PiiScrubSpec extends SparkFunSuite {

  import spark.implicits._

  private def run(s: String): (Long, Long, Long, String) = {
    val (e, i, p, t) = PiiScrub.scrub(col("text"))
    val r = Seq(s).toDF("text")
      .select(e.as("e"), i.as("i"), p.as("p"), t.as("t")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("redacts emails, IPs and long digit runs with disjoint counts") {
    val (e, i, p, t) = run(
      "mail a.b+c@x-y.example.org or root@host.io, " +
        "server 10.0.255.1, call 0123456789 now")
    assert((e, i, p) == (2L, 1L, 1L))
    assert(t == "mail <EMAIL> or <EMAIL>, server <IP>, call <PHONE> now")
  }

  test("digits inside an email local part never double-count as phones") {
    val (e, i, p, t) = run("reach 123456789012@corp.example.com today")
    assert((e, i, p) == (1L, 0L, 0L))
    assert(t == "reach <EMAIL> today")
  }

  test("short digit runs and bare version-ish dots survive") {
    val (e, i, p, t) = run("v1.2 build 345 at 12345678 units")
    assert((e, i, p) == (0L, 0L, 0L))
    assert(t == "v1.2 build 345 at 12345678 units")
  }

  test("planted-PII gate is non-trivial on the test corpus") {
    val out = SparkEntry.queries("text_pii_scrub")(spark, sf)
    val agg = out.agg(sum("n_emails"), sum("n_ips"), sum("n_phones")).head()
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0 && agg.getLong(2) > 0,
      s"plant produced no PII: $agg")
    // nothing the scrubber recognizes survives in the output text
    val leftover = out.where(
      col("scrubbed").rlike(PiiScrub.EmailRe) ||
        col("scrubbed").rlike(PiiScrub.Ipv4Re) ||
        col("scrubbed").rlike(PiiScrub.PhoneRe)).count()
    assert(leftover == 0, s"$leftover docs still carry recognizable PII")
  }
}
