package graft

import org.apache.spark.sql.functions._
import graft.sinks.PartitionedLake

class PartitionedLakeSpec extends SparkFunSuite {

  test("month-partitioned write prunes directories on partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val ev = Tables.events(spark, sf).select("event_id", "ts_us", "user_id")
    PartitionedLake.writeEventsByMonth(ev, dir)

    // layout: one directory per month
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("yyyymm=")).map(_.getName).sorted
    assert(parts.nonEmpty, "no partition directories written")

    val back = PartitionedLake.read(spark, dir)
    val firstMonth = parts.head.stripPrefix("yyyymm=").toInt
    val q = back.filter(col("yyyymm") === firstMonth)

    // partition pruning must be directory-level: PartitionFilters in
    // the scan, and only the one month's rows read
    val scan = q.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(yyyymm"),
      s"no PartitionFilters in scan:\n$scan")
    val expected = ev
      .withColumn("yyyymm",
        date_format(timestamp_micros(col("ts_us")), "yyyyMM").cast("int"))
      .filter(col("yyyymm") === firstMonth).count()
    assert(q.count() == expected)

    // round trip preserves every row
    assert(back.count() == ev.count())
  }
}
