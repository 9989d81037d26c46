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

  test("deleteWhere/updateWhere mutate only the listed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mut").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts_us", "user_id", "value")
      .withColumn("yyyymmdd",
        date_format(timestamp_micros(col("ts_us")), "yyyyMMdd").cast("int"))
    PartitionedLake.write(ev, dir, Seq("yyyymmdd"))
    val days = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("yyyymmdd="))
      .map(_.getName.stripPrefix("yyyymmdd=").toInt).sorted
    assert(days.length >= 2, s"need >= 2 days, got ${days.toSeq}")
    val (m0, m1) = (days.head, days.last)
    def snapshot(m: Int) = PartitionedLake.read(spark, dir)
      .filter(col("yyyymmdd") === m)

    val before0 = snapshot(m0).count()
    val victims = snapshot(m0).filter(col("event_id") % 5 === 0).count()
    val other1 = snapshot(m1).collect().map(_.toString()).sorted.toSeq
    assert(victims > 0)

    // DELETE WHERE event_id % 5 = 0, scoped to month m0
    PartitionedLake.deleteWhere(spark, dir, "yyyymmdd", Seq(m0),
      col("event_id") % 5 === 0)
    assert(snapshot(m0).count() == before0 - victims)
    assert(snapshot(m0).filter(col("event_id") % 5 === 0).count() == 0)
    // untouched partition is byte-for-byte the same rows
    assert(snapshot(m1).collect().map(_.toString()).sorted.toSeq == other1)

    // UPDATE value = 0 WHERE user_id % 2 = 0, scoped to month m0
    PartitionedLake.updateWhere(spark, dir, "yyyymmdd", Seq(m0),
      col("user_id") % 2 === 0, Map("value" -> lit(0.0)))
    assert(snapshot(m0)
      .filter(col("user_id") % 2 === 0 && col("value") =!= 0.0).count() == 0)
    assert(snapshot(m0)
      .filter(col("user_id") % 2 === 1 && col("value") === 0.0).count() == 0)
  }

  test("mutate predicates may reference the partition column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mutp").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts_us", "user_id")
      .withColumn("yyyymmdd",
        date_format(timestamp_micros(col("ts_us")), "yyyyMMdd").cast("int"))
    PartitionedLake.write(ev, dir, Seq("yyyymmdd"))
    val days = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("yyyymmdd="))
      .map(_.getName.stripPrefix("yyyymmdd=").toInt).sorted
    val d0 = days.head
    val before = PartitionedLake.read(spark, dir)
      .filter(col("yyyymmdd") === d0).count()
    assert(before > 0)
    // The partition column lives only in the directory name, but the
    // mutate callback must still see it (surfaced as a literal).
    PartitionedLake.deleteWhere(spark, dir, "yyyymmdd", Seq(d0),
      col("yyyymmdd") === d0 && col("event_id") % 2 === 0)
    val after = PartitionedLake.read(spark, dir)
      .filter(col("yyyymmdd") === d0)
    assert(after.filter(col("event_id") % 2 === 0).count() == 0)
    assert(after.count() < before)
    // and the written partition files must NOT embed the partition col
    val cols = spark.read
      .parquet(s"$dir/yyyymmdd=$d0").columns.toSet
    assert(!cols.contains("yyyymmdd"), s"partition col leaked into files: $cols")
  }

  test("optimizePartition dedups + compacts one partition, leaves others alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_opt").toString
    // two months; month 1 has every key duplicated at two versions
    val m1 = Seq((1L, 1L, "old", 202401), (1L, 2L, "new", 202401),
      (2L, 1L, "only", 202401))
    val m2 = Seq((3L, 1L, "other", 202402))
    val df = (m1 ++ m2).toDF("k", "ver", "payload", "yyyymm")
    // force several files in month 1 so compaction is observable
    PartitionedLake.write(df.repartition(4), dir, Seq("yyyymm"))

    val m2FilesBefore = new java.io.File(s"$dir/yyyymm=202402")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    PartitionedLake.optimizePartition(spark, dir, "yyyymm", 202401,
      keys = Seq("k"), version = Seq("ver"), numPartitions = Some(1))

    val back = PartitionedLake.read(spark, dir)
    val m1Rows = back.filter($"yyyymm" === 202401)
      .select("k", "ver", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(m1Rows == Set((1L, 2L, "new"), (2L, 1L, "only")))

    // untouched partition: same files, same rows
    val m2FilesAfter = new java.io.File(s"$dir/yyyymm=202402")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(m2FilesAfter == m2FilesBefore)
    assert(back.filter($"yyyymm" === 202402).count() == 1)

    // compacted: merged partition is a single file (tiny data)
    val m1Files = new java.io.File(s"$dir/yyyymm=202401")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(m1Files.length == 1, s"expected 1 compacted file, got ${m1Files.length}")
  }
}
