package graft

import graft.sinks.ClickHouseSink

class ClickHouseSinkSpec extends SparkFunSuite {

  test("load plan carries the reference's create/insert/optimize sequence") {
    val li = Tables.lineitem(spark, sf)
    val p = ClickHouseSink.plan(li, "ch-host", 8123, "db", "lineitem",
      primaryKey = Some("l_orderkey"), chunkSize = 5000L)
    assert(p.url == "jdbc:clickhouse://ch-host:8123/db")
    assert(p.ddl.startsWith("CREATE TABLE IF NOT EXISTS db.lineitem ("))
    assert(p.ddl.contains("ENGINE = ReplacingMergeTree ORDER BY l_orderkey"))
    assert(p.ddl.contains("l_shipdate DateTime"))
    assert(p.insert.startsWith("INSERT INTO db.lineitem (l_orderkey,"))
    assert(p.optimize == "OPTIMIZE TABLE db.lineitem")
    assert(p.batchSize == 5000L)
  }
}
