package graft

import java.sql.DriverManager

import graft.sources.JdbcCatalog
import graft.operators.MigrationJob

/** The JDBC migration loop against a SECOND live engine: a DuckDB file
  * database over `org.duckdb.DuckDBDriver` (Test-scoped, resolved from
  * the offline cache). Derby (JdbcMigrationSpec) proves one metadata
  * dialect; DuckDB's catalog/metadata surface is much closer to
  * SQLite's (file database, loose typing, lowercase identifiers), so
  * this exercises the exact discover → pk → range-partitioned extract →
  * write loop the reference runs on `jdbc:sqlite:` (main.py:138-182)
  * with a different DatabaseMetaData implementation and type mapping.
  */
class JdbcDuckDbMigrationSpec extends SparkFunSuite {

  private lazy val dbUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_duckdb").toString
    val url = s"jdbc:duckdb:$dir/mig.db"
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY, " +
          "o_custkey BIGINT, o_totalprice DOUBLE, o_comment VARCHAR)")
      st.executeUpdate(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_linenumber INTEGER, " +
          "l_quantity DOUBLE, PRIMARY KEY (l_orderkey, l_linenumber))")
      st.executeUpdate("CREATE TABLE notes (body VARCHAR)") // no pk
      val insO = c.prepareStatement("INSERT INTO orders VALUES (?, ?, ?, ?)")
      (1 to 500).foreach { i =>
        insO.setLong(1, i.toLong); insO.setLong(2, (i % 37).toLong)
        insO.setDouble(3, i * 1.5); insO.setString(4, s"order $i")
        insO.addBatch()
      }
      insO.executeBatch()
      val insL = c.prepareStatement("INSERT INTO lineitem VALUES (?, ?, ?)")
      (1 to 500).foreach { i =>
        (1 to (i % 3) + 1).foreach { ln =>
          insL.setLong(1, i.toLong); insL.setInt(2, ln)
          insL.setDouble(3, ln * 2.0); insL.addBatch()
        }
      }
      insL.executeBatch()
      c.createStatement().executeUpdate("INSERT INTO notes VALUES ('hello')")
      url
    } finally c.close()
  }

  test("duckdb: catalog discovery lists exactly the user tables") {
    assert(JdbcCatalog.listTables(dbUrl) == Seq("lineitem", "notes", "orders"))
  }

  test("duckdb: declared primary keys surface in key order, absent when none") {
    assert(JdbcCatalog.primaryKey(dbUrl, "orders") == Seq("o_orderkey"))
    assert(JdbcCatalog.primaryKey(dbUrl, "lineitem") ==
      Seq("l_orderkey", "l_linenumber"))
    assert(JdbcCatalog.primaryKey(dbUrl, "notes").isEmpty)
  }

  test("duckdb: partitioned read splits on the declared key and loses no rows") {
    val pc = JdbcCatalog.partitionKey(spark, dbUrl, "orders")
    assert(pc.contains("o_orderkey"))
    val df = JdbcCatalog.readTable(spark, dbUrl, "orders", pc, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 500L)
    assert(df.select("o_orderkey").distinct().count() == 500L)
  }

  test("duckdb: whole-catalog migration — counts, pk-driven DDL, tuple() fallback") {
    val out = java.nio.file.Files.createTempDirectory("graft_duck_mig").toString
    try {
      val reports = MigrationJob.migrateJdbc(spark, dbUrl, "db", out,
        chunkSize = 100L, numPartitions = 4)
      val byTable = reports.map(r => r.table -> r).toMap
      assert(byTable("orders").rows == 500L)
      assert(byTable("orders").ddl.contains("ORDER BY o_orderkey"))
      assert(byTable("lineitem").ddl.contains("ORDER BY (l_orderkey, l_linenumber)"))
      assert(byTable("notes").ddl.endsWith("ORDER BY tuple()"))
      val back = spark.read.parquet(s"$out/orders")
      assert(back.count() == 500L)
      assert(back.schema.fieldNames.map(_.toLowerCase).contains("o_totalprice"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("REAL SQLite file -> LIVE DuckDB load: both halves of the " +
      "reference pipeline on real engines (round 12)") {
    // source = actual .db bytes through graft.sources.SqliteFile (no
    // sqlite driver), target = a live engine over JDBC — the
    // reference's extract->load shape with nothing mocked. DuckDB
    // stands in for ClickHouse exactly as in the dry-run story: the
    // loaded table must re-aggregate to sqlite's own invariants.
    val df = graft.sources.SqliteFile.read(spark,
      "src/test/resources/sqlite/fixture.db", "big")
    val dir = java.nio.file.Files.createTempDirectory("graft_sq2duck").toString
    val url = s"jdbc:duckdb:$dir/target.db"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.duckdb.DuckDBDriver")
    // create-then-insert, the reference's own sequence
    // (main.py:56-73 create, 167-179 insert); DuckDB's JDBC existence
    // probe breaks Spark's overwrite path, so the DDL goes first
    locally {
      val c0 = DriverManager.getConnection(url)
      try c0.createStatement().executeUpdate(
        "CREATE TABLE big (id BIGINT, val BIGINT, score DOUBLE, body VARCHAR)")
      finally c0.close()
    }
    // single writer: one duckdb file, one connection
    df.coalesce(1).write.mode("append").jdbc(url, "big", props)
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT count(*), sum(val), sum(length(body)) FROM big")
      assert(rs.next())
      assert(rs.getLong(1) === 6000L)
      assert(rs.getLong(2) === -184095L)  // sqlite's own aggregate
      assert(rs.getLong(3) === 2078994L)  // incl. the 50 KB overflow row
    } finally c.close()
  }
}
