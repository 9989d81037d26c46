package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.{SqliteCatalogCdc, SqliteFile}
import org.apache.spark.sql.Row

/** Round-16 catalog-CDC typed demux (the r15 verdict's #5 item): the
  * `(tbl, rowid, json)` envelope turns back into per-table TYPED rows
  * via `SqliteCatalogCdc.demux` — from_json against the resolved
  * TableDef schema, BLOB `$hex` decode included — so the catalog
  * stream composes with the typed sinks the single-table stream
  * already feeds. Every test settles the demuxed output to
  * `SqliteFile.read` batch parity, including a mid-stream ALTER
  * TABLE ADD COLUMN.
  */
class SqliteCatalogDemuxSpec extends SparkFunSuite {

  private val res = "src/test/resources/sqlite"

  private def copy(src: String, dst: java.nio.file.Path): Unit = {
    val tmp = dst.resolveSibling(dst.getFileName.toString + ".tmp")
    Files.copy(Paths.get(src), tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def batchRows(db: String, table: String): Set[Row] =
    SqliteFile.read(spark, db,
      SqliteFile.listTables(db).find(_.name == table).get)
      .collect().toSet

  private def normBin(rows: Set[Row]): Set[Seq[Any]] =
    rows.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case v => v
    })

  test("demuxed LIVE STREAM settles to SqliteFile.read parity; a " +
      "demuxed batch frame decodes BLOBs for a table created " +
      "mid-stream") {
    val dir = Files.createTempDirectory("graft-demux")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_multi_v1.db", db)
    val envelope = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
    // typed stream for table a, composed at stream build time
    val qa = SqliteCatalogCdc.demux(envelope, db.toString, "a")
      .writeStream.format("memory").queryName("demux_a")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt_a").toString)
      .start()
    // raw envelope accumulator (to demux other tables as a batch)
    val qe = envelope.writeStream.format("memory").queryName("demux_env")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt_e").toString)
      .start()
    try {
      qa.processAllAvailable(); qe.processAllAvailable()
      copy(s"$res/cdc_multi_v2.db", db) // growth + NEW table c (BLOBs)
      qa.processAllAvailable(); qe.processAllAvailable()

      // stream-demuxed a == the batch read, typed
      val gotA = spark.table("demux_a").collect().toSet
      assert(gotA == batchRows(db.toString, "a"))
      assert(spark.table("demux_a").schema.map(f => f.name -> f.dataType)
        == SqliteFile.schemaOf(SqliteFile.listTables(db.toString)
          .find(_.name == "a").get).map(f => f.name -> f.dataType))

      // batch-demuxed b (REAL round-trip) and c (BLOB $hex decode)
      val env = spark.table("demux_env")
      val gotB = SqliteCatalogCdc.demux(env, db.toString, "b")
        .collect().toSet
      assert(gotB == batchRows(db.toString, "b"))
      val gotC = SqliteCatalogCdc.demux(env, db.toString, "c")
        .collect().toSet
      assert(normBin(gotC) == normBin(batchRows(db.toString, "c")))
      assert(gotC.nonEmpty, "blob table demux must not be empty")
    } finally { qa.stop(); qe.stop() }
  }

  test("demux across a mid-stream ALTER TABLE ADD COLUMN: pre-ALTER " +
      "envelope rows read the new column as NULL, exactly the batch " +
      "read's answer") {
    val dir = Files.createTempDirectory("graft-demux-alter")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_alter_v1.db", db)
    val envelope = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
    val q = envelope.writeStream.format("memory").queryName("demux_alter")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      copy(s"$res/cdc_alter_v2.db", db) // ALTER ADD COLUMN note + rows
      q.processAllAvailable()
      // demux against the POST-ALTER schema: v1-era envelope rows
      // carry no 'note' key -> NULL; v2-era rows carry it
      val got = SqliteCatalogCdc.demux(
        spark.table("demux_alter"), db.toString, "ev").collect().toSet
      assert(got == batchRows(db.toString, "ev"))
      assert(got.count(_.getAs[String]("note") != null) == 300,
        "exactly the 300 post-ALTER rows carry the new column")
    } finally q.stop()
  }

  test("demuxAll fans a 3-table catalog out in ONE call: every live " +
      "rowid table demuxed to batch parity (round 17, verdict #8)") {
    val dir = Files.createTempDirectory("graft-demuxall")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_multi_v2.db", db) // a, b, and the BLOB table c
    // batch envelope: stream the catalog once into memory
    val envelope = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
    val q = envelope.writeStream.format("memory").queryName("demuxall_env")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val all = SqliteCatalogCdc.demuxAll(
        spark.table("demuxall_env"), db.toString)
      assert(all.keySet == Set("a", "b", "c"),
        s"demuxAll selected ${all.keySet}")
      all.foreach { case (name, df) =>
        assert(normBin(df.collect().toSet) ==
          normBin(batchRows(db.toString, name)), s"table $name diverges")
        assert(df.schema.map(f => f.name -> f.dataType) ==
          SqliteFile.schemaOf(SqliteFile.listTables(db.toString)
            .find(_.name == name).get).map(f => f.name -> f.dataType),
          s"table $name schema diverges")
      }
      // a named-list spec selects exactly the named subset
      val sub = SqliteCatalogCdc.demuxAll(
        spark.table("demuxall_env"), db.toString, "a,b")
      assert(sub.keySet == Set("a", "b"))
    } finally q.stop()
  }

  test("demux of an unknown table refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      SqliteCatalogCdc.demux(
        spark.range(1).selectExpr("'x' AS tbl", "id AS rowid",
          "'{}' AS json"),
        s"$res/cdc_multi_v1.db", "nope")
    }
    assert(e.getMessage.contains("not found"))
  }
}
