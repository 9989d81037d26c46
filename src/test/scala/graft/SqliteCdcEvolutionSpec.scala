package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.{SqliteCatalogCdc, SqliteFile}
import org.apache.spark.sql.functions._

/** Round-15 CDC widening: (1) the single-table typed stream survives
  * ALTER TABLE ADD COLUMN between micro-batches (sqlite's own
  * semantics — pre-existing rows read the new column as NULL; the
  * stream's pinned schema keeps projecting the original columns) and
  * refuses RENAME/DROP loudly (those shift record positions);
  * (2) the catalog envelope stream (`tables=*`) tails EVERY rowid
  * table at once, re-resolving schemas per batch, backfilling tables
  * created mid-stream, and surviving a checkpoint restart through the
  * JSON map offset. Fixtures: tools/make_cdc_evolution_fixture.py.
  */
class SqliteCdcEvolutionSpec extends SparkFunSuite {

  private val res = "src/test/resources/sqlite"

  /** Copy-then-ATOMIC-move: a running stream polls the file between
    * micro-batches, and a plain REPLACE_EXISTING copy truncates the
    * target first — the poll can observe the half-written file. The
    * atomic rename is what a real snapshot-drop deployment does too.
    */
  private def copy(src: String, dst: java.nio.file.Path): Unit = {
    val tmp = dst.resolveSibling(dst.getFileName.toString + ".tmp")
    Files.copy(Paths.get(src), tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  test("single-table stream survives ALTER TABLE ADD COLUMN " +
      "mid-stream; original columns stay correct") {
    val dir = Files.createTempDirectory("graft-cdc-alter")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_alter_v1.db", db)
    val q = spark.readStream.format("sqlite")
      .option("path", db.toString).option("table", "ev").load()
      .writeStream.format("memory").queryName("cdc_alter")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_alter").count() === 400L)

      copy(s"$res/cdc_alter_v2.db", db) // +ALTER ADD COLUMN, +300 rows
      q.processAllAvailable()
      val t = spark.table("cdc_alter")
      assert(t.count() === 700L)
      assert(t.columns.toSeq == Seq("id", "grp", "payload"),
        "pinned stream schema must not grow mid-stream")
      // original columns decode correctly across the ALTER boundary
      // (fixture pin: sum(grp) over all 700 rows = 5582)
      assert(t.agg(sum("grp")).head.getLong(0) === 5582L)
      assert(t.select(countDistinct("id")).head.getLong(0) === 700L)
    } finally q.stop()
  }

  test("single-table stream refuses RENAME COLUMN mid-stream loudly " +
      "(record positions shift)") {
    val dir = Files.createTempDirectory("graft-cdc-rename")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_alter_v1.db", db)
    val q = spark.readStream.format("sqlite")
      .option("path", db.toString).option("table", "ev").load()
      .writeStream.format("memory").queryName("cdc_rename")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_rename").count() === 400L)
      copy(s"$res/cdc_rename_v2.db", db)
      val e = intercept[Exception] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("schema drift"), s"unexpected failure: $msgs")
    } finally q.stop()
  }

  test("catalog stream (tables=*) tails every rowid table and " +
      "backfills a table created mid-stream") {
    val dir = Files.createTempDirectory("graft-cdc-multi")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_multi_v1.db", db)
    val q = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
      .writeStream.format("memory").queryName("cdc_multi")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val t1 = spark.table("cdc_multi")
      assert(t1.groupBy("tbl").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 300L, "b" -> 150L))

      // growth + a NEW table created mid-stream: the next batch's
      // `*` re-selection picks c up and backfills it from rowid 0
      copy(s"$res/cdc_multi_v2.db", db)
      q.processAllAvailable()
      val t = spark.table("cdc_multi")
      assert(t.groupBy("tbl").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 400L, "b" -> 200L, "c" -> 50L))
      // exactly-once per (tbl, rowid)
      assert(t.select(countDistinct(col("tbl"), col("rowid")))
        .head.getLong(0) === 650L)
      // the JSON payload is real: parse it back and settle against
      // the batch read (fixture pin: sum(x) over a = 240600)
      val sumX = t.where(col("tbl") === "a")
        .select(get_json_object(col("json"), "$.x").cast("long").as("x"))
        .agg(sum("x")).head.getLong(0)
      assert(sumX === 240600L)
      val aBatch = SqliteFile.read(spark, db.toString,
        SqliteFile.listTables(db.toString).find(_.name == "a").get)
      assert(sumX === aBatch.agg(sum("x")).head.getLong(0))
      // REALs round-trip through the shortest-repr JSON
      val sumV = t.where(col("tbl") === "b")
        .select(get_json_object(col("json"), "$.v").cast("double").as("v"))
        .agg(sum("v")).head.getDouble(0)
      val bBatch = SqliteFile.read(spark, db.toString,
        SqliteFile.listTables(db.toString).find(_.name == "b").get)
      assert(sumV === bBatch.agg(sum("v")).head.getDouble(0))
      // BLOBs ship as {"$hex": "..."}
      val hex = t.where(col("tbl") === "c" && col("rowid") === 1L)
        .select(get_json_object(col("json"), "$.blob_v.$hex"))
        .head.getString(0)
      assert(hex == "0107")
    } finally q.stop()
  }

  test("catalog stream survives a restart from its checkpoint " +
      "(the JSON map offset deserializes; no re-read, no dupes)") {
    val dir = Files.createTempDirectory("graft-cdc-restart")
    val db = dir.resolve("live.db")
    val out = dir.resolve("out").toString
    copy(s"$res/cdc_multi_v1.db", db)
    def start() = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
      .writeStream.format("parquet") // memory sink can't recover
      .option("path", out)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() === 450L)

    copy(s"$res/cdc_multi_v2.db", db) // growth while the stream is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val t = spark.read.parquet(out)
    assert(t.groupBy("tbl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 400L, "b" -> 200L, "c" -> 50L))
    assert(t.select(countDistinct(col("tbl"), col("rowid")))
      .head.getLong(0) === 650L, "restart must not re-read or dupe")
  }

  test("catalog stream refuses a table DROPPED mid-stream LOUDLY " +
      "during LIVE streaming (start offset is the witness — the end " +
      "offset is rebuilt from the live catalog and no longer names it)") {
    val dir = Files.createTempDirectory("graft-cdc-drop")
    val db = dir.resolve("live.db")
    copy(s"$res/cdc_multi_v1.db", db)
    val q = spark.readStream.format("sqlite")
      .option("path", db.toString).option("tables", "*").load()
      .writeStream.format("memory").queryName("cdc_drop")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_drop").count() === 450L)
      copy(s"$res/cdc_multi_v3_drop.db", db) // DROP TABLE b, a grows
      val e = intercept[Exception] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("vanished from the catalog"),
        s"unexpected failure: $msgs")
    } finally q.stop()
  }

  test("catalog selection: named WITHOUT ROWID table refuses; " +
      "* silently selects only rowid tables") {
    val fix = s"$res/fixture.db"
    val e = intercept[IllegalArgumentException] {
      SqliteCatalogCdc.select(fix, "wr")
    }
    assert(e.getMessage.contains("WITHOUT ROWID"))
    assert(SqliteCatalogCdc.select(fix, "*").forall(!_.withoutRowid))
  }
}
