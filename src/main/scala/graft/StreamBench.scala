package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import java.sql.Timestamp

/** Dev measurement (round 12, verdict task #3 carried from round 10):
  * sustained-input throughput and STATE-STORE SIZE for the three
  * stateful ingest streams — NearDedupStream, SpanDedupStream,
  * CmsStream — across ≥20 micro-batches of the sf0.1 corpus, with
  * event time advancing one `step` per batch so the watermark evicts
  * continuously (the steady-state ingest shape, not a one-shot test
  * batch).
  *
  * What "designed bound" means per stream (each printed next to the
  * measured max so the claim is checkable in the artifact):
  *  - near_dedup: 33 dedup keys per doc (32 band buckets + presence)
  *    × docs inside the horizon, plus one window-agg counter row per
  *    in-flight doc. Keys are 8-byte hashes — document TEXT never
  *    enters state.
  *  - span_dedup: one 8-byte key per DISTINCT W-token window hash in
  *    the horizon (+1 presence/doc) — a window repeated by every doc
  *    is still ONE entry; bound computed from the fed corpus itself.
  *  - cms: Depth·Width rows FOREVER, no watermark needed — the
  *    whole point of sketch state on unbounded streams.
  *
  * Throughput is wall-clock over the whole feed loop (driver-paced
  * MemoryStream batches, min of nothing — streaming progress is
  * cumulative, a one-shot run is the honest number; per-batch p50/max
  * expose jitter). Run:
  *   `sbt "runMain graft.StreamBench [sfDir] [batches]"`
  * → one JSON line per stream.
  */
object StreamBench {

  private case class BatchStat(ms: Double, stateRows: Long, stateBytes: Long)

  /** Drive `mkQuery` over `batches` slices of `rows`, timestamps
    * advancing `stepMin` minutes per batch; harvest per-batch wall and
    * the state operators' total rows/bytes from the progress API.
    */
  private def drive[A](spark: SparkSession,
                       stream: MemoryStream[A],
                       sq: StreamingQuery,
                       slices: IndexedSeq[Seq[A]]): Seq[BatchStat] = {
    val stats = slices.map { s =>
      val t0 = System.nanoTime()
      stream.addData(s)
      sq.processAllAvailable()
      val ms = (System.nanoTime() - t0) / 1e6
      val ops = Option(sq.lastProgress).toSeq.flatMap(_.stateOperators)
      BatchStat(ms, ops.map(_.numRowsTotal).sum,
        ops.map(_.memoryUsedBytes).sum)
    }
    sq.stop()
    stats
  }

  private def emit(name: String, inRows: Long, stateRowRows: Long,
                   bound: Long, boundDesc: String,
                   stats: Seq[BatchStat]): Unit = {
    val wallSec = stats.map(_.ms).sum / 1e3
    val sorted = stats.map(_.ms).sorted
    val p50 = sorted(sorted.size / 2)
    println(f"""{"study":"streambench_r12","op":"$name","batches":${stats.size},"docs_in":$inRows,"state_input_rows":$stateRowRows,"wall_sec":$wallSec%.1f,"docs_per_sec":${inRows / wallSec}%.0f,"state_rows_per_sec":${stateRowRows / wallSec}%.0f,"batch_ms_p50":$p50%.0f,"batch_ms_max":${sorted.last}%.0f,"state_rows_max":${stats.map(_.stateRows).max},"state_rows_final":${stats.last.stateRows},"state_mb_max":${stats.map(_.stateBytes).max / 1e6}%.1f,"designed_bound_rows":$bound,"bound":"$boundDesc"}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // batch i carries ts = t0 + i·step; horizon 2h / step 30min → the
    // watermark holds ~5 batches of state and evicts the rest, so the
    // measured max IS the steady-state plateau, not a growing total
    val t0us = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val stepMs = 30L * 60 * 1000
    def ts(i: Int) = new Timestamp(t0us + i.toLong * stepMs)
    val delayBatches = (2 * 60 * 60 * 1000) / stepMs // watermark delay / step
    val horizonBatches = delayBatches + 1 // in-horizon + boundary

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val docSlices = (0 until nBatches).map { i =>
      docs.slice(i * docs.length / nBatches,
        (i + 1) * docs.length / nBatches)
        .map { case (id, tx) => (id, ts(i), tx) }.toSeq
    }
    val perBatchDocs = docs.length / nBatches

    // --- near_dedup ------------------------------------------------
    locally {
      val st = MemoryStream[(Long, Timestamp, String)]
      val sq = graft.streaming.NearDedupStream
        .flagNearDuplicates(st.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.format("noop").outputMode("append").start()
      val stats = drive(spark, st, sq, docSlices)
      // a dedup key lives its own expiry delay (eventTime + delay)
      // AND the watermark lags max event time by the same delay, so
      // worst-case key lifetime ≈ 2·delay + one batch of boundary
      // lag; recurring keys (shared windows/bands) refresh their
      // expiry, so this 2D+1 window is the honest bound, not D
      val stateBatches = 2 * delayBatches + 1
      emit("near_dedup", docs.length, docs.length * 33L,
        (33L + 1L) * perBatchDocs * stateBatches,
        s"33 keys/doc x $perBatchDocs docs/batch x $stateBatches batches (2x expiry delay + lag) + unflushed-window counters",
        stats)
    }

    // --- span_dedup ------------------------------------------------
    locally {
      import org.apache.spark.sql.functions._
      // designed bound from the corpus itself: max over batch windows
      // of DISTINCT window-hashes in the horizon (+ presence rows)
      val fed = docSlices.zipWithIndex.flatMap { case (s, i) =>
        s.map(d => (i, d._1, d._3))
      }.toDF("batch", "doc_id", "text")
      val hashes = fed.select(col("batch"),
        explode(transform(graft.operators.Contamination
          .wordShingles(col("text"), 8), s => xxhash64(s))).as("wh"))
        .localCheckpoint(true)
      val spanRows = hashes.count()
      // 2x expiry-delay window of distinct window-hashes (see the
      // near_dedup note on the 2D+1 lifetime)
      val stateBatches = (2 * delayBatches + 1).toInt
      val distinctInHorizon = (0 until nBatches).map { i =>
        hashes.where(col("batch") > i - stateBatches && col("batch") <= i)
          .agg(countDistinct(col("wh"))).head().getLong(0)
      }.max
      val st = MemoryStream[(Long, Timestamp, String)]
      val sq = graft.streaming.SpanDedupStream
        .flagDupSpans(st.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.format("noop").outputMode("append").start()
      val stats = drive(spark, st, sq, docSlices)
      emit("span_dedup", docs.length, spanRows + docs.length,
        distinctInHorizon + 2L * perBatchDocs * stateBatches,
        s"$distinctInHorizon distinct window-hashes in a $stateBatches-batch window + presence + unflushed-window counters",
        stats)
    }

    // --- cms -------------------------------------------------------
    locally {
      import org.apache.spark.sql.functions._
      val events = Tables.events(spark, sfDir)
        .select(col("event_type"), col("user_id")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val evSlices = (0 until nBatches).map { i =>
        events.slice(i * events.length / nBatches,
          (i + 1) * events.length / nBatches)
          .map { case (et, uid) => (s"$et:${uid % 1000}") }.toSeq
      }
      val st = MemoryStream[String]
      val sq = graft.streaming.CmsStream
        .sketchStream(st.toDF().toDF("key"), "key")
        .writeStream.format("noop").outputMode("update").start()
      val stats = drive(spark, st, sq, evSlices)
      emit("cms", events.length,
        events.length.toLong * graft.operators.CmSketch.Depth,
        graft.operators.CmSketch.Depth.toLong * graft.operators.CmSketch.Width,
        "Depth x Width rows, unconditional (no watermark needed)",
        stats)
    }
    spark.stop()
  }
}
