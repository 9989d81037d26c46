package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two encodings across data drops:
  * TIMESTAMP(NANOS) (read as a raw Long via `spark.sql.legacy.parquet.
  * nanosAsLong`) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both
  * normalize to the same internal surface — `ts_us` (epoch µs, = DuckDB
  * `epoch_us(ts)` under the UTC session timezone every entry point
  * sets) and `ts_ns` (int64 nanos) — so every downstream query and
  * oracle compares on exact integers, never on raw sub-second
  * timestamps.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Round 17 (optimization, guide §2.5 "input skew — one huge
    * unsplittable file"): a parquet ROW GROUP is the unit of scan
    * parallelism, and the driver-generated test tables are each ONE
    * row group — so every scan stage runs on a single task no matter
    * how small `maxPartitionBytes` is set, serializing all scan-side
    * expression work (regex counts, shingle kernels, decimal casts) on
    * one core of 32. Job-level receipt: q1's main job ran at
    * parallelism ~1.7 (wall 0.97 s vs 1.67 s summed task time).
    *
    * [[spread]] is the guide's remedy — "repartition immediately after
    * the read" — applied SELECTIVELY at the operators whose downstream
    * per-row work dominates the exchange cost (signature kernels,
    * regex counting, profiling aggregates); a blanket spread in
    * [[apply]] measurably regressed light scan→agg queries
    * (dedup_exact 0.67 → 0.82 s), so each call site is an explicit,
    * measured decision. Scale-adaptive by construction: the decision
    * derives from the source files' own footers (row-group count +
    * byte size, bounded driver-side metadata reads cached per path),
    * so a production table — many files, many row groups — passes
    * through untouched and no exchange is added. The partition count
    * derives from bytes/64 KB clamped to [2, defaultParallelism],
    * never a hard-coded cluster constant. Filters and column pruning
    * still reach the scan (Catalyst pushes both through Repartition;
    * plan receipts in plans/r17). Round-robin placement is
    * deterministic under retries (sortBeforeRepartition, on by
    * default since SPARK-23207) and every gate is hash-checked over
    * the spread path at sf0.01/sf0.1.
    */
  val SpreadPartitionsKey = "graft.input.spreadPartitions"
  val SpreadMinBytesKey = "graft.input.spreadMinBytes"
  val SpreadMaxBytesKey = "graft.input.spreadMaxBytes"
  private val DefaultSpreadMinBytes = 16L << 10
  private val DefaultSpreadMaxBytes = 256L << 20
  private val SpreadTargetBytesPerPartition = 64L << 10

  /** (row groups, bytes) summed over files — footer metadata, cached. */
  private val layoutCache =
    scala.collection.concurrent.TrieMap.empty[String, (Int, Long)]

  /** Repartition `df` for parallel downstream expression work iff its
    * source files are under-split (fewer row groups than the session's
    * parallelism) and small enough that the exchange is trivially
    * cheap. Identity otherwise — including on every realistically
    * sized production table.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val files = df.inputFiles
    if (files.isEmpty) return df
    val cores = spark.sparkContext.defaultParallelism
    val cap = spark.conf.getOption(SpreadPartitionsKey).map(_.toInt)
      .orElse(sys.env.get("GRAFT_SPREAD_PARTITIONS").map(_.toInt))
      .getOrElse(cores)
    if (cap <= 1) return df
    val minB = spark.conf.getOption(SpreadMinBytesKey).map(_.toLong)
      .getOrElse(DefaultSpreadMinBytes)
    val maxB = spark.conf.getOption(SpreadMaxBytesKey).map(_.toLong)
      .getOrElse(DefaultSpreadMaxBytes)
    // bounded cache key (hash of the file list, not the multi-MB list
    // itself) INCLUDING the decision confs, so a partial early-exited
    // scan is only ever reused under the confs it was valid for
    // (ADVICE r17)
    val key = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      files.sorted.foreach(f => md.update(f.getBytes("UTF-8")))
      java.util.Base64.getEncoder.encodeToString(md.digest()) + s":$cap:$maxB"
    }
    val (rowGroups, bytes) = layoutCache.getOrElseUpdate(key, {
      val conf = spark.sessionState.newHadoopConf()
      // early exit (ADVICE r17): once rg >= cap or b > maxB the
      // decision is identity whatever the remaining files hold, so a
      // many-file production table costs O(few) footer reads, not
      // O(#files)
      var rg = 0; var b = 0L
      val it = files.iterator
      while (it.hasNext && rg < cap && b <= maxB) {
        val p = new org.apache.hadoop.fs.Path(it.next())
        b += p.getFileSystem(conf).getFileStatus(p).getLen
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try rg += reader.getRowGroups.size finally reader.close()
      }
      (rg, b)
    })
    val n = math.min(cap.toLong,
      math.max(2L, bytes / SpreadTargetBytesPerPartition)).toInt
    if (rowGroups < n && bytes >= minB && bytes <= maxB) df.repartition(n)
    else df
  }

  /** Conf key for [[barrier]]: `checkpoint` (default) | `persist` |
    * `off`.
    */
  val BarrierModeKey = "graft.pipeline.barrier"

  /** Plan barrier for a computed heavy projection that a pushed-down
    * filter would otherwise re-evaluate below the exchange (the r17
    * pipeline_clean pathology — guide §4's double-evaluation over a
    * computed column). Three modes (VERDICT r17 #8), all
    * ROW-IDENTICAL (spec-pinned in BarrierModeSpec):
    *
    *  - `checkpoint` (default): `localCheckpoint(eager)` — cheapest
    *    barrier, but it TRUNCATES LINEAGE (a lost executor past the
    *    barrier fails the query instead of recomputing) and pins the
    *    projection in executor block storage. Sizing: callers pass
    *    ID-plus-scalars projections (~16-40 B/row), so even 10¹⁰ docs
    *    checkpoint ~400 GB cluster-wide — real but bounded; at that
    *    scale prefer `persist`.
    *  - `persist`: StorageLevel.MEMORY_AND_DISK persist — keeps
    *    lineage (fault-tolerant) and spills instead of pinning, at
    *    the cost of possible recomputation under memory pressure.
    *  - `off`: no barrier — correct, but the pushed-down filter may
    *    re-evaluate the heavy expression tree below the exchange.
    */
  def barrier(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(BarrierModeKey).getOrElse("checkpoint") match {
      case "checkpoint" => df.localCheckpoint(eager = true)
      case "persist" =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case "off" => df
      case other => throw new IllegalArgumentException(
        s"$BarrierModeKey must be checkpoint|persist|off, got '$other'")
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** events with `ts_ns` (int64 nanos) and `ts_us` (epoch µs, = DuckDB's
    * `epoch_us(ts)`) replacing the raw `ts` column, whichever parquet
    * encoding the data drop used.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) drop
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000")) // integer div: double would lose ns bits
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS) drop: NTZ→LTZ cast is exact under the UTC session tz
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .drop("ts")
      case other =>
        // fail loudly: a future drop with a different encoding (string,
        // INT96, nanos without the nanosAsLong conf) would otherwise be
        // silently mis-normalized into wrong µs values everywhere
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected INT64 nanos " +
            "or TIMESTAMP/TIMESTAMP_NTZ micros — extend Tables.events deliberately")
    }
    normalized.select("event_id", "ts_ns", "user_id", "event_type",
      "value", "props", "ts_us")
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
