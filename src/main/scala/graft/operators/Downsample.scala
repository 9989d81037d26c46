package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `largestTriangleThreeBuckets(n)(x, y)` (round 12) — the
  * standard visualization downsampler (Steinarsson 2013): keep the
  * series' first and last points, split the rest into buckets, keep
  * per bucket the point forming the largest triangle with its
  * neighbors.
  *
  * DOCUMENTED DEVIATION (what makes it parallel): classic LTTB anchors
  * each triangle on the PREVIOUSLY SELECTED point — a sequential
  * recurrence no engine parallelizes (ClickHouse runs it on one
  * already-aggregated array). This variant anchors on the NEIGHBOR
  * BUCKETS' AVERAGE points (the same anchor classic LTTB already uses
  * for the NEXT bucket), making every bucket independent: one window +
  * one aggregate + one broadcast join, no sequential state. On smooth
  * series the two pick identical points; they diverge only when a
  * bucket's selected point sits far from its bucket mean.
  *
  * Portability: bucket index and all moments are exact integers;
  * triangle areas run in doubles — but every double is derived from
  * exact longs via single correctly-rounded casts and ONE fixed IEEE
  * tree, so area VALUES are bit-identical cross-engine and the
  * (area, t, v) argmax replays exactly (ties broken by the struct
  * rule, same as ChAnalytics.argMinMax).
  *
  * Shape at 100 TB: bucket stats are B rows per series (a broadcast);
  * candidates never shuffle — the argmax is one map-side-combinable
  * aggregate on (series, bucket). Envelope: span·nBuckets and per-
  * bucket Σ(t−tmin) must fit in longs — ~2^63/nBuckets of time span,
  * loud under ANSI.
  */
object Downsample {

  def lttb(df: DataFrame, series: Column, t: Column, v: Column,
           nBuckets: Int): DataFrame = {
    require(nBuckets >= 3, s"lttb needs >= 3 buckets, got $nBuckets")
    val wg = Window.partitionBy("grp")
    val base = df.select(series.as("grp"), t.as("__t"), v.as("__v"))
      .withColumn("__tmin", min(col("__t")).over(wg))
      .withColumn("__tmax", max(col("__t")).over(wg))
      .withColumn("__x", col("__t") - col("__tmin"))
      .withColumn("__k",
        expr(s"(__x * $nBuckets) div (__tmax - __tmin + 1)"))
      .withColumn("__kmx", max(col("__k")).over(wg))

    // per-bucket exact moments, with the nearest EXISTING neighbor
    // buckets' moments alongside (lag/lead skip empty buckets)
    val wk = Window.partitionBy("grp").orderBy("__k")
    val stats = base.groupBy(col("grp"), col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__v")).as("__sy"))
      .withColumn("__pn", lag(col("__n"), 1).over(wk))
      .withColumn("__psx", lag(col("__sx"), 1).over(wk))
      .withColumn("__psy", lag(col("__sy"), 1).over(wk))
      .withColumn("__nn", lead(col("__n"), 1).over(wk))
      .withColumn("__nsx", lead(col("__sx"), 1).over(wk))
      .withColumn("__nsy", lead(col("__sy"), 1).over(wk))
      .select("grp", "__k", "__pn", "__psx", "__psy", "__nn", "__nsx",
        "__nsy")

    // candidates joined to their bucket's neighbor anchors (stats is
    // B rows/series — always the broadcast side)
    val cand = base.join(broadcast(stats), Seq("grp", "__k"))
      .withColumn("__px", col("__psx").cast("double") / col("__pn").cast("double"))
      .withColumn("__py", col("__psy").cast("double") / col("__pn").cast("double"))
      .withColumn("__nx", col("__nsx").cast("double") / col("__nn").cast("double"))
      .withColumn("__ny", col("__nsy").cast("double") / col("__nn").cast("double"))
      .withColumn("__area",
        when(col("__k") > 0 && col("__k") < col("__kmx"),
          abs((col("__px") - col("__nx")) *
                (col("__v").cast("double") - col("__py")) -
              (col("__px") - col("__x").cast("double")) *
                (col("__ny") - col("__py")))))

    // one conditional-struct aggregate per bucket: first bucket keeps
    // its earliest point, last bucket its latest, interior the argmax
    cand.groupBy(col("grp"), col("__k"))
      .agg(max(col("__kmx")).as("__m"),
        min(when(col("__k") === 0, struct(col("__t"), col("__v"))))
          .as("__f"),
        max(when(col("__k") === col("__kmx"),
          struct(col("__t"), col("__v")))).as("__l"),
        max(when(col("__k") > 0 && col("__k") < col("__kmx"),
          struct(col("__area"), col("__t"), col("__v")))).as("__a"))
      .select(col("grp"), col("__k").as("bucket"),
        when(col("__k") === 0, col("__f.__t"))
          .when(col("__k") === col("__m"), col("__l.__t"))
          .otherwise(col("__a.__t")).as("t"),
        when(col("__k") === 0, col("__f.__v"))
          .when(col("__k") === col("__m"), col("__l.__v"))
          .otherwise(col("__a.__v")).as("v"))
  }
}
