package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST4 — watermarked tumbling-window aggregation: the canonical streaming
  * rollup (events/min by type, bytes/hour by host, …). Windows are
  * epoch-aligned buckets of `window` length; the watermark bounds both
  * state (closed windows are evicted) and lateness (rows older than
  * `delay` behind the stream's max event time are dropped
  * deterministically). In append mode a window row is emitted exactly
  * once — when the watermark passes the window end — which is what makes
  * a file sink possible: finalized rows only, no in-place updates.
  */
object WindowedAgg {

  /** Per-(tumbling-window, event_type) count + exact-decimal value sum.
    * Works for batch frames too (same code, backfill = stream replay);
    * `win_us` is the window start as epoch µs — the engine-portable basis
    * the other time queries use.
    */
  def tumblingCounts(events: DataFrame, window: String, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("win_us"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Drain the windowed aggregation of `stream` into `outDir` as parquet
    * (append mode — finalized windows only); blocks until the
    * AvailableNow drain completes. `statePartitions` as in
    * [[StreamDedup.distinctFingerprints]]: window-agg state is one row
    * per open (window, type) group, so the per-micro-batch state-store
    * commit cost wants few partitions, not cluster-width.
    */
  def drainTumbling(stream: DataFrame, window: String, delay: String,
                    outDir: String, checkpointDir: String,
                    statePartitions: Option[Int] = None): Unit = {
    val conf = stream.sparkSession.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => conf.set("spark.sql.shuffle.partitions", n))
    try StateStores.withRocksDb(stream.sparkSession) {
      val q = tumblingCounts(stream, window, delay)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally conf.set("spark.sql.shuffle.partitions", prev)
  }
}
