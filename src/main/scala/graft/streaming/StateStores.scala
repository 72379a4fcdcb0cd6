package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming suite.
  *
  * The default HDFS-backed provider keeps every keyed state partition
  * ON-HEAP — fine at test scale, the first thing that dies at a 100 TB
  * keyspace (st3's cross-batch fingerprint set grows with the corpus).
  * Spark ships a RocksDB provider that spills state to local SSD with
  * bounded block-cache memory, which is the production posture for large
  * streaming state; all graft stateful drains ([[StreamDedup]],
  * [[WindowedAgg]], [[StreamJoin]]) run under it by default, with
  * changelog checkpointing on so per-batch commits upload deltas instead
  * of full SST snapshots.
  */
object StateStores {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Run `body` (typically a drain-to-termination) with the RocksDB state
    * store provider + changelog checkpointing, restoring the previous
    * session confs after. The provider is pinned into the checkpoint's
    * offset metadata at first run, so resuming a query keeps whatever
    * provider it started with regardless of session conf.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = Seq(ProviderKey, ChangelogKey)
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(ProviderKey, RocksDbProvider)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
