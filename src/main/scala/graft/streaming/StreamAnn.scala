package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** ST8 — streaming ANN serving: arriving query vectors are searched per
  * micro-batch against a STAGED IVF-PQ index
  * ([[graft.ops.Similarity.ivfPqTopKProbes]]) — the online-retrieval
  * counterpart of st6's train-offline/serve-online LM gate, which is how
  * a vector index actually deploys: quantizers and codes build offline,
  * queries arrive as a stream and each micro-batch runs the SAME
  * compressed-domain search the batch path runs.
  *
  * Scale shape: `foreachBatch` hands each micro-batch of probes to the
  * batch searcher, so the serve path inherits the index's posture —
  * probe-side tables broadcast, corpus joins keyed on cell and
  * (subspace, code) — and per-batch cost tracks the BATCH, not the
  * corpus. No stream state: each query is answered once, independently.
  */
object StreamAnn {

  /** Drain `probeStream` (`vec_id`, `embedding`) through the IVF-PQ
    * searcher into `outDir` as parquet `(probe_id, neighbor_id, rank)`;
    * blocks until the AvailableNow drain finishes. `index` is
    * [[graft.ops.Similarity.ivfPqBuildIndex]]'s staged output — built
    * ONCE offline; each micro-batch pays only probe-side work.
    */
  def serveTopK(probeStream: DataFrame, index: DataFrame, corpus: DataFrame,
                centroids: DataFrame, codebook: DataFrame,
                outDir: String, checkpointDir: String,
                k: Int, pool: Int, nprobe: Int, m: Int, subDim: Int): Unit = {
    val q = probeStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ops.Similarity.ivfPqTopKIndexed(index, corpus, centroids,
              codebook, batch, k, pool, nprobe, m, subDim)
            .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
