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
    import org.apache.spark.sql.functions.col
    val spark = index.sparkSession
    // Prepare the probe-independent pieces ONCE, outside foreachBatch —
    // the r10 shape re-derived all of them per micro-batch, which made
    // st8's cost per batch a fixed ~1.5 s of planning + broadcast jobs:
    // - the index slices pin hot as materialized blocks (the FAISS serve
    //   posture: the COMPRESSED index lives in serving RAM; blocks spill
    //   to executor disk past memory and free with the stream's lifetime)
    // - centroids/codebook collapse to driver-local relations (k·dim and
    //   m·k·subDim rows — bounded), so each batch's broadcasts build
    //   directly from memory instead of running a scan job first.
    // The float rerank corpus deliberately stays a lazy scan: pinning the
    // full-precision vectors would defeat PQ's memory story; the rerank
    // reads them per batch for the pooled candidates only.
    val res = index.filter(col("subspace") === 0).select("vec_id", "cell")
      .localCheckpoint()
    val codes = index.select("vec_id", "subspace", "code").localCheckpoint()
    def localize(df: DataFrame): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(df.collect().toSeq.asJava, df.schema)
    }
    val cents = localize(centroids)
    val cb = localize(codebook)
    val q = probeStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ops.Similarity.ivfPqTopKParts(res, codes, corpus, cents,
              cb, batch, k, pool, nprobe, m, subDim)
            .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
