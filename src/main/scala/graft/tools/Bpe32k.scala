package graft.tools
import org.apache.spark.sql.functions._

/** 32k-merge BPE train measurement (diagnostic, not graded): replaces
  * SCALING.md's extrapolated 10-15 s figure with a measured wall time.
  * Derives the t16d hex-word corpus widened to `maxWords` = 3,200 top
  * words (the pair mass SCALING.md sized for a 32k vocabulary) and runs
  * the incremental sites-indexed trainer at a literal 32,768 rounds.
  */
object Bpe32k {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val h1 = md5(col("doc_id").cast("string").cast("binary"))
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(h1,
        when(col("doc_id") % 5 === 0,
          concat(lit(" "), md5(h1.cast("binary")))).otherwise(lit(""))).as("text"))
    val t0 = System.nanoTime()
    val wf = graft.ops.Bpe.wordFrequencies(docs, "text")
    val merges = graft.ops.Bpe.learnedMergesCounted(wf, 32768, maxWords = 3200)
    val t1 = System.nanoTime()
    println(f"BPE32K total=${(t1 - t0) / 1e9}%.2f s learned=${merges.length} " +
      f"last_rank=${if (merges.nonEmpty) merges.last._1 else -1L} " +
      f"last_occ=${if (merges.nonEmpty) merges.last._3 else -1L}")
    spark.stop()
  }
}
