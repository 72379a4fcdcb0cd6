package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, LshSizing}
import graft.queries.DedupQueries

/** Band-bucket occupancy diagnostic for the text-LSH passes (SCALING.md,
  * round-14 ask #7): prints, for d2's and d6's EXACT banding configuration
  * at a given corpus, the bucket-size histogram of the post-collapse
  * `(band, key)` equi-join — the quantity whose growth decides whether
  * the candidate join stays bounded as the corpus scales. Candidate
  * volume is Σ s·(s−1)/2 over buckets; a healthy curve keeps the mass in
  * s ∈ {1, 2} buckets with max-s growing slower than the corpus.
  *
  * Diagnostic only — not a graded query; it reuses the queries' own
  * builders (corpus augmentation, sizing, collapse) so the numbers are
  * the graded pipelines', not a reimplementation's.
  */
object LshStats {

  private def occupancy(spark: SparkSession, label: String, sets: DataFrame,
                        b: Int, r: Int): Unit = {
    val groups = Dedup.setGroups(sets)
    val repSets = sets.join(
      groups.filter(col("doc_id") === col("rep_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val sizes = Dedup.lshBands(repSets, b, r)
      .groupBy("band", "key").agg(count(lit(1)).as("s"))
    // one aggregation pass: the per-class max rides the histogram agg so
    // the expensive banding+groupBy job runs once, not twice
    val histRows = sizes.groupBy(
        when(col("s") === 1, lit("1"))
          .when(col("s") === 2, lit("2"))
          .when(col("s") <= 4, lit("3-4"))
          .when(col("s") <= 16, lit("5-16"))
          .when(col("s") <= 64, lit("17-64"))
          .otherwise(lit(">64")).as("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("s") * (col("s") - 1) / 2).cast("long").as("cand_pairs"),
        max(col("s")).as("mx"))
      .collect()
    val hist = histRows
      .map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2))))
      .toMap
    // empty corpus → empty histogram, not an NPE
    val maxS = if (histRows.isEmpty) 0L else histRows.map(_.getLong(3)).max
    val total = hist.values.map(_._2).sum
    val parts = Seq("1", "2", "3-4", "5-16", "17-64", ">64")
      .flatMap(k => hist.get(k).map(v => s""""$k":{"n":${v._1},"pairs":${v._2}}"""))
    println(s"""LSHSTATS {"config":"$label","bands":$b,"rows_per_band":$r,""" +
      s""""max_bucket":$maxS,"cand_pairs":$total,"hist":{${parts.mkString(",")}}}""")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { sfDir =>
      println(s"LSHSTATS == $sfDir ==")
      // d2: word-3-shingles over the augmented corpus, jBg = 0.25
      val corpus = DedupQueries.corpus(spark, sfDir).localCheckpoint()
      val n2 = corpus.count()
      val (b2, r2) = LshSizing.bandShape(n2, threshold = 0.5, jBg = 0.25)
      occupancy(spark, s"d2@$sfDir(n=$n2)", Dedup.shingleSets(corpus), b2, r2)
      // d6: char-5-grams over the 1-in-10 sample, jBg = 1/3, maxBands 16
      val sample = corpus.filter(col("doc_id") % 10 === 0)
      val n6 = sample.count()
      val (b6, r6) = LshSizing.bandShape(n6, threshold = 0.8,
        jBg = 1.0 / 3.0, maxBands = 16)
      val gramSets = sample.select(col("doc_id"),
        graft.functions.HashFunctions.char_gram_hashes(
          graft.functions.TextFunctions.canonText(col("text")), 5, 7)
          .as("shingles")).localCheckpoint()
      occupancy(spark, s"d6@$sfDir(n=$n6)", gramSets, b6, r6)
      // the hot-bucket lever, measured: same banding over df-pruned sets
      occupancy(spark, s"d6-pruned0.1@$sfDir(n=$n6)",
        Dedup.pruneFrequentShingles(gramSets, dfFrac = 0.1), b6, r6)
      // wall effect on the full d6 pass (candidates + exact verify)
      for ((lbl, frac) <- Seq("plain" -> 1.0, "pruned0.1" -> 0.1)) {
        val t0 = System.nanoTime()
        val nPairs = Dedup.ngramJaccardNearDups(sample, threshold = 0.8,
          bandDfPrune = frac).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"LSHSTATS d6-wall $lbl@$sfDir: $dt%.2f s, $nPairs pairs")
      }
    }
    spark.stop()
  }
}
