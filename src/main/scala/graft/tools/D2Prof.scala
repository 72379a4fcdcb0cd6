package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, LshSizing}
import graft.queries.DedupQueries

/** Stage-level wall-clock profile of the graded d2 minhash pipeline
  * (diagnostic, like [[LshStats]] — not graded): times materialization,
  * collapse, signature+banding, candidate generation, and the full query
  * in isolation, so a cost shift is attributable to ONE stage instead of
  * argued from end-to-end numbers. Found the r15 result that the band
  * JOIN (wide string keys, double shuffle), not the signature math, was
  * d2's sf1 bottleneck — the measurement behind the int64 band keys and
  * the bucket-aggregated [[Dedup.candidatePairs]]. Pass sfDirs as args
  * (default /tmp/graft_sf1).
  */
object D2Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"D2PROF $label: ${(System.nanoTime-t0)/1e9}%.2f s"); r
    }
    val corpus = DedupQueries.corpus(spark, sfDir)
    val n = corpus.count()
    val (b, r) = LshSizing.bandShape(n, threshold = 0.5)
    println(s"D2PROF n=$n bands=$b rows=$r")
    val sets = t("shingleSets materialize")(Dedup.shingleSets(corpus).localCheckpoint())
    val groups = t("setGroups")(Dedup.setGroups(sets).localCheckpoint())
    val repSets = sets.join(groups.filter(col("doc_id") === col("rep_id")).select("doc_id"), Seq("doc_id"), "left_semi")
    t("signature+banding (count only)")(Dedup.lshBands(repSets, b, r).count())
    val cands = t("candidates (band join + distinct)")(
      Dedup.candidatePairs(Dedup.lshBands(repSets, b, r)).localCheckpoint())
    println(s"D2PROF cand_pairs=${cands.count()}")
    t("full d2")(DedupQueries.minhashNearDup(spark, sfDir).count())
    spark.stop()
  }
}
