package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.{Dedup, LshSizing}
import graft.queries.DedupQueries

/** Variant-level profile of the d2 candidate stage (diagnostic, not
  * graded): times each candidate-generation shape on the same banded
  * input so the winner is measured, not argued.
  */
object CandProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // capture the session default BEFORE any arm mutates it, so resets
    // restore the configuration the graded queries actually run under
    // (hardcoding "128" would silently pin a stale Spark default)
    val fallbackDefault =
      spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CANDPROF $label: ${(System.nanoTime-t0)/1e9}%.2f s"); r
    }
    val corpus = DedupQueries.corpus(spark, sfDir)
    val n = corpus.count()
    val (b, r) = LshSizing.bandShape(n, threshold = 0.5)
    val sets = Dedup.shingleSets(corpus).localCheckpoint()
    val groups = Dedup.setGroups(sets).localCheckpoint()
    val repSets = sets.join(groups.filter(col("doc_id") === col("rep_id")).select("doc_id"), Seq("doc_id"), "left_semi")
    val bands = Dedup.lshBands(repSets, b, r).localCheckpoint()
    println(s"CANDPROF n=$n bands=$b rows=$r bandRows=${bands.count()}")
    def expand(buckets: DataFrame): DataFrame = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    // v1: one-shot collect_list agg (the r15 shape)
    def v1() = expand(bands.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1))
    // v2: count pre-filter + unhinted semi + collect_list on survivors
    def v2() = {
      val mk = bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).select("band", "key")
      expand(bands.join(mk, Seq("band", "key"), "left_semi")
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1))
    }
    // v3: count pre-filter + BROADCAST semi
    def v3() = {
      val mk = bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).select("band", "key")
      expand(bands.join(broadcast(mk), Seq("band", "key"), "left_semi")
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1))
    }
    // v4: one-shot agg with raised object-hash fallback threshold
    def v4() = {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
      val out = v1()
      out
    }
    for (round <- 1 to 2) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", fallbackDefault)
      println(s"CANDPROF -- round $round")
      t("v1 one-shot agg")(println("pairs=" + v1().count()))
      t("v2 semi unhinted")(println("pairs=" + v2().count()))
      t("v3 semi broadcast")(println("pairs=" + v3().count()))
      t("v4 raised fallback")(println("pairs=" + v4().count()))
    }
    // r17 verdict A/B: the pair-dedup exchange — two-long distinct (the
    // graded shape) vs int64-packed pair key vs no distinct at all (the
    // lower bound isolating what the dedup exchange can possibly cost)
    for (round <- 1 to 2) {
      // reset per round (review r17): v4 above leaves the raised
      // object-hash fallback in the session — without this the p-arms
      // would time a non-graded aggregate configuration
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", fallbackDefault)
      println(s"CANDPROF pair-dedup -- round $round")
      t("p0 graded chunk-pair (two-long distinct)")(
        println("pairs=" + Dedup.candidatePairs(bands).count()))
      t("p1 packed int64 distinct")(
        println("pairs=" + Dedup.candidatePairs(bands, packedPairs = true).count()))
      t("p2 no distinct (raw expansion)")(
        println("rows=" + Dedup.candidatePairsRaw(bands).count()))
    }
    spark.stop()
  }
}
