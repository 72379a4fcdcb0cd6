package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the g1/g2 edge-partitioning lever (VERDICT r18 §8):
  * on the sf1 trade graph (~11.7M symmetric edges), sweep the
  * checkpointed edge table's partition width (`repartition(n, src)`) and
  * measure a salted-dst aggregate variant, against the production
  * default-width arm. Every arm re-derives the edge list from parquet
  * and runs the full `Graph.pageRank` (3 iters); each arm runs twice,
  * min reported; session confs are reset at the top of every arm (the
  * r17 CandProf leak lesson).
  *
  * Usage: `sbt "runMain graft.tools.GraphAb /tmp/graft_sf1 [cpus]"`.
  */
object GraphAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = if (args.length > 1) args(1) else "4"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(): DataFrame = {
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    }

    // salted-dst variant: the per-round dst aggregate goes two-level —
    // partial sums keyed by (dst, src % S), then the final tele+damp fold
    // keyed by dst. Integer sums re-associate exactly, so the result is
    // bit-identical to Graph.pageRank; what changes is the exchange: the
    // first level spreads a hot dst over S reducers.
    def saltedPageRank(ed: DataFrame, iters: Int, s: Int): DataFrame = {
      val tele = graft.ops.Graph.FixedPoint / 100L * 15L
      var ranks = ed.select("src").distinct()
        .select(col("src").as("node"), lit(graft.ops.Graph.FixedPoint).as("r"))
      for (i <- 1 to iters) {
        ranks = ed.join(ranks, ed("src") === ranks("node"))
          .select(col("dst"), pmod(col("src"), lit(s.toLong)).as("salt"),
            expr("r div d").as("c"))
          .groupBy(col("dst"), col("salt")).agg(sum(col("c")).as("ps"))
          .groupBy(col("dst"))
          .agg((lit(tele) + expr("(85 * sum(ps)) div 100")).as("r"))
          .select(col("dst").as("node"), col("r"))
        if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
      }
      ranks
    }

    // the r18 production loop shape with NO guard and NO checkpoints —
    // isolates the aggregate's shape from the r19 hardening overhead
    def rawPageRank(ed: DataFrame, iters: Int): DataFrame = {
      val tele = graft.ops.Graph.FixedPoint / 100L * 15L
      var ranks = ed.select("src").distinct()
        .select(col("src").as("node"), lit(graft.ops.Graph.FixedPoint).as("r"))
      for (_ <- 1 to iters) {
        ranks = ed.join(ranks, ed("src") === ranks("node"))
          .select(col("dst"), expr("r div d").as("c"))
          .groupBy(col("dst"))
          .agg((lit(tele) + expr("(85 * sum(c)) div 100")).as("r"))
          .select(col("dst").as("node"), col("r"))
      }
      ranks
    }

    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      System.gc()
    }

    def time(label: String)(body: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        reset()
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[graph-ab] $label%-14s min=${ts.map(_._1).min}%7.2fs " +
        f"samples=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }

    // checksum arm first: all variants must agree bit-exactly
    val baseSum = graft.ops.Graph.pageRank(edges(), 3)
      .agg(sum(col("r")), count(lit(1))).head()
    println(s"[graph-ab] checksum base: ${baseSum}")

    def buildEd(): DataFrame = {
      val deg = edges().groupBy("src").agg(count(lit(1)).as("d"))
      edges().join(deg, "src").repartition(col("src")).localCheckpoint()
    }
    // arm ORDER is environment-controlled so position/warmup bias can be
    // measured by running the tool twice with opposite orders
    val order = sys.env.getOrElse("GRAPH_AB_ORDER", "base,raw,salt4,salt16,base2,w8,w64")
    order.split(",").foreach {
      case "base" => time("base(defaultW)") { graft.ops.Graph.pageRank(edges(), 3).count() }
      case "base2" => time("base(again)") { graft.ops.Graph.pageRank(edges(), 3).count() }
      case "raw" => time("raw(no-guard)") { rawPageRank(buildEd(), 3).count() }
      case s if s.startsWith("salt") && s.stripPrefix("salt").forall(_.isDigit)
          && s.length > 4 =>
        val k = s.stripPrefix("salt").toInt
        time(s"salt=$k") { saltedPageRank(buildEd(), 3, k).count() }
      case w if w.startsWith("w") && w.stripPrefix("w").forall(_.isDigit)
          && w.length > 1 =>
        val k = w.stripPrefix("w").toInt
        time(s"width=$k") { graft.ops.Graph.pageRank(edges(), 3, parts = k).count() }
      case other => println(s"[graph-ab] unknown arm $other — skipped")
    }
    // bit-exactness of the salted arm vs base
    val deg = edges().groupBy("src").agg(count(lit(1)).as("d"))
    val ed = edges().join(deg, "src").repartition(col("src")).localCheckpoint()
    val saltSum = saltedPageRank(ed, 3, 4).agg(sum(col("r")), count(lit(1))).head()
    println(s"[graph-ab] checksum salt4: ${saltSum} (must equal base)")
    spark.stop()
  }
}
