package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level cost decomposition for batch queries (guide §1): runs the
  * named declared queries with a SparkListener and prints every Spark
  * job's wall time + first-stage name, so a multi-job query (iterative
  * graph rounds, staged index builds, driver-looped lifecycles) shows
  * where its seconds actually go — the batch counterpart of
  * [[StreamProf]].
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProf g1_pagerank[,n7_ann_ivfpq_update]"
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("g1_pagerank"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B knob: SPARK_EXTRA_CONF="k=v;k=v" session-conf overrides
    sys.env.get("SPARK_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        println(s"[conf] $k=$v"); spark.conf.set(k.trim, v.trim)
      })
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc.take(90)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20) println(f"  [job ${je.jobId}%3d] ${ms}%8.0f ms  $desc")
        }
      }
    })
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => () }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (pass <- 1 to 2) {
        println(s"=== $name pass $pass ===")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"=== $name pass $pass: $dt%.3f s, $n rows ===")
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
