package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs — one JVM-wide session (getOrCreate),
  * UTC, small shuffle partition count for local runs.
  */
trait SparkSuite {
  lazy val spark: SparkSession = SparkSuite.session
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
