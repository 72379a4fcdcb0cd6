package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NameFunctions.basename
import graft.model.Schemas

/** A1 — online counters (`/root/reference/metrics/metrics.go:19-77`):
  * the reference exposes Prometheus `CounterVec`s incremented inline with
  * the write loop; the Spark-native analogue is `Dataset.observe`, which
  * accumulates named aggregates during a single pass of the SAME job that
  * does the work — no second scan, readable from the `QueryExecution`'s
  * observed metrics (or a `QueryExecutionListener` in production).
  */
object Metrics {

  /** Instrument a routed entry DataFrame with the reference's counter set:
    * total entries, public/private file counts (web100 only, as
    * `embargo_file_total` counts, `/root/reference/embargo.go:177,190`), and
    * bytes per route.
    */
  def observeRouted(routed: DataFrame, name: String = "embargo_metrics"): DataFrame = {
    val isWeb100 = basename(col("name")).contains("web100")
    routed.observe(name,
      count(lit(1)).as("entries_total"),
      count(when(isWeb100 && col("route") === Schemas.RoutePublic, 1)).as("files_public"),
      count(when(isWeb100 && col("route") === Schemas.RoutePrivate, 1)).as("files_private"),
      sum(when(col("route") === Schemas.RoutePublic, col("size")).otherwise(0L)).as("bytes_public"),
      sum(when(col("route") === Schemas.RoutePrivate, col("size")).otherwise(0L)).as("bytes_private"))
  }
}
