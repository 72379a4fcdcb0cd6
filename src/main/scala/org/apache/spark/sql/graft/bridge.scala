package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for Spark 4 (where the converters are
  * `private[sql]`). Lives in the `org.apache.spark.sql` namespace solely to
  * access those converters — the standard pattern for Catalyst extension
  * libraries; everything else in this project stays under `graft`.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session-scoped Hadoop configuration (core conf + `spark.hadoop.*`
    * session overrides) — what executor-side FileSystem access must use so
    * object-store credentials/fs impls set per-session are honored.
    * `sessionState` is `private[sql]`, hence exposed here.
    */
  def sessionHadoopConf(spark: org.apache.spark.sql.SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.newHadoopConf()

  /** `AbstractDataType` is `private[sql]` in Spark 4; re-exported so graft
    * expressions can declare `inputTypes` (for `ImplicitCastInputTypes`).
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
