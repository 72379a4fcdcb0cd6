package graft
object D4Check {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = (1L to 1000L).map(i => (i, Array(i.toFloat % 7, 2.0f))).toDF("vec_id","embedding")
    val df = graft.ops.Similarity.embeddingNearDups(corpus)
    df.collect()
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
