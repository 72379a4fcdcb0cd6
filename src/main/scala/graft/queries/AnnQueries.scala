package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Similarity-search queries over `embeddings` (64-dim float vectors).
  * Results carry integer ids/ranks only — cosine values stay inside the
  * pipeline, so tiny cross-engine fp differences cannot flip a hash match
  * (rank gaps in the synthetic data are ≥ 3e-4, orders of magnitude above
  * double rounding).
  */
object AnnQueries {

  /** D4 corpus: embeddings ∪ scaled copies (×2 — exact in both float and
    * double — of every 10th vector, id+1000000). Cosine(v, 2v) = 1, so the
    * copies are the near-dup positives; no natural pair exceeds cos 0.7.
    */
  def embCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    base.unionAll(copies)
  }

  private val embCorpusSql =
    """ecorpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |         CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS e
      |  FROM embeddings WHERE vec_id % 10 = 0)""".stripMargin

  /** D4 — embedding near-dup: sign-LSH bucket join + exact cosine ≥ 0.9;
    * oracle is the exhaustive pair scan.
    */
  def embedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.embeddingNearDups(embCorpus(spark, sfDir), threshold = 0.9)

  val embedNearDupSql: String =
    s"""WITH $embCorpusSql
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |FROM ecorpus a JOIN ecorpus b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.e, b.e) >= 0.9""".stripMargin

  /** N1 — exact brute-force cosine top-5 for every 50th vector as probe. */
  def annTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0), k = 5)
  }

  val annTopKSql: String =
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |p AS (SELECT vec_id AS p_id, e AS pe FROM c WHERE vec_id % 50 = 0),
      |scored AS (
      |  SELECT p_id, vec_id, list_cosine_similarity(pe, e) AS cos
      |  FROM p JOIN c ON vec_id != p_id)
      |SELECT p_id AS probe_id, vec_id AS neighbor_id, CAST(rnk AS BIGINT) AS rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id ASC) AS rnk
      |      FROM scored)
      |WHERE rnk <= 5""".stripMargin

  /** N2 — IVF ANN: vectors with id < 8 serve as the coarse centroids,
    * probes (every 50th id) search only their own cell, top-3 within cell.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
      probeFilter = col("vec_id") % 50 === 0, k = 3)
  }

  val annIvfSql: String =
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cent AS (SELECT vec_id AS c_id, e AS ce FROM c WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, c_id AS cell FROM (
      |    SELECT c.vec_id, cent.c_id,
      |           row_number() OVER (PARTITION BY c.vec_id
      |                              ORDER BY list_cosine_similarity(ce, e) DESC, c_id ASC) AS rn
      |    FROM c CROSS JOIN cent)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT c.vec_id AS p_id, c.e AS pe, assign.cell AS pcell
      |  FROM c JOIN assign ON c.vec_id = assign.vec_id
      |  WHERE c.vec_id % 50 = 0),
      |cand AS (
      |  SELECT p_id, c.vec_id, list_cosine_similarity(pe, c.e) AS cos
      |  FROM probes
      |  JOIN assign a2 ON a2.cell = pcell
      |  JOIN c ON c.vec_id = a2.vec_id AND c.vec_id != p_id)
      |SELECT p_id AS probe_id, vec_id AS neighbor_id, CAST(rnk AS BIGINT) AS rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id ASC) AS rnk
      |      FROM cand)
      |WHERE rnk <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d4_embed_neardup" -> embedNearDup,
    "n1_ann_topk" -> annTopK,
    "n2_ann_ivf" -> annIvf
  )

  def oracleSql: Map[String, String] = Map(
    "d4_embed_neardup" -> embedNearDupSql,
    "n1_ann_topk" -> annTopKSql,
    "n2_ann_ivf" -> annIvfSql
  )
}
