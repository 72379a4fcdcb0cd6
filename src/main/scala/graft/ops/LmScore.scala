package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The char-bigram language model shared by the batch perplexity gate
  * (t13, [[graft.queries.TextQueries.lmFilter]]) and its streaming serve
  * path (st6): train once over a batch corpus, score anywhere — the
  * model is a `Map[Long, Double]` small enough to broadcast (bounded by
  * |alphabet|², never the data), and scoring is a pure per-document fold
  * with no shuffle, so the SAME function scores a batch partition or a
  * micro-batch.
  *
  * Bigrams are packed code-point longs throughout: UTF-8 byte order
  * equals code-point order, so numeric sort order IS the fold order the
  * DuckDB oracle's `ORDER BY bg` (binary collation) walks — with zero
  * string allocation in any hot loop.
  */
object LmScore {

  /** The nll threshold below which a document is kept. */
  val KeepBelow = 1.70

  /** The trained model: `lp` holds seen-bigram log-probs, `unseen` holds
    * the add-one-smoothing log-prob `log(1/(cpre+vn))` per SEEN prefix,
    * and `floor` is `log(1/vn)` for a prefix the training corpus never
    * produced (cpre=0). Serving a document stream (st6) means scoring
    * text the training snapshot never saw — the model must be TOTAL over
    * bigrams, not just the trained support.
    */
  final case class BigramModel(lp: Map[Long, Double],
                               unseen: Map[Long, Double],
                               floor: Double) {
    /** Total log-prob lookup: seen bigram → trained lp; unseen bigram
      * with a seen prefix → that prefix's smoothing mass; unseen prefix
      * → the vocabulary floor.
      */
    def logp(bg: Long): Double =
      lp.getOrElse(bg, unseen.getOrElse(bg >> 21, floor))
  }

  private def bgKey(cp1: Int, cp2: Int): Long = (cp1.toLong << 21) | cp2.toLong

  /** Train the add-one-smoothed bigram model from `(doc_id, t)` rows
    * (already lowercased, length ≥ 2). One in-memory combine per
    * partition (≤|alphabet|² numeric rows each), then exact integer-count
    * aggs; the finished ≤|alphabet|²-row model collects to the driver —
    * the stableIds-offsets pattern, not a data loop.
    */
  def trainBigramModel(d: DataFrame): BigramModel = {
    val spark = d.sparkSession
    import spark.implicits._
    val partCounts = d.as[(Long, String)].mapPartitions { rows =>
      val m = new java.util.HashMap[java.lang.Long, Long]()
      rows.foreach { case (_, t) =>
        val cps = t.codePoints().toArray
        var i = 0
        while (i < cps.length - 1) {
          val k = java.lang.Long.valueOf(bgKey(cps(i), cps(i + 1)))
          val prev = m.get(k)
          m.put(k, if (prev == null) 1L else prev + 1L)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala.map(e => (e.getKey.toLong, e.getValue))
    }.toDF("bg", "k")
    val cnt = partCounts.groupBy("bg").agg(sum(col("k")).cast("double").as("cbg"))
    val pre = cnt.groupBy(shiftright(col("bg"), 21).as("c1"))
      .agg(sum(col("cbg")).as("cpre"))
    val v = cnt.select(explode(array(
        shiftright(col("bg"), 21),
        col("bg").bitwiseAND(lit((1L << 21) - 1)))).as("c"))
      .agg(countDistinct(col("c")).cast("double").as("vn"))
    val joined = cnt
      .join(broadcast(pre), shiftright(col("bg"), 21) === col("c1"))
      .crossJoin(broadcast(v))
    val lp = joined
      .select(col("bg"),
        log((col("cbg") + 1.0) / (col("cpre") + col("vn"))).as("logp"))
      .as[(Long, Double)].collect().toMap
    // per-prefix unseen mass log(1/(cpre+vn)) and the unseen-prefix floor
    // log(1/vn): both derive from the SAME tiny aggregates, so the model
    // stays ≤|alphabet|²+|alphabet|+1 rows regardless of corpus size
    val unseen = pre.crossJoin(broadcast(v))
      .select(col("c1"), (-log(col("cpre") + col("vn"))).as("logp"))
      .as[(Long, Double)].collect().toMap
    val floor = v.as[Double].collect().headOption
      .filter(_ > 0.0).map(vn => -math.log(vn)).getOrElse(0.0)
    BigramModel(lp, unseen, floor)
  }

  /** Score one document against the model: `(doc_id, nll, keep)`. The
    * per-doc histogram folds in packed-key (= UTF-8 binary) order, so the
    * double sum associates exactly like the oracle's ordered
    * `list_reduce`; 6-dp HALF_UP round as the boundary guard.
    */
  def score(model: BigramModel, id: Long, t: String): (Long, Double, Long) = {
    val m = new java.util.TreeMap[java.lang.Long, Long]()
    val cps = t.codePoints().toArray
    var i = 0
    var nBg = 0L
    while (i < cps.length - 1) {
      val bg = java.lang.Long.valueOf(bgKey(cps(i), cps(i + 1)))
      val prev = m.get(bg)
      m.put(bg, if (prev == null) 1L else prev + 1L)
      nBg += 1L
      i += 1
    }
    // a <2-code-point document has no bigrams: nothing to score, drop it
    // (nll=+inf would NaN through BigDecimal; the gate semantics are
    // "no evidence of quality → don't keep")
    if (nBg == 0L) return (id, Double.MaxValue, 0L)
    var acc = 0.0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      acc = acc + e.getValue.toDouble * model.logp(e.getKey)
    }
    val nll = BigDecimal(-acc / nBg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (id, nll, if (nll < KeepBelow) 1L else 0L)
  }
}
