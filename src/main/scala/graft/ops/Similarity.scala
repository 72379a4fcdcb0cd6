package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): exact
  * brute-force top-k as the correctness baseline, sign-LSH bucketed near-dup
  * and IVF coarse-quantized ANN as the scale paths.
  *
  * Scale design: probe/centroid sets are `broadcast` (they are small by
  * construction), the corpus is never shuffled whole — candidate scoring is
  * map-side, and per-probe top-k goes through [[TopK]], a bounded-heap
  * `Aggregator` whose partial buffers (≤ k rows each) are merged map-side, so
  * the only shuffle is k rows per probe per map partition. Cosine math is
  * done in doubles (`zip_with` + `aggregate`, codegen'd) for engine-portable
  * results.
  */
object Similarity {

  /** Dot product of two double-array columns — the codegen'd
    * [[graft.functions.VectorMath.fast_dot]] loop, value-identical
    * (same left-to-right double summation, same null semantics) to the
    * `aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)` composition it
    * replaces but >50× faster at pair volume: higher-order functions
    * evaluate interpreted, one boxed step per element, and the pairwise
    * scoring loops of n1/n4 are exactly elements × pairs.
    */
  def dot(x: Column, y: Column): Column =
    graft.functions.VectorMath.fast_dot(x.cast("array<double>"), y.cast("array<double>"))

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Append a unit-normalized double copy of `embCol` as `uCol`.
    *
    * Every similarity op here scores each vector against MANY others
    * (k centroids, a probe set, all same-cell vectors); normalizing once
    * per vector turns each pairwise cosine — three O(d) dot products —
    * into a single dot, paying one O(d) normalization per row instead.
    * The norm must NOT be captured inside the divide lambda: a lambda body
    * re-evaluates captured non-attribute expressions per element, and
    * binding the norm to its own column does not survive the optimizer —
    * `CollapseProject` inlines any alias consumed once, straight into the
    * lambda body, turning the O(d) normalization into an O(d²) interpreted
    * reduction per vector (measured 4× on the d4 bench). `array_repeat`
    * hoists it: an ARGUMENT of a higher-order function is evaluated once
    * per row wherever the optimizer inlines it.
    */
  private def withUnit(df: DataFrame, embCol: String, uCol: String): DataFrame =
    df.withColumn("__d", col(embCol).cast("array<double>"))
      .withColumn(uCol,
        zip_with(col("__d"),
          array_repeat(sqrt(dot(col("__d"), col("__d"))), size(col("__d"))),
          (x, n) => x / n))
      .drop("__d")

  /** Sign-LSH bucket key: the sign pattern of the first `bits` components
    * (axis-aligned random-hyperplane LSH). Scale-invariant — v and c·v
    * (c > 0) always share a bucket, which is what makes the near-dup recall
    * exact for scaled duplicates.
    */
  def signKey(emb: Column, bits: Int = 16): Column =
    concat_ws("", transform(slice(emb, 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** Equal-vector collapse for the sign-LSH candidate join: tag every row
    * with the lowest vec_id sharing its EXACT embedding array. Mirrors
    * [[Dedup.setGroups]] — the array itself is the grouping key (Spark
    * hashes/compares arrays natively; no encoding needed).
    */
  private[graft] def vectorGroups(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .withColumn("rep_id", min(col("vec_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("embedding")))

  /** Sign-bucket candidate pairs (`id_a < id_b`, embeddings attached)
    * over a representative set — the pre-verify join volume the
    * hot-bucket bound controls (`SimilaritySpec` counts it directly:
    * "a 150-copy cluster collapses to one banding representative").
    */
  private[graft] def signBucketCandidates(reps: DataFrame, bits: Int): DataFrame = {
    val keyed = reps.select(col("vec_id"), col("embedding"),
      signKey(col("embedding"), bits).as("bkey"))
    val a = keyed.select(col("bkey"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = keyed.select(col("bkey"), col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, Seq("bkey")).filter(col("id_a") < col("id_b"))
  }

  /** D4 — embedding near-dup: sign-LSH bucket join + exact cosine verify
    * within buckets; pairs with `cos >= threshold` (ids only — float values
    * never leave the pipeline, keeping results engine-exact).
    *
    * Hot-bucket bound (same story as [[Dedup.minhashNearDups]]): rows with
    * EQUAL embedding arrays collapse to one banding representative
    * ([[vectorGroups]]) before the bucket join — a cluster of m exact
    * copies otherwise shares its sign key and the join emits O(m²)
    * candidate rows, the straggler bucket at corpus scale. Within-group
    * pairs are expanded by a self-join on `rep_id` — one long, a narrow
    * shuffle key, never the embedding array — and the self-cosine guard
    * (`cos(v,v) >= threshold`, which depends only on the group's shared
    * value) is evaluated ONCE PER REPRESENTATIVE and applied as a semi-
    * join, so an m-copy cluster pays O(m²) id emission (the pair-output
    * contract itself) but only O(d) verify arithmetic. Cross-group pairs
    * inherit their representatives' verified cosine, so the result is
    * value-identical to the uncollapsed pipeline (a zero vector raises
    * the same ANSI divide-by-zero either way). `bits` is the
    * bucket-granularity knob — grow it with the corpus so buckets of
    * DISTINCT vectors stay bounded too.
    */
  def embeddingNearDups(corpus: DataFrame, threshold: Double = 0.9,
                        bits: Int = 0): DataFrame = {
    // default (0) self-sizes the hyperplane count from the corpus count
    // ([[graft.ops.LshSizing.sizeBits]]): 2^bits buckets keep expected
    // random-direction occupancy bounded at any scale; explicit values
    // pin a granularity (specs, A/B runs)
    val nBits =
      if (bits > 0) bits
      else graft.ops.LshSizing.sizeBits(corpus.count())
    // `grouped` feeds four branches (rep set, the within expansion, both
    // cross-group member maps) — materialize it ONCE with
    // an eager localCheckpoint. Exchange reuse does NOT cover this shape:
    // the branches prune different columns (reps keep the embedding, the
    // member maps drop it), so the window's input exchange canonicalizes
    // differently per branch and AQE recomputes the vector grouping into
    // each one (measured: d4 drifted 0.53→1.02 s at sf0.1 on recompute).
    // The checkpoint is pruning-opaque, leaves no session-cache entry, and
    // its blocks free with the RDD reference (ContextCleaner). The
    // embedding-keyed window shuffle now runs exactly once, inside the
    // checkpoint job — SimilaritySpec pins that the serving plan reads
    // the materialized RDD with zero array-keyed exchanges.
    // the self-cosine guard rides the checkpoint row: it depends only on
    // the row's embedding (identical across a group by construction), so
    // one O(d) dot per row at materialization time replaces the separate
    // okReps branch + semi-join of the r10 shape — one less stage in the
    // serving plan, same O(d)-not-O(m²·d) verify arithmetic per cluster
    val grouped = vectorGroups(corpus)
      .withColumn("rep_ok",
        cosine(col("embedding"), col("embedding")) >= threshold)
      .localCheckpoint()
    val reps = grouped.filter(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("embedding"))
    // raw-embedding cosine in the verify, NOT the pre-normalized form the
    // high-pair-volume ops use: sign buckets over collapsed reps leave so
    // few candidate pairs that one three-dot cosine per candidate is
    // cheaper than paying a per-row normalization over the whole corpus
    // (effective granularity caps at the embedding dimension — signKey
    // reads component signs, so `slice` truncates bits beyond dim)
    val repPairs = signBucketCandidates(reps, nBits)
      .filter(cosine(col("ea"), col("eb")) >= threshold)
      .select("id_a", "id_b")
    val members = grouped.select(col("rep_id"), col("vec_id"), col("rep_ok"))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.vec_id") < col("y.vec_id"))
      .filter(col("x.rep_ok"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    val ma = grouped.select(col("rep_id").as("id_a"), col("vec_id").as("da"))
    val mb = grouped.select(col("rep_id").as("id_b"), col("vec_id").as("db"))
    val cross = repPairs.join(ma, "id_a").join(mb, "id_b")
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"))
    within.unionAll(cross)
  }

  /** Scored candidate for top-k: ordered by (score desc, id asc). */
  case class Scored(score: Double, id: Long)

  /** Bounded top-k aggregator: the buffer never exceeds k entries, partial
    * buffers combine map-side, ties break on ascending id for determinism.
    *
    * The buffer is kept SORTED by rank at all times, so the hot path —
    * `reduce` over every candidate row — is an O(1) early reject when the
    * candidate can't beat the current worst (the overwhelmingly common case
    * once the buffer fills), and an O(k) ordered insert otherwise; `merge`
    * is a linear merge of two sorted runs. No sort-per-row anywhere.
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    /** true iff `a` ranks strictly before `b` (score desc, id asc). */
    private def before(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
      if (buf.length >= k && !before(in, buf.last)) return buf // early reject
      var i = buf.length
      while (i > 0 && before(in, buf(i - 1))) i -= 1
      val ins = (buf.take(i) :+ in) ++ buf.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
      val out = Vector.newBuilder[Scored]
      var i = 0
      var j = 0
      var n = 0
      while (n < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && before(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** N1 — exact brute-force cosine top-k: broadcast the probe set, score the
    * corpus map-side, reduce with [[TopK]]. Output (probe_id, neighbor_id,
    * rank), rank 1-based by (cos desc, vec_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    rankTopK(withUnit(corpus, "embedding", "u"),
      withUnit(probes, "embedding", "pu").select(col("vec_id").as("p_id"), col("pu")),
      k, keep = lit(true))

  /** The shared broadcast-probes / map-side-score / bounded-heap / rank
    * pipeline behind [[bruteForceTopK]], [[hardNegatives]] and
    * [[mipsTopK]]: `corpusU` carries the scoring vector as `u` (unit for
    * cosine callers, raw for the MIPS inner-product ranking); `probes`
    * carries (p_id, pu[, extra probe columns]); `keep` is an additional
    * scan-side predicate fused ahead of the heap (n12's label mismatch).
    */
  private def rankTopK(corpusU: DataFrame, probes: DataFrame, k: Int,
                       keep: Column): DataFrame = {
    val topk = udaf(new TopK(k), Encoders.product[Scored])
    corpusU.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id") && keep)
      .withColumn("cos", dot(col("pu"), col("u")))
      .groupBy("p_id")
      .agg(topk(col("cos"), col("vec_id")).as("top"))
      .select(col("p_id").as("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** N12 — contrastive hard-negative mining, the training-data op behind
    * every two-tower/DPR-style embedding model: for each anchor (probe),
    * the top-k most-similar corpus items with a DIFFERENT label — the
    * negatives that actually move the loss (random negatives are
    * trivially separable; the hard ones sit just across the decision
    * boundary). Same bounded-heap posture as [[bruteForceTopK]] with the
    * label-mismatch predicate fused into the map-side scoring filter, so
    * same-label rows never even reach the heap.
    *
    * Scale shape: probes (with labels) broadcast; the corpus is scored
    * map-side and reduced through [[TopK]] — ≤ k candidates per probe
    * per partition shuffle, nothing pair-shaped ever exchanges.
    */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    rankTopK(withUnit(corpus, "embedding", "u"),
      withUnit(probes, "embedding", "pu")
        .select(col("vec_id").as("p_id"), col("label").as("p_label"), col("pu")),
      k, keep = col("label") =!= col("p_label"))

  /** N11 — exact maximum-inner-product top-k, the recommender/retrieval
    * scoring mode where magnitude matters: the same bounded-heap serve
    * as [[bruteForceTopK]], ranking by the RAW inner product q·v — the
    * exact MIPS baseline, and the identical left-to-right double sum the
    * DuckDB oracle computes, so ties resolve identically via the vec_id
    * tiebreak (ranking by a normalized augmented cosine instead is equal
    * only in exact arithmetic and can rank-swap ~1-ulp ties between
    * engines — ADVICE r16).
    *
    * The reduction that lets cosine INDEXES serve MIPS lives in
    * [[mipsAugment]]; it is deliberately NOT computed here — in a
    * brute-force raw-dot serve the augmentation is provably inert
    * (⟨[q,0],[v,s]⟩ ≡ q·v bit-for-bit: the appended probe coordinate is
    * 0), so running it would be dead work and any grade over the result
    * vacuous for the reduction (review r17). `SimilaritySpec` pins the
    * reduction where it is load-bearing: the cosine machinery over
    * [[mipsAugment]]'s vectors must reproduce THIS serve's ranking.
    *
    * Scale shape: broadcast probes, map-side scoring, ≤ k candidates per
    * probe per partition — nothing pair-shaped shuffles.
    */
  def mipsTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    rankTopK(
      corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("u")),
      probes.select(col("vec_id").as("p_id"),
        col("embedding").cast("array<double>").as("pu")),
      k, keep = lit(true))

  /** The norm-augmentation MIPS→cosine reduction (Bachrach et al.,
    * RecSys 2014; Neyshabur & Srebro 2015): MIPS does not fit cosine
    * indexes directly (inner product is not a metric — a vector can be
    * its own worst neighbor), but appending one coordinate makes it
    * one. With `M = max ||v||` over the corpus, each corpus vector
    * becomes `[v, sqrt(M² − ||v||²)]` (norm exactly M for every vector)
    * and each probe `[q, 0]`; then `cos(q', v') = (q·v)/(||q||·M)` — a
    * per-probe POSITIVE rescale of the inner product, so cosine order
    * IS inner-product order and every cosine index in this file (IVF,
    * PQ, sign-LSH banding) serves MIPS unchanged on the returned
    * (corpus, probes). `M` is a 1-row aggregate; the augmentation is a
    * per-row map.
    */
  def mipsAugment(corpus: DataFrame, probes: DataFrame): (DataFrame, DataFrame) = {
    val d = col("embedding").cast("array<double>")
    val m2Row = corpus.agg(max(dot(d, d))).collect()(0)
    // max over zero rows is NULL — an empty corpus must yield empty
    // augmented frames, not a driver NPE (review r16)
    val m2 = if (m2Row.isNullAt(0)) 0.0 else m2Row.getDouble(0)
    // greatest(0, ·) guards the sqrt against -epsilon on the max-norm
    // vector itself (m2 - dot computed in double)
    val aug = corpus.select(col("vec_id"),
      concat(d, array(sqrt(greatest(lit(0.0), lit(m2) - dot(d, d)))))
        .as("embedding"))
    val p = probes.select(col("vec_id"),
      concat(d, array(lit(0.0))).as("embedding"))
    (aug, p)
  }

  /** N4 — symmetric int8 scalar quantization of the UNIT-normalized
    * vector: `q_i = floor(u_i · 127) ∈ [-127, 127]`. Normalize-first
    * matters: codes of the raw values under an affine (min/max) map score
    * `q·q' ≈ a²(x·x') + ab·Σx + b²d` — the offset terms swamp the signal
    * and the integer dot stops tracking cosine (measured: the prefilter
    * lost true top-3 neighbors on random data). On unit vectors the
    * symmetric integer dot IS ≈ 127²·cosine, no codebook needed, and
    * quantization is scale-invariant like cosine itself. 4× smaller than
    * float32 — at corpus scale, 4× less candidate-pass shuffle/cache
    * footprint, with exact-float rerank recovering the final order.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val d = col("embedding").cast("array<double>")
    val withNorm = emb.withColumn("__norm", sqrt(dot(d, d)))
    // norm rides as an array_repeat ARGUMENT so the optimizer cannot
    // inline it into the lambda body (see withUnit's note)
    withNorm.select(col("vec_id"),
      when(col("__norm") === 0, transform(d, _ => lit(0L)))
        .otherwise(zip_with(d, array_repeat(col("__norm"), size(d)),
          (x, n) => floor(x * 127 / n).cast("long"))).as("q"))
  }

  /** N4 — quantized search with exact rerank: candidates ranked by the
    * int8 dot product (exact integer arithmetic — engine-portable), the
    * top `rerank` per probe re-scored with exact float cosine, top `k`
    * kept. The prefilter reduces through [[TopK]] like n1 — the probes ×
    * corpus candidate volume collapses map-side to ≤ `rerank` ids per probe
    * per partition, so nothing pair-shaped ever shuffles (a `row_number`
    * window here measured 3× the whole-query cost at the sf1 sweep: the
    * full candidate set shuffled into the window sort). The int8 dot fits
    * a double exactly (|q·q'| ≤ 127²·d ≪ 2⁵³), so [[Scored]] ordering ==
    * (qdot desc, vec_id asc) and the selected candidate set is identical.
    * The final rerank window sees only probes × rerank rows; `rank <= k`
    * plans as `WindowGroupLimit`.
    */
  def quantizedTopK(corpus: DataFrame, probes: DataFrame,
                    k: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cq = quantizeInt8(corpus)
    val pq = quantizeInt8(probes)
      .select(col("vec_id").as("p_id"), col("q").as("pq"))
    // the n4 prefilter hot loop: pairs × d integer multiply-adds — the
    // codegen'd long-array dot, not the interpreted higher-order form
    val qdot = graft.functions.VectorMath.fast_dot(col("q"), col("pq"))
    val topq = udaf(new TopK(rerank), Encoders.product[Scored])
    val cands = cq.crossJoin(broadcast(pq))
      .filter(col("vec_id") =!= col("p_id"))
      .withColumn("qdot", qdot.cast("double"))
      .groupBy("p_id")
      .agg(topq(col("qdot"), col("vec_id")).as("top"))
      .select(col("p_id"), explode(col("top")).as("s"))
      .select(col("p_id"), col("s.id").as("vec_id"))
    val wC = Window.partitionBy("p_id").orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .join(broadcast(probes.select(col("vec_id").as("p_id"),
        col("embedding").as("pe"))), "p_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("cos", cosine(col("pe"), col("embedding")))
      .withColumn("rnk", row_number().over(wC))
      .filter(col("rnk") <= k)
      .select(col("p_id").as("probe_id"), col("vec_id").as("neighbor_id"),
        col("rnk").cast("long").as("rank"))
  }

  /** IVF coarse quantization: assign every vector to its nearest centroid by
    * cosine (ties → lowest centroid id). Implemented as a broadcast score +
    * `max(struct(...))` argmax, which combines map-side — no window shuffle
    * of the corpus.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = withUnit(centroids, "embedding", "cu").select(col("vec_id").as("c_id"), col("cu"))
    withUnit(corpus, "embedding", "u").crossJoin(broadcast(c))
      .withColumn("cos", dot(col("cu"), col("u")))
      .groupBy("vec_id")
      .agg(max(struct(col("cos").as("s"), (-col("c_id")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).cast("long").as("cell"))
  }

  /** Top-`n` nearest centroids per vector — `(vec_id, cell, crank)` with
    * crank 1 = primary assignment. Same broadcast-score + bounded [[TopK]]
    * shape as the search itself.
    */
  def ivfAssignTop(vectors: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val c = withUnit(centroids, "embedding", "cu").select(col("vec_id").as("c_id"), col("cu"))
    val topn = udaf(new TopK(n), Encoders.product[Scored])
    withUnit(vectors, "embedding", "u").crossJoin(broadcast(c))
      .withColumn("cos", dot(col("cu"), col("u")))
      .groupBy("vec_id")
      .agg(topn(col("cos"), col("c_id")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), col("s.id").cast("long").as("cell"),
        (col("pos") + 1).as("crank"))
  }

  /** Deterministic bounded training sample: the top `maxTrain` rows by
    * `md5(vec_id)` (ties by id). Plans as a distributed TakeOrdered —
    * every partition keeps ≤ maxTrain rows, the driver merges — never a
    * full sort; the hash order is independent of id locality, so the
    * sample is unbiased, and it is the SAME set on every run. Driver
    * memory is bounded by `maxTrain · dim` doubles by construction.
    */
  private def collectTrainSample(vecs: DataFrame, idCol: String, vCol: String,
                                 maxTrain: Int): Array[(Long, Array[Double])] =
    vecs.select(col(idCol), col(vCol).cast("array<double>"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(maxTrain)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** IVF coarse-quantizer training — Lloyd's k-means over a DETERMINISTIC
    * BOUNDED sample, run in driver memory (the FAISS practice: quantizers
    * train on a capped subsample — k·dim parameters cannot absorb more —
    * and the result broadcasts everywhere else). Semantics match the
    * former distributed loop exactly: seeds are the `k` lowest-id
    * vectors re-keyed 0..k-1, assignment is cosine argmax with ties to
    * the lowest cell ([[ivfAssign]]'s rule), the update is the per-cell
    * element-wise mean of RAW member vectors, and cells that lose all
    * members keep their previous centroid. Driver-side summation in
    * vec_id order makes the result bit-DETERMINISTIC across runs — the
    * distributed form's float-order caveat is gone — and the whole loop
    * is O(sample · k · dim) arithmetic with zero jobs per round, where
    * the DataFrame loop paid ~1 s of shuffle + checkpoint fixed cost per
    * round regardless of data size (the st8/n6 build-phase profile).
    * The one job is the TakeOrdered sample collect
    * ([[collectTrainSample]]); at any corpus scale it moves ≤ maxTrain
    * rows. Returns `(vec_id, embedding)` like before.
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
                     maxTrain: Int = 1 << 16): DataFrame = {
    val spark = corpus.sparkSession
    val sample = collectTrainSample(corpus, "vec_id", "embedding", maxTrain)
    val dim = if (sample.isEmpty) 0 else sample(0)._2.length
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n) // n == 0 → ±Inf/NaN, the same double semantics withUnit has
    }
    // seeds: k lowest-id vectors, re-keyed 0..k-1
    var cents: Array[Array[Double]] = sample.take(k).map(_._2)
    var i = 0
    while (i < iters && sample.nonEmpty) {
      val cu = cents.map(unit)
      val sums = Array.fill(cents.length, dim)(0.0)
      val counts = new Array[Long](cents.length)
      sample.foreach { case (_, v) =>
        val u = unit(v)
        var best = 0; var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < cu.length) {
          var d = 0.0; var j = 0
          while (j < dim) { d += cu(c)(j) * u(j); j += 1 }
          if (d > bestCos) { bestCos = d; best = c } // ties keep lowest cell
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (prev, c) =>
        if (counts(c) == 0) prev // empty cell keeps its previous centroid
        // float round-trip mirrors the DataFrame loop's array<float> cast
        else sums(c).map(s => (s / counts(c)).toFloat.toDouble)
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.zipWithIndex.map { case (e, c) =>
        org.apache.spark.sql.Row(c.toLong, e.map(_.toFloat)) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = false))))
  }

  /** N9 — capacity-capped balanced assignment (two-choice greedy): partition
    * the corpus across k centroid-keyed shards such that no shard exceeds
    * `cap` FIRST-CHOICE members — the embedding-serving layout problem
    * (near-uniform shard loads beat nearest-only assignment, whose hot
    * cells absorb arbitrarily more than their share under skewed data).
    *
    * Round 1: every vector applies to its nearest cell; the `cap`
    * strongest affinities (cos desc, vec_id asc) keep their seats.
    * Round 2: evictees apply to their SECOND-nearest cell for the seats
    * round 1 left there, same strongest-first rule. Residual overflow
    * stays in the second-choice cell but is flagged (`seated_round` 3) —
    * a bounded, reported imbalance rather than a silent one.
    *
    * Shapes at scale: preference generation is the [[TopK]] broadcast
    * argmax (map-side partial, no corpus window); seating is two
    * cell-partitioned windows (k cells — grow k with the corpus exactly
    * like IVF, so cells stay executor-sized); the eviction slice joins its
    * second preference on `vec_id` (one exchange of the evictions only)
    * and the k-row seat ledger broadcasts. Returns
    * `(vec_id, cell, seated_round ∈ {1,2,3})` for every corpus vector.
    */
  def balancedAssign(corpus: DataFrame, centroids: DataFrame, cap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withUnit(centroids, "embedding", "cu")
      .select(col("vec_id").as("c_id"), col("cu"))
    // zero centroids would make every pref row vanish and return an empty
    // frame in silent violation of the one-row-per-corpus-vector contract
    // — fail loudly. (isEmpty is a limit-1 probe of a dimension-sized
    // table; the k = 1 degenerate case is handled lazily below.)
    require(!c.isEmpty, "balancedAssign needs at least one centroid")
    val top2 = udaf(new TopK(2), Encoders.product[Scored])
    val prefs = withUnit(corpus, "embedding", "u").crossJoin(broadcast(c))
      .withColumn("cos", dot(col("cu"), col("u")))
      .groupBy("vec_id")
      .agg(top2(col("cos"), col("c_id")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), col("s.id").cast("long").as("cell"),
        col("s.score").as("cos"), (col("pos") + 1).as("crank"))
    val byCell = Window.partitionBy("cell")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val first = prefs.filter(col("crank") === 1)
      .withColumn("seat", row_number().over(byCell))
    val seated1 = first.filter(col("seat") <= cap)
      .select(col("vec_id"), col("cell"), lit(1L).as("seated_round"))
    // k-row ledger of seats round 1 consumed — broadcasts onto round 2
    val used = seated1.groupBy("cell").agg(count(lit(1)).as("n_used"))
    // two-choice seating needs two choices: with a single centroid an
    // evicted vector has no crank-2 row — keep it seated in its only
    // cell, flagged round 3 (a bounded, REPORTED imbalance), instead of
    // letting the row vanish from the output (contract: one row per
    // corpus vector). The left join costs nothing in the k >= 2 case
    // (every vector then has a second preference) and replaces the
    // previous eager `limit(2).count()` arity guard, which ran a Spark
    // job on every call (ADVICE r13).
    val second = first.filter(col("seat") > cap)
      .select(col("vec_id"), col("cell").as("__cell1"))
      .join(prefs.filter(col("crank") === 2)
        .select(col("vec_id"), col("cell"), col("cos")), Seq("vec_id"), "left_outer")
      .withColumn("cell", coalesce(col("cell"), col("__cell1")))
      .withColumn("cos", coalesce(col("cos"), lit(Double.NegativeInfinity)))
      .join(broadcast(used), Seq("cell"), "left_outer")
      .withColumn("rem", lit(cap) - coalesce(col("n_used"), lit(0L)))
      .withColumn("seat", row_number().over(byCell))
    seated1
      .unionByName(second.select(col("vec_id"), col("cell"),
        when(col("seat") <= col("rem"), 2L).otherwise(3L).as("seated_round")))
  }

  /** D9 — SemDeDup-style semantic deduplication (the public recipe of
    * Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication"): cluster the corpus with the coarse
    * quantizer, then exact pairwise cosine WITHIN cells only; a vector
    * with a same-cell neighbor at `cos >= threshold` and a lower id is a
    * semantic duplicate. Returns the dropped `(vec_id, cell)` set.
    *
    * Same verify as [[embeddingNearDups]], different bucketing: k-means
    * cells follow the DATA's density (a boilerplate-heavy region is split
    * into many small cells by its own centroids) where sign-LSH hyperplanes
    * are data-oblivious. Cell granularity is the scale knob — grow k with
    * the corpus so cells stay bounded; the pairing join shuffles on cell id
    * only and never materializes cross-cell pairs. Recall trade: cross-cell
    * near-dups are missed by design (the paper's own approximation); run
    * [[embeddingNearDups]] when hyperplane recall semantics are wanted.
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
               threshold: Double = 0.9): DataFrame = {
    val withCell = withUnit(corpus.join(ivfAssign(corpus, centroids), "vec_id"),
      "embedding", "u")
    val a = withCell.select(col("cell"), col("vec_id").as("id_a"), col("u").as("ua"))
    val b = withCell.select(col("cell"), col("vec_id").as("id_b"), col("u").as("ub"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("ua"), col("ub")) >= threshold)
      .select(col("id_b").as("vec_id"), col("cell")).distinct()
  }

  /** N2 — IVF-bucketed ANN: probes search their `nprobe` nearest coarse
    * cells, exact cosine within them, [[TopK]] per probe. The cell join
    * shuffles by cell id — candidate sets are bounded by cell size ×
    * nprobe, never the corpus. Higher `nprobe` trades latency for recall,
    * exactly as in a production IVF index.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, probeFilter: Column,
              k: Int, nprobe: Int = 1): DataFrame = {
    // Materialize the assignment eagerly (2 longs per vector — tiny at
    // any corpus size). It feeds only the candidate branch, but the
    // boundary still earns its keep: measured A/B at sf0.1 has the n3
    // pipeline ~25% slower without it (the materialized stats let AQE
    // size the cell-join exchange instead of re-planning through the
    // argmax agg). localCheckpoint, not persist: same stats boundary,
    // but the blocks free with the RDD reference (ContextCleaner)
    // instead of sitting in the session cache until someone clears it —
    // a serve-many deployment stages the assignment to parquet instead
    // (the n3 path via trainCentroids).
    val assign = ivfAssign(corpus, centroids).localCheckpoint()
    val withCell = withUnit(corpus.join(assign, "vec_id"), "embedding", "u")
    val probes = withUnit(ivfAssignTop(corpus.filter(probeFilter), centroids, nprobe)
        .join(corpus, "vec_id"), "embedding", "pu")
      .select(col("vec_id").as("p_id"), col("pu"), col("cell"))
    val topk = udaf(new TopK(k), Encoders.product[Scored])
    withCell.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("p_id"))
      .withColumn("cos", dot(col("pu"), col("u")))
      .groupBy("p_id")
      .agg(topk(col("cos"), col("vec_id")).as("top"))
      .select(col("p_id").as("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** IVF radius (range) search: ALL neighbors within cosine ≥ `threshold`
    * of each probe, looking in the probe's `nprobe` nearest cells — the
    * retrieval form dedup/recall jobs need ("everything this similar"),
    * where top-k's fixed cut is wrong. Same shapes as [[ivfTopK]]
    * (broadcast-scored assignment, cell-keyed equi-join), but the
    * per-cell cut is a predicate instead of a bounded heap, so output
    * volume tracks the true neighborhood size. Each pair surfaces at most
    * once: a neighbor has exactly one primary cell, whichever of the
    * probe's `nprobe` cells it is.
    */
  def ivfRadius(corpus: DataFrame, centroids: DataFrame, probeFilter: Column,
                threshold: Double, nprobe: Int = 1): DataFrame = {
    val assign = ivfAssign(corpus, centroids).localCheckpoint()
    val withCell = withUnit(corpus.join(assign, "vec_id"), "embedding", "u")
    val probes = withUnit(ivfAssignTop(corpus.filter(probeFilter), centroids, nprobe)
        .join(corpus, "vec_id"), "embedding", "pu")
      .select(col("vec_id").as("p_id"), col("pu"), col("cell"))
    withCell.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("p_id"))
      .withColumn("cos", dot(col("pu"), col("u")))
      .filter(col("cos") >= threshold)
      .select(col("p_id").as("probe_id"), col("vec_id").as("neighbor_id"))
  }

  // ------------------------------------------------------------------
  // N5 — product quantization (the FAISS-PQ recipe): split each unit
  // vector into m subvectors, learn a tiny per-subspace codebook, store
  // every vector as m small codes, and search by Asymmetric Distance
  // Computation — the probe scores the m·k codebook entries ONCE and
  // every corpus vector's similarity is m table lookups summed, no
  // full-dimension math on the corpus side. Memory per vector: m bytes
  // vs 4·dim — the compression that keeps a 100 TB corpus' index in
  // executor memory.
  // ------------------------------------------------------------------

  /** Subvector view over PRE-TRANSFORMED vectors `(vec_id, v)` (unit for
    * plain PQ, residuals for IVF-PQ — residuals must NOT re-normalize):
    * `(vec_id, subspace, sv)`, the vector's m contiguous `subDim`-wide
    * slices.
    */
  private def subVectorsOf(vecs: DataFrame, m: Int, subDim: Int): DataFrame =
    vecs
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("subspace"),
        col("v"))
      .select(col("vec_id"), col("subspace"),
        slice(col("v"), col("subspace") * subDim + 1, lit(subDim)).as("sv"))

  /** Subvector view of the unit-normalized embeddings. */
  private def subVectors(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    subVectorsOf(withUnit(corpus, "embedding", "u")
      .select(col("vec_id"), col("u").as("v")), m, subDim)

  /** Per-(vec, subspace) nearest code by inner product, ties by code
    * ascending — the encode rule BOTH engines replay from the staged
    * codebook, so codes are engine-portable.
    *
    * The argmax is a `max_by` AGGREGATE (partial max merged map-side),
    * not a `row_number` window — a window here would hash-exchange and
    * sort the corpus×m×k candidate rows on every train round and at
    * search time, the same measured antipattern n4's prefilter moved off.
    * `struct(s, -code)` ordering = score desc, code asc exactly.
    */
  private def assignCodes(svs: DataFrame, codebook: DataFrame): DataFrame = {
    val cb = codebook.select(col("subspace"), col("code"),
      col("embedding").cast("array<double>").as("ce"))
    svs.join(broadcast(cb), "subspace")
      .withColumn("s", dot(col("sv"), col("ce")))
      .groupBy("vec_id", "subspace")
      .agg(max_by(col("code"), struct(col("s"), -col("code"))).as("code"))
      .select(col("vec_id"), col("subspace"), col("code"))
  }

  /** Train the m per-subspace codebooks — joint Lloyd over all subspaces
    * on a deterministic bounded sample, like [[trainCentroids]].
    * Returns `(subspace, code, embedding)`.
    */
  def pqTrain(corpus: DataFrame, m: Int, subDim: Int, k: Int,
              iters: Int = 3): DataFrame =
    pqTrainVectors(withUnit(corpus, "embedding", "u")
      .select(col("vec_id"), col("u").as("v")), m, subDim, k, iters)

  /** [[pqTrain]]'s core over pre-transformed vectors `(vec_id, v)` — the
    * entry point IVF-PQ uses to train on RESIDUALS (which must not be
    * re-normalized; their whole point is to be small).
    *
    * Same driver-memory Lloyd posture as [[trainCentroids]]: ONE
    * TakeOrdered job collects the deterministic `maxTrain`-bounded
    * sample, then every round is O(sample · m · k · subDim) arithmetic
    * with zero cluster jobs — the former DataFrame loop paid two
    * shuffle+checkpoint jobs per round on data that is m·k·subDim floats
    * of parameters no matter the corpus size. Semantics match: seeds are
    * the k lowest-id vectors' subvectors (code = id rank), assignment is
    * inner-product argmax with ties to the lowest code
    * ([[assignCodes]]' rule), the update is the per-(subspace, code)
    * element-wise mean, and codes that lose all members keep their
    * previous entry. Summation in vec_id order → bit-deterministic.
    */
  def pqTrainVectors(vecs: DataFrame, m: Int, subDim: Int, k: Int,
                     iters: Int = 3, maxTrain: Int = 1 << 16): DataFrame =
    pqTrainLocal(vecs.sparkSession,
      collectTrainSample(vecs, "vec_id", "v", maxTrain), m, subDim, k, iters)

  /** The driver-memory joint-Lloyd core over an already-collected sample
    * (`(vec_id, vector)` in id order) — shared by [[pqTrainVectors]] and
    * the residual path of [[ivfPqTrainResiduals]].
    */
  private def pqTrainLocal(spark: org.apache.spark.sql.SparkSession,
                           sample: Array[(Long, Array[Double])],
                           m: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    // split each sampled vector into its m subvectors once
    def sub(v: Array[Double], j: Int): Array[Double] =
      v.slice(j * subDim, j * subDim + subDim).padTo(subDim, 0.0)
    // seeds: first k vectors (by id) → code 0..k-1, per subspace; the
    // float round-trip mirrors the array<float> codebook schema
    val nC = math.min(k, sample.length)
    var cents: Array[Array[Array[Double]]] = // [subspace][code][dim]
      Array.tabulate(m, nC)((j, c) => sub(sample(c)._2, j).map(_.toFloat.toDouble))
    var i = 0
    while (i < iters && sample.nonEmpty) {
      val sums = Array.fill(m, nC, subDim)(0.0)
      val counts = Array.fill(m, nC)(0L)
      sample.foreach { case (_, v) =>
        var j = 0
        while (j < m) {
          val sv = sub(v, j)
          var best = 0; var bestS = Double.NegativeInfinity
          var c = 0
          while (c < nC) {
            var d = 0.0; var p = 0
            while (p < subDim) { d += cents(j)(c)(p) * sv(p); p += 1 }
            if (d > bestS) { bestS = d; best = c } // ties keep lowest code
            c += 1
          }
          var p = 0
          while (p < subDim) { sums(j)(best)(p) += sv(p); p += 1 }
          counts(j)(best) += 1
          j += 1
        }
      }
      cents = Array.tabulate(m, nC) { (j, c) =>
        if (counts(j)(c) == 0) cents(j)(c)
        else sums(j)(c).map(s => (s / counts(j)(c)).toFloat.toDouble)
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      (for (j <- 0 until m; c <- 0 until nC) yield
        org.apache.spark.sql.Row(j, c.toLong, cents(j)(c).map(_.toFloat))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subspace",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = false))))
  }

  /** ADC top-k: probes score the m·k codebook entries once (the distance
    * table), corpus vectors join the table on their `(subspace, code)`
    * keys and sum their m entries in fixed subspace order; per-probe top-k
    * through the bounded [[TopK]] aggregator. The corpus-side math is m
    * lookups + (m−1) adds per (vector, probe) — never a full-dimension
    * dot — and the only shuffle is k rows per probe per partition.
    */
  def pqTopK(corpus: DataFrame, codebook: DataFrame, probeFilter: Column,
             k: Int, m: Int, subDim: Int): DataFrame = {
    val codes = assignCodes(subVectors(corpus, m, subDim), codebook)
    val cb = codebook.select(col("subspace"), col("code"),
      col("embedding").cast("array<double>").as("ce"))
    val ptab = subVectors(corpus.filter(probeFilter), m, subDim)
      .join(broadcast(cb), "subspace")
      .select(col("vec_id").as("p_id"), col("subspace"), col("code"),
        dot(col("sv"), col("ce")).as("pdot"))
    val perSub = (0 until m).map(j =>
      sum(when(col("subspace") === j, col("pdot"))).as(s"s$j"))
    val topk = udaf(new TopK(k), Encoders.product[Scored])
    codes.join(broadcast(ptab), Seq("subspace", "code"))
      .filter(col("vec_id") =!= col("p_id"))
      .groupBy("p_id", "vec_id")
      .agg(perSub.head, perSub.tail: _*)
      // fixed-order reduce: (s0+s1)+s2+… — the association the oracle mirrors
      .withColumn("adc", (0 until m).map(j => col(s"s$j")).reduce(_ + _))
      .groupBy("p_id")
      .agg(topk(col("adc"), col("vec_id")).as("top"))
      .select(col("p_id").as("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** ADC → exact two-stage PQ search — n4's quantized-prefilter/exact-
    * rerank recipe applied to the PQ index: ADC pools `pool` candidates
    * per probe in the compressed domain (m lookups per vector), then the
    * final top-k is EXACT cosine over the pooled candidates only,
    * closing the quantization-error gap ADC alone leaves. The rerank
    * fetches `pool·|probes|` full vectors — bounded by the pool, never a
    * corpus pass: the candidate list rides a broadcast back onto the
    * corpus scan, so the second stage adds no wide shuffle.
    */
  // ------------------------------------------------------------------
  // N6 — IVF-PQ (the FAISS IVFPQ composition): coarse k-means cells
  // bound WHERE to look (nprobe cells per probe, never the corpus), a
  // GLOBAL product-quantizer over cell RESIDUALS bounds the per-vector
  // memory (m bytes), and the inner product decomposes exactly:
  //   <q, u> = <q, ĉ(cell)> + <q, r>  ≈  cellConst + Σ_j ADC(j, code_j)
  // so search is one tiny per-(probe, cell) constant plus m table
  // lookups per candidate — the index shape a 100 TB vector corpus
  // actually deploys (train once, stage centroids + codebook to
  // parquet, serve many).
  // ------------------------------------------------------------------

  /** `(vec_id, cell, r)`: each unit vector's residual from its coarse
    * cell's UNIT centroid (unit on both sides so the IP decomposition
    * above is exact for cosine scoring).
    */
  private def residuals(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cu = withUnit(centroids, "embedding", "cu")
      .select(col("vec_id").as("cell"), col("cu"))
    withUnit(corpus, "embedding", "u")
      .join(ivfAssign(corpus, centroids), "vec_id")
      .join(broadcast(cu), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("u"), col("cu"), (a, b) => a - b).as("r"))
  }

  /** Train the residual codebook for IVF-PQ: coarse `centroids` are
    * [[trainCentroids]]' output (staged by the caller); the returned
    * `(subspace, code, embedding)` codebook quantizes residuals.
    */
  def ivfPqTrainResiduals(corpus: DataFrame, centroids: DataFrame,
                          m: Int, subDim: Int, k: Int,
                          iters: Int = 3): DataFrame =
    {
    // The training sample is bounded and the centroids are k·dim — so the
    // residualization of the SAMPLE happens in driver memory too, exactly
    // mirroring [[residuals]] (unit-normalize both sides, cosine-argmax
    // cell with ties to the lowest id, r = u − ĉ): one TakeOrdered job
    // collects the sample vectors, zero distributed assignment jobs. The
    // CORPUS-side residualization ([[ivfPqBuildIndex]]) stays distributed
    // — that one genuinely scales with the data.
    val cents = centroids
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val cu = cents.map { case (_, e) => unit(e) }
    val sample = collectTrainSample(corpus, "vec_id", "embedding", 1 << 16)
    val resSample = sample.map { case (id, v) =>
      val u = unit(v)
      var best = 0; var bestCos = Double.NegativeInfinity
      var c = 0
      while (c < cu.length) {
        var d = 0.0; var j = 0
        while (j < u.length) { d += cu(c)(j) * u(j); j += 1 }
        if (d > bestCos) { bestCos = d; best = c }
        c += 1
      }
      (id, u.zip(cu(best)).map { case (a, b) => a - b })
    }
    pqTrainLocal(corpus.sparkSession, resSample, m, subDim, k, iters)
    }

  /** IVF-PQ search with exact rerank: candidates come ONLY from each
    * probe's top-`nprobe` coarse cells, scored in the compressed domain
    * (cell constant + m ADC lookups), pooled to `pool` per probe, then
    * the final top-k is exact cosine over the pooled vectors (the n4/n5
    * two-stage recipe). All probe-side tables (cells, ADC entries,
    * constants) are broadcast; the corpus-side joins key on cell and
    * `(subspace, code)` — nothing corpus×probes ever materializes.
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
                probeFilter: Column, k: Int, pool: Int, nprobe: Int,
                m: Int, subDim: Int): DataFrame =
    ivfPqTopKProbes(corpus, centroids, codebook, corpus.filter(probeFilter),
      k, pool, nprobe, m, subDim)

  /** [[ivfPqTopK]] with an EXPLICIT probe set `(vec_id, embedding)` — the
    * serve-path entry point: probes can come from anywhere (a micro-batch
    * of arriving queries, [[graft.streaming.StreamAnn]]), the index side
    * stays the staged corpus/centroids/codebook.
    */
  def ivfPqTopKProbes(corpus: DataFrame, centroids: DataFrame,
                      codebook: DataFrame, probeSet: DataFrame,
                      k: Int, pool: Int, nprobe: Int,
                      m: Int, subDim: Int): DataFrame =
    // checkpoint the ad-hoc index: the search reads it on two branches
    // (cells slice + codes), and without materialization each branch
    // would re-run the assignCodes argmax over the corpus — the staged
    // path (st8) gets the same effect from its parquet round-trip
    ivfPqTopKIndexed(
      ivfPqBuildIndex(corpus, centroids, codebook, m, subDim).localCheckpoint(),
      corpus, centroids, codebook, probeSet, k, pool, nprobe, m, subDim)

  /** Build the servable index: one row per (vector, subspace) carrying
    * the coarse cell and the PQ code — m·k-bits per vector, EXACTLY the
    * table an IVF-PQ deployment stages to parquet at build time and
    * serves many query batches from ([[ivfPqTopKIndexed]]; the st8
    * streaming serve path does precisely that).
    */
  def ivfPqBuildIndex(corpus: DataFrame, centroids: DataFrame,
                      codebook: DataFrame, m: Int, subDim: Int): DataFrame = {
    // Both quantizers are BOUNDED driver state (k·dim centroids,
    // m·k·subDim codebook — the FAISS in-memory posture), so the whole
    // encode — cell argmax, residual, per-subspace code argmax — folds
    // into ONE per-row projection with the quantizers as literals
    // ([[KMeans.packedAssign]]'s pattern). The former shape paid a
    // centroid crossJoin + vec_id re-aggregation for the cell, a
    // corpus-wide self-join to attach it, a checkpoint barrier between
    // the two consumers, and a (vec_id, subspace) exchange for the code
    // argmax; the index build is now a single stateless scan — at corpus
    // scale, zero shuffles instead of three. Float math is bit-identical:
    // the same fast_dot fold in the same element order (multiply
    // commutes), driver-side unit() mirrors withUnit element-for-element
    // (the [[ivfPqTrainResiduals]] precedent the oracle already grades),
    // and every argmax keeps the max(struct(s, -id)) tie rule.
    val cents = centroids
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "ivfPqBuildIndex: centroids must be non-empty")
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val cus = cents.map { case (cid, e) => (cid, unit(e)) }
    val cb = codebook.select(col("subspace"), col("code"),
        col("embedding").cast("array<double>").as("ce"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val bySub: Map[Int, Array[(Long, Array[Double])]] = cb.groupBy(_._1)
      .map { case (j, rs) => j -> rs.map(t => (t._2, t._3)).sortBy(_._1) }
    // argmax as array_max over packed (score, -id) structs — the exact
    // max(struct(s, -id)) ordering (incl. NaN ranking) the aggregate had
    val cellPacked = cus.map { case (cid, cu) =>
      struct(dot(col("u"), typedLit(cu.toSeq)).as("s"), lit(-cid).as("nc"))
    }
    val cuMap = map(cus.flatMap { case (cid, cu) =>
      Seq(lit(cid), typedLit(cu.toSeq)) }.toSeq: _*)
    val codeCols = (0 until m).map { j =>
      val entries = bySub.getOrElse(j, Array.empty[(Long, Array[Double])])
      require(entries.nonEmpty,
        s"ivfPqBuildIndex: codebook has no entries for subspace $j")
      val sv = slice(col("r"), j * subDim + 1, subDim)
      val packed = entries.map { case (code, ce) =>
        struct(dot(sv, typedLit(ce.toSeq)).as("s"), lit(-code).as("nc"))
      }
      -array_max(array(packed.toIndexedSeq: _*)).getField("nc")
    }
    withUnit(corpus, "embedding", "u")
      .withColumn("cell",
        (-array_max(array(cellPacked.toIndexedSeq: _*)).getField("nc")).cast("long"))
      .withColumn("r",
        zip_with(col("u"), element_at(cuMap, col("cell")), (a, b) => a - b))
      .select(col("vec_id"), col("cell"),
        posexplode(array(codeCols: _*)).as(Seq("subspace", "code")))
      .select(col("vec_id"), col("cell"), col("subspace"), col("code"))
  }

  /** IVF-PQ search against a PRE-BUILT index (`(vec_id, cell, subspace,
    * code)` — [[ivfPqBuildIndex]]'s output, typically read back from
    * parquet): only probe-side work happens per call, which is what
    * makes the serve path's per-batch cost track the BATCH.
    */
  def ivfPqTopKIndexed(index: DataFrame, corpus: DataFrame,
                       centroids: DataFrame, codebook: DataFrame,
                       probeSet: DataFrame, k: Int, pool: Int, nprobe: Int,
                       m: Int, subDim: Int): DataFrame =
    ivfPqTopKParts(
      // subspace-0 slice = one (vec_id, cell) row per vector, no exchange
      index.filter(col("subspace") === 0).select("vec_id", "cell"),
      index.select("vec_id", "subspace", "code"),
      corpus, centroids, codebook, probeSet, k, pool, nprobe, m, subDim)

  /** [[ivfPqTopKIndexed]]'s core over pre-sliced index parts — the serve
    * path ([[graft.streaming.StreamAnn]]) materializes `res`/`codes` once
    * and hands the SAME DataFrames to every micro-batch, so per-batch work
    * is genuinely probe-side only.
    */
  def ivfPqTopKParts(res: DataFrame, codes: DataFrame, corpus: DataFrame,
                     centroids: DataFrame, codebook: DataFrame,
                     probeSet: DataFrame, k: Int, pool: Int, nprobe: Int,
                     m: Int, subDim: Int): DataFrame = {
    val probes = withUnit(probeSet, "embedding", "pu")
      .select(col("vec_id").as("p_id"), col("pu"))
    val pCells = ivfAssignTop(probeSet, centroids, nprobe)
      .select(col("vec_id").as("p_id"), col("cell"))
    val cu = withUnit(centroids, "embedding", "cu")
      .select(col("vec_id").as("cell"), col("cu"))
    // per-(probe, cell) constant <pu, ĉ> — nprobe·|probes| rows, broadcast
    val cellConst = pCells
      .join(broadcast(cu), "cell").join(broadcast(probes), "p_id")
      .select(col("p_id"), col("cell"), dot(col("pu"), col("cu")).as("cconst"))
    // ADC table: probe subvector × residual-codebook inner products
    val cb = codebook.select(col("subspace"), col("code"),
      col("embedding").cast("array<double>").as("ce"))
    val ptab = subVectorsOf(
        probes.select(col("p_id").as("vec_id"), col("pu").as("v")), m, subDim)
      .join(broadcast(cb), "subspace")
      .select(col("vec_id").as("p_id"), col("subspace"), col("code"),
        dot(col("sv"), col("ce")).as("pdot"))
    val perSub = (0 until m).map(j =>
      sum(when(col("subspace") === j, col("pdot"))).as(s"s$j"))
    val topk = udaf(new TopK(pool), Encoders.product[Scored])
    val cands = res.select(col("vec_id"), col("cell"))
      .join(broadcast(cellConst), Seq("cell")) // cell-bounded fan-out
      .filter(col("vec_id") =!= col("p_id"))
    val pooled = cands
      .join(codes, "vec_id")
      .join(broadcast(ptab), Seq("p_id", "subspace", "code"))
      .groupBy("p_id", "vec_id", "cconst")
      .agg(perSub.head, perSub.tail: _*)
      // fixed-order reduce: (cconst+s0)+s1+… — mirrored by the oracle
      .withColumn("adc",
        (Seq(col("cconst")) ++ (0 until m).map(j => col(s"s$j"))).reduce(_ + _))
      .groupBy("p_id")
      .agg(topk(col("adc"), col("vec_id")).as("top"))
      .select(col("p_id"), explode(col("top.id")).as("vec_id"))
    // exact rerank over the pooled candidates (bounded, broadcast back)
    val topkF = udaf(new TopK(k), Encoders.product[Scored])
    withUnit(corpus, "embedding", "u").select(col("vec_id"), col("u"))
      .join(broadcast(pooled), "vec_id")
      .join(broadcast(probes), "p_id")
      .withColumn("cos", dot(col("pu"), col("u")))
      .groupBy("p_id")
      .agg(topkF(col("cos"), col("vec_id")).as("top"))
      .select(col("p_id").as("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  def pqTopKReranked(corpus: DataFrame, codebook: DataFrame,
                     probeFilter: Column, k: Int, pool: Int,
                     m: Int, subDim: Int): DataFrame = {
    val cands = pqTopK(corpus, codebook, probeFilter, pool, m, subDim)
      .select(col("probe_id").as("p_id"), col("neighbor_id").as("vec_id"))
    val p = withUnit(corpus.filter(probeFilter), "embedding", "pu")
      .select(col("vec_id").as("p_id"), col("pu"))
    val topk = udaf(new TopK(k), Encoders.product[Scored])
    withUnit(corpus, "embedding", "u").select(col("vec_id"), col("u"))
      .join(broadcast(cands), "vec_id")
      .join(broadcast(p), "p_id")
      .withColumn("cos", dot(col("pu"), col("u")))
      .groupBy("p_id")
      .agg(topk(col("cos"), col("vec_id")).as("top"))
      .select(col("p_id").as("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
