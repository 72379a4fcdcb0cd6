package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** T24 — a TRAINED quality-classifier gate: the model-based filter tier
  * above heuristic rules (the CCNet/fastText practice — fit a cheap
  * linear model on labeled examples, deploy it as a one-pass scan
  * filter). Here the weak labels are the corpus' own Gopher-rule
  * verdicts (t21) — the standard bootstrap when no human labels exist —
  * and the features are the t1/t2/t21 statistics as FIXED-POINT integers
  * (scale 1e4, positive integer division, so both engines derive them
  * exactly).
  *
  * The fit is CLOSED-FORM ridge least squares (a linear probability
  * model): `w = (XᵀX + λI)⁻¹ Xᵀy`. Every entry of XᵀX/Xᵀy is a sum of
  * products of integer-valued features, with each FACTOR cast to
  * DECIMAL(38,0) before multiplying (ADVICE r16: an integer product
  * past Long range would wrap before any post-hoc cast) and the
  * products accumulated in DECIMAL(38,0) — exact at ANY corpus size
  * (headroom: per-row products ≤ 1e16·1e16 < 1e38 cannot wrap the
  * decimal, and sums stay under 1e38 to ~1e22 rows at the graded
  * feature scale) and therefore deterministic
  * across runs and partitionings regardless of aggregation order (the
  * reason the features are integers all the way down; the one double
  * rounding happens ONCE, converting each exact total on the driver).
  * Past `maxFitRows` (default 5e7) the fit additionally samples — a
  * pure COST lever now, not a correctness guard (the weights are a
  * k-vector; 1e7 rows estimate them as well as 1e12), deterministic
  * because the sample keys on a content hash, not on rand(); duplicated
  * row contents co-sample, which only reweights already-duplicated
  * mass and cannot break exactness (review r16). The k×k solve (k = 8)
  * runs on the driver via Gaussian
  * elimination with partial pivoting; weights quantize to 1e-6
  * fixed-point int64. Classification needs no sigmoid: with an LPM,
  * `p ≥ 0.5 ⟺ w·x ≥ 0.5`, so the gate is one INTEGER dot product
  * against one integer threshold — the oracle replays exactly that dot
  * from the staged weight table.
  *
  * Scale shape: the fit is ONE aggregation pass emitting k(k+3)/2 sums
  * (a few dozen numbers at any corpus size) + an O(k³) driver solve; the
  * score is a pure scan projection with the weights inlined as literals
  * — zero joins, zero shuffles, the t13/t21 one-pass posture.
  */
object QualityModel {

  /** Fixed-point scale of features and the intercept column. */
  val FeatScale = 10000L

  /** Weight quantization scale (1e-6 units). */
  val WScale = 1000000L

  /** keep ⟺ z ≥ Half. The fit consumes the ALREADY-SCALED integer
    * features, so its prediction is `ŷ = Σ w_true·x ∈ [0,1]` directly and
    * the quantized dot `z = Σ W_i·x_i = ŷ·WScale` carries only the weight
    * scale — the 0.5 probability threshold is WScale/2.
    */
  val Half: Long = WScale / 2

  /** Closed-form ridge LPM fit over integer-valued feature columns and a
    * 0/1 `labelCol`. ONE aggregation job in the common case — the row
    * count rides the moment aggregation, so an in-budget corpus never
    * pays a separate counting pass over the feature pipeline (review
    * r16); sums are DECIMAL(38,0)-exact at any scale, so the fit is
    * deterministic unconditionally (see object doc). Corpora past
    * `maxFitRows` re-aggregate once more on a deterministic 1-in-mod
    * content-hash sample — a cost lever (rows with identical
    * feature+label content co-sample; that only reweights
    * already-duplicated mass and cannot affect exactness).
    */
  def fitLpm(feats: DataFrame, featCols: Seq[String], labelCol: String,
             ridge: Double = 1e4, maxFitRows: Long = 50000000L): Array[Double] = {
    require(maxFitRows > 0, s"maxFitRows $maxFitRows must be positive")
    val k = featCols.length
    // index 0 is the row count; moments follow
    def moments(df: DataFrame): Row = {
      // cast each FACTOR to decimal(38,0) before multiplying — an integer
      // product past Long range would wrap BEFORE a post-hoc cast could
      // save it, silently breaking the exact-at-any-size guarantee
      // (ADVICE r16); a decimal×decimal product cannot wrap below 10^38
      def dec(c: String) = col(c).cast("decimal(38,0)")
      val aggs = count(lit(1)).as("n_rows") +:
        ((for {
          i <- 0 until k
          j <- i until k
        } yield sum(dec(featCols(i)) * dec(featCols(j)))
          .as(s"xx_${i}_$j")) ++
          (0 until k).map(i =>
            sum(dec(featCols(i)) * dec(labelCol))
              .as(s"xy_$i")))
      df.agg(aggs.head, aggs.tail: _*).collect()(0)
    }
    val full = moments(feats)
    val n = full.getLong(0)
    val row =
      if (n <= maxFitRows) full
      else {
        val mod = ((n + maxFitRows - 1) / maxFitRows).toInt
        moments(feats.filter(pmod(xxhash64(struct(
          (featCols :+ labelCol).map(col): _*)), lit(mod)) === 0))
      }
    // decimal sums are NULL (not zero) over an empty frame; an empty fit
    // degenerates to the pure-ridge solution w = 0
    def exact(idx: Int): Double =
      Option(row.getDecimal(idx + 1)).fold(0.0)(_.doubleValue())
    val a = Array.ofDim[Double](k, k + 1)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      val v = exact(idx)
      a(i)(j) = v
      a(j)(i) = v
      idx += 1
    }
    for (i <- 0 until k) {
      a(i)(i) += ridge
      a(i)(k) = exact(idx)
      idx += 1
    }
    solve(a, k)
  }

  /** In-place Gaussian elimination with partial pivoting on the k×(k+1)
    * augmented matrix — deterministic for a fixed input.
    */
  private def solve(a: Array[Array[Double]], k: Int): Array[Double] = {
    for (c <- 0 until k) {
      var p = c
      for (r <- c + 1 until k) if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r
      val t = a(c); a(c) = a(p); a(p) = t
      require(math.abs(a(c)(c)) > 0.0, s"singular normal matrix at column $c")
      for (r <- c + 1 until k) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c until k + 1) a(r)(j) -= f * a(c)(j)
      }
    }
    val w = new Array[Double](k)
    for (c <- k - 1 to 0 by -1) {
      var s = a(c)(k)
      for (j <- c + 1 until k) s -= a(c)(j) * w(j)
      w(c) = s / a(c)(c)
    }
    w
  }

  /** 1e-6 fixed-point quantization — the form the scoring dot uses. */
  def quantize(w: Array[Double]): Array[Long] =
    w.map(x => Math.round(x * WScale.toDouble))
}
