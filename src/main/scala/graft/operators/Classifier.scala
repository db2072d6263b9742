package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Trained quality classifier — the learned counterpart of the qt02
  * heuristic battery. Real curation pipelines filter with a CHEAP
  * TRAINED model (a linear classifier over hashed text features)
  * distilled from an expensive teacher (an LM judge, a slow heuristic
  * stack, human labels); this implements that shape natively on Spark:
  * hashed bag-of-words featurization (zero-vocabulary, zero-shuffle),
  * distributed batch-gradient logistic regression whose per-dimension
  * gradient sums are DECIMAL-exact (order-independent across any
  * partitioning — the same discipline as graft.functions.Exact), and a
  * codegen-friendly scorer.
  *
  * Scale posture at 100 TB: featurization is a narrow per-row map (no
  * shuffle, no vocabulary build/broadcast — compare qt09's corpus-wide
  * vocab pass); each training iteration is ONE distributed pass
  * (posexplode to (dim, contribution) + a (d+1)-group partial agg) over
  * a frame the caller caches once, with d+1 driver-side doubles as the
  * only model state; scoring is a per-row dot product. Batch GD is the
  * honest distributed algorithm here — iterations cost full passes, so
  * `iters` is the explicit knob, and d stays small by construction
  * (hashing trick).
  *
  * Reference scope: rahil911/snowflake-azure-etl has no ML surface;
  * this is part of the training-data-pipeline extension battery
  * (SURVEY.md LLM-pipeline section).
  */
object Classifier {

  /** Driver-side model state: weights(0) is the intercept (feature 0 is
    * the constant 1 prepended by [[featurizeText]]/[[withIntercept]]).
    */
  final case class LinearModel(weights: Array[Double]) {
    def dims: Int = weights.length
  }

  /** Hashed-TF + document-statistics featurization. Output keeps
    * `idCol` plus any `passThrough` columns and adds
    * `x: array<double>` of length `6 + dims`:
    *
    *   x(0) = 1 (intercept), x(1) = n_words / 40.0, x(2) = x(1)²,
    *   x(3) = distinct_ratio, x(4) = x(1)·x(3),
    *   x(5) = en-stopword ratio,
    *   x(6..) = hashed term frequencies (count / n_words) over `dims`
    *            buckets of the engine-portable polyhash.
    *
    * The quadratic and interaction terms matter: real quality targets
    * are BANDS (too short is bad, too repetitive-because-long is bad),
    * which no linear function of the raw stats can carve — with x(1)²
    * and x(1)·x(3) the band is a halfspace in feature space, the
    * standard kernel-by-feature-map trick.
    *
    * Entirely row-local: the hash array is computed once per row and
    * bucket counts come from array filters — no explode, no shuffle,
    * no vocabulary (the same zero-shuffle argument as winnow). TF
    * normalization makes scale-free features; the explicit length
    * feature restores the signal normalization removes.
    */
  def featurizeText(df: DataFrame, idCol: String, textCol: String,
                    dims: Int = 64,
                    passThrough: Seq[String] = Nil): DataFrame = {
    val d = df
      .withColumn("__ws", expr(Text.wordsExpr(textCol)))
      .withColumn("__nw", greatest(size(col("__ws")), lit(1)).cast("double"))
      .withColumn("__hs",
        transform(col("__ws"), w => pmod(Text.polyhash(w), lit(dims.toLong))))
    val tf = transform(
      sequence(lit(0L), lit(dims.toLong - 1)),
      b => size(filter(col("__hs"), h => h === b)).cast("double") / col("__nw"))
    val nw40 = size(col("__ws")).cast("double") / lit(40.0)
    val dr = size(array_distinct(col("__ws"))).cast("double") / col("__nw")
    val stats = array(
      lit(1.0), nw40, nw40 * nw40, dr, nw40 * dr,
      expr(Text.stopwordCountExpr("__ws", "en")).cast("double") / col("__nw"))
    d.select((col(idCol) +: passThrough.map(col) :+
      concat(stats, tf).as("x")): _*)
  }

  /** Distributed batch-gradient logistic regression on a featurized
    * frame (`xCol: array<double>` with x(0) the intercept feature,
    * `labelCol` in {0, 1}). One Spark job per iteration; the
    * per-dimension gradient Σ (σ(w·x) − y)·x_j accumulates as
    * DECIMAL(38,18) so the result is independent of partitioning and
    * task order (float sums are not), making training bit-reproducible
    * run-to-run — the property the verdict gates rely on. L2 skips the
    * intercept, per convention.
    *
    * Callers should localCheckpoint/cache the input: every iteration
    * re-reads it.
    *
    * Heavy-ball momentum (`mu`) because plain batch GD needs hundreds
    * of passes on ill-conditioned text features and EVERY pass is a
    * distributed job — momentum cuts the pass count ~5× for free
    * (driver-side velocity state only), which at 100 TB is the
    * difference between 40 scans and 200.
    */
  def trainLogistic(feats: DataFrame, xCol: String, labelCol: String,
                    iters: Int = 40, lr: Double = 1.0,
                    l2: Double = 0.0, mu: Double = 0.9): LinearModel = {
    val base = feats.select(
      col(xCol).cast("array<double>").as("x"),
      col(labelCol).cast("double").as("y"))
    val d = base.select(size(col("x"))).head().getInt(0)
    val n = base.count().toDouble
    require(n > 0, "trainLogistic: empty training frame")
    val w = Array.fill(d)(0.0)
    val v = Array.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit).toIndexedSeq: _*)
      val margin = aggregate(
        zip_with(col("x"), wLit, (a, b) => a * b), lit(0.0), (a, c) => a + c)
      val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
      val grads = base
        .select(resid.as("r"), posexplode(col("x")).as(Seq("j", "xj")))
        .groupBy("j")
        .agg(sum((col("r") * col("xj")).cast("decimal(38,18)")).as("g"))
        .collect() // d+1 rows: bounded driver-side model state
      grads.foreach { row =>
        val j = row.getInt(0)
        val g = row.getDecimal(1).doubleValue() / n
        val reg = if (j == 0) 0.0 else l2 * w(j)
        v(j) = mu * v(j) + g + reg
        w(j) -= lr * v(j)
      }
    }
    LinearModel(w)
  }

  /** Newton/IRLS trainer — the gate path. Logistic regression's MLE is
    * reachable in single-digit FULL PASSES with second-order steps
    * (quadratic convergence), where first-order GD needs hundreds; at
    * 100 TB passes are the whole cost, so trading O(d²)-per-row work
    * for a ~20× pass reduction is the right side of the bargain for
    * compact feature maps (d ≲ a few hundred — use [[trainLogistic]]
    * beyond that, where the d² Hessian row-work would dominate).
    *
    * Each iteration is two distributed aggregations with decimal-exact
    * sums (order-independent, so training stays bit-reproducible):
    * the gradient Σ (y−p)·x_j and the upper-triangle Hessian
    * Σ p(1−p)·x_j·x_k, both tiny driver-side results (d and d(d+1)/2
    * rows). The Newton system solves on the driver with partial-pivot
    * Gaussian elimination; `ridge` (+ the L2 term) keeps the step
    * bounded when classes are separable (the MLE diverges otherwise —
    * the standard damping).
    */
  def trainLogisticNewton(feats: DataFrame, xCol: String, labelCol: String,
                          iters: Int = 6, l2: Double = 1e-3,
                          ridge: Double = 1e-6): LinearModel = {
    val base = feats.select(
      col(xCol).cast("array<double>").as("x"),
      col(labelCol).cast("double").as("y"))
    val d = base.select(size(col("x"))).head().getInt(0)
    val n = base.count().toDouble
    require(n > 0, "trainLogisticNewton: empty training frame")
    val w = Array.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit).toIndexedSeq: _*)
      val margin = aggregate(
        zip_with(col("x"), wLit, (a, b) => a * b), lit(0.0), (a, c) => a + c)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val scored = base.select(col("x"),
        (col("y") - p).as("r"), (p * (lit(1.0) - p)).as("s"))
      val e1 = scored.select(col("x"), col("r"), col("s"),
        posexplode(col("x")).as(Seq("j", "xj")))
      val grad = Array.fill(d)(0.0)
      e1.groupBy("j")
        .agg(sum((col("r") * col("xj")).cast("decimal(38,18)")).as("g"))
        .collect()
        .foreach(row => grad(row.getInt(0)) =
          row.getDecimal(1).doubleValue() / n)
      val hess = Array.fill(d, d)(0.0)
      e1.select(col("s"), col("j"), col("xj"),
          posexplode(col("x")).as(Seq("k", "xk")))
        .filter(col("k") >= col("j"))
        .groupBy("j", "k")
        .agg(sum((col("s") * col("xj") * col("xk")).cast("decimal(38,18)"))
          .as("h"))
        .collect()
        .foreach { row =>
          val v = row.getDecimal(2).doubleValue() / n
          hess(row.getInt(0))(row.getInt(1)) = v
          hess(row.getInt(1))(row.getInt(0)) = v
        }
      // L2 on the objective (skipping the intercept) + ridge damping
      for (j <- 1 until d) { grad(j) -= l2 * w(j); hess(j)(j) += l2 }
      for (j <- 0 until d) hess(j)(j) += ridge
      val delta = solve(hess, grad)
      for (j <- 0 until d) w(j) += delta(j)
    }
    LinearModel(w)
  }

  /** Partial-pivot Gaussian elimination (driver-side, d ≤ a few
    * hundred). Deterministic given deterministic inputs.
    */
  private def solve(a0: Array[Array[Double]],
                    b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until d) {
      var piv = c
      for (r <- c + 1 until d) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      if (piv != c) {
        val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb
      }
      val pv = a(c)(c)
      require(math.abs(pv) > 1e-300, s"singular Newton system at column $c")
      for (r <- c + 1 until d) {
        val f = a(r)(c) / pv
        if (f != 0.0) {
          for (k <- c until d) a(r)(k) -= f * a(c)(k)
          b(r) -= f * b(c)
        }
      }
    }
    val x = Array.fill(d)(0.0)
    for (r <- d - 1 to 0 by -1) {
      var s = b(r)
      for (k <- r + 1 until d) s -= a(r)(k) * x(k)
      x(r) = s / a(r)(r)
    }
    x
  }

  /** Score a featurized frame: margin (w·x) and the 0/1 prediction.
    * A narrow per-row map — broadcastable model, no shuffle.
    */
  def predict(feats: DataFrame, model: LinearModel, idCol: String,
              xCol: String = "x",
              passThrough: Seq[String] = Nil): DataFrame = {
    val wLit = array(model.weights.map(lit).toIndexedSeq: _*)
    val margin = aggregate(
      zip_with(col(xCol), wLit, (a, b) => a * b), lit(0.0), (a, c) => a + c)
    feats.select((col(idCol) +: passThrough.map(col) :+
      margin.as("margin") :+
      (margin > 0).cast("long").as("pred")): _*)
  }
}
