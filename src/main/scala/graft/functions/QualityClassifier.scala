package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier: logistic regression by full-batch
  * gradient descent over cheap portable text features — the
  * CCNet/fastText-style "learn a filter from seed labels" step of a
  * training-data pipeline (heuristic gates like
  * [[TextAnalysis.qualityScore]] or [[QualityFilters]] produce the labels;
  * the classifier generalizes them into a smooth score the pipeline can
  * threshold, calibrate, or importance-weight by).
  *
  * Everything is deterministic and engine-portable so the whole training
  * trajectory is oracle-checkable: features and per-row sigmoids round to
  * 6 decimals, then enter the gradient as EXACT integer micro-units
  * (×10⁶ — the repo's micro-integer discipline): each gradient component
  * is a sum of (pᵢ−yᵢ)·xᵢ products of integers, summed as `decimal(38,0)`
  * — no double summation (order-dependent) and no fine-scale decimal cast
  * of raw doubles (Java shortest-repr rounding vs DuckDB binary rounding
  * diverge below ~1e-16 relative scale). Each weight update rounds to 6
  * decimals. Fixed iteration count, zero initialization — the same
  * unrolled-iteration discipline as the k-means oracle (q_kmeans).
  *
  * 100 TB shape: the feature projection is one narrow pass cached once;
  * each GD iteration is ONE partially-aggregated scan of it (d+1 decimal
  * sums — map-side combine, shuffle bytes = #partitions × (d+1) decimals);
  * the model is d+1 doubles riding the plan as literals; scoring is a
  * narrow map. Corpus-scale practice: train on a [[Sampling.hashSample]]
  * subset (GD needs thousands of rows, not 100 TB), then score everything —
  * the API takes the train and score frames separately to make that the
  * obvious call shape.
  *
  * Reference analog: the reference's iterative ML examples train by
  * replayed fixed-point iteration (reference/examples/logistic_regression
  * .rs); here each iteration is a Catalyst aggregate, the loop is
  * driver-side, and the state is the broadcast-literal weight vector.
  */
object QualityClassifier {

  /** Trained model: `weights(0)` is the bias; `weights(j)` pairs with
    * feature j-1 of [[features]]. */
  case class Model(weights: Seq[Double]) {
    require(weights.nonEmpty, "empty model")
  }

  /** The portable feature vector (each in [0,1], rounded to 6 decimals):
    * capped token count, punctuation ratio, English stopword ratio, capped
    * mean word length. Same fragments the profile/gopher oracles already
    * reproduce in SQL. */
  def features(text: Column): Seq[Column] = Seq(
    round(least(TextAnalysis.tokenCount(text), lit(1000L)).cast("double")
      / 1000.0, 6),
    round(TextAnalysis.punctRatio(text), 6),
    round(TextAnalysis.stopwordRatio(text, TextAnalysis.stopwordsEn), 6),
    round(least(TextAnalysis.meanWordLen(text), lit(20.0)) / 20.0, 6))

  /** round(sigmoid(w·x), 6) with the dot product accumulated left-to-right
    * (addition order is part of the contract — both engines evaluate the
    * identical expression tree). */
  private def sigmoid(w: Seq[Double], xs: Seq[Column]): Column = {
    val z = xs.zip(w.tail).foldLeft(lit(w.head): Column) {
      case (acc, (x, wj)) => acc + x * lit(wj)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Train by `iters` full-batch GD steps at learning rate `lr` from zero
    * weights. `label` must evaluate to 0.0/1.0. The input should already be
    * the training subset (hash-sampled at corpus scale). */
  def train(df: DataFrame, textCol: String, label: Column,
      iters: Int = 3, lr: Double = 0.5): Model = {
    require(iters >= 0 && lr > 0, s"bad iters=$iters lr=$lr")
    val xs = features(col(textCol))
    val d = xs.size
    val cols = (label.cast("double").as("y") +:
      xs.zipWithIndex.map { case (x, j) => x.as(s"x$j") })
    // doubles feed the sigmoid; exact ×10⁶ integers feed the gradient.
    // NULL text is excluded up front: its NULL features would drop out of
    // the gradient sums while count(1) still counted the row, silently
    // deflating every gradient component by nulls/n (and an all-null set
    // would NPE past the emptiness require below)
    val f = df.filter(col(textCol).isNotNull).select(cols: _*)
      .select((col("y") +: (0 until d).map(j => col(s"x$j"))) ++
        ((col("y") * 1e6).cast("long").as("yi") +:
         (0 until d).map(j =>
           round(col(s"x$j") * 1e6, 0).cast("long").as(s"xi$j"))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // an empty training set makes every aggregated gradient NULL and the
      // getDouble below would die with an opaque NPE — fail with a name
      require(iters == 0 || !f.isEmpty,
        "QualityClassifier.train: empty training set (did the sample/filter drop every row?)")
      var w = Vector.fill(d + 1)(0.0)
      for (_ <- 0 until iters) {
        val p = sigmoid(w, (0 until d).map(j => col(s"x$j")))
        val pi = round(p * lit(1e6), 0).cast("long")
        val n = count(lit(1)).cast("double")
        // integer products, exact decimal sums: the distributed gradient is
        // order-independent and bit-identical to the oracle's
        val gs = (lit(1000000L) +: (0 until d).map(j => col(s"xi$j"))).map {
          xij => sum(((pi - col("yi")) * xij).cast("decimal(38,0)"))
            .cast("double") / lit(1e12) / n
        }
        // the update is computed (and rounded) in SQL so the trajectory
        // matches the oracle's round() bit for bit
        val upd = w.zip(gs).zipWithIndex.map { case ((wj, g), j) =>
          round(lit(wj) - lit(lr) * g, 6).as(s"w$j") }
        val row = f.agg(upd.head, upd.tail: _*).head()
        w = Vector.tabulate(w.size)(row.getDouble)
      }
      Model(w)
    } finally { f.unpersist(); () }
  }

  /** Score a corpus with a trained model: (id, score, keep) where
    * score = round(sigmoid(w·x), 6) and keep = 1 iff score ≥ `threshold`.
    * One narrow map stage. */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model,
      threshold: Double = 0.5): DataFrame = {
    val s = sigmoid(model.weights, features(col(textCol)))
    df.select(col(idCol).cast("long").as("doc_id"), s.as("score"))
      .withColumn("keep", when(col("score") >= threshold, 1L).otherwise(0L))
  }
}
