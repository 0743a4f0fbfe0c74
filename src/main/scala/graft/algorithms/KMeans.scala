package graft.algorithms

import graft.operators.Iteration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the analog of the reference's
  * replay-based kmeans (reference: examples/kmeans.rs: `replay` re-reads the
  * cached points each round while only the centroid state evolves).
  *
  * Spark-first: points are cached once; each round is one aggregation job
  * with the centroids broadcast (a few KB) — no shuffle of the points beyond
  * the partial/final aggregate of per-cluster sums. This is exactly the shape
  * that scales to 100 TB of vectors: the only reduced data is k × dim doubles
  * per partition.
  *
  * Deterministic: init = the k points with the lowest ids; assignment breaks
  * distance ties toward the lower cluster id (strict <). Centroids are
  * rounded to 6 decimals each round and the argmin compares 6-decimal
  * distances — this makes the whole trajectory independent of FP summation
  * order (partitioning, engine), so the result is reproducible and
  * oracle-checkable against a SQL re-implementation.
  */
object KMeans extends Serializable {

  /** Half-away-from-zero 6-decimal rounding of the exact binary double —
    * matches Spark's `round(x, 6)` and DuckDB's `round(x, 6)`. */
  private[graft] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Assignments plus the trained centroids (needed by IVF indexing). */
  final case class Model(assignments: DataFrame, centroids: Array[Array[Double]])

  /** Nearest-centroid argmin: round6-suppressed FP-order noise, ties to the
    * lower cluster. THE single definition of the assignment rule — IVF
    * append equivalence (IvfIndexSpec) depends on training-time and
    * append-time assignment sharing it exactly. */
  private[graft] def nearest(centroids: Array[Array[Double]])(
      vec: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val ctr = centroids(c)
      while (i < vec.length) { val t = vec(i) - ctr(i); d += t * t; i += 1 }
      val dr = round6(d) // suppress FP-order noise; ties → lower cluster
      if (dr < bestD) { bestD = dr; best = c }
      c += 1
    }
    best
  }

  /** df: (id: Long, vec: Array[Float|Double]).
    * Returns (id, cluster) assignments after `iterations` rounds. */
  def assign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame =
    assignWithCentroids(df, idCol, vecCol, k, iterations).assignments

  /** (id, vec) points dataset for training/labeling, null-safe, PERSISTED —
    * callers own the unpersist. `private[graft]` so Similarity's corpus-
    * adaptive sizing can count THIS dataset (the rows training actually
    * sees — raw-input counts include null id/vec rows prep drops, and a
    * separate raw count() is a full extra scan the cache already paid). */
  private[graft] def prep(df: DataFrame, idCol: String, vecCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df
      // null ids/vectors crash deep in the executor (non-nullable decoder /
      // NPE in nearest) — exclude them up front like the sibling curation
      // modules
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Long, Array[Double])]
      .persist()
  }

  /** Full model variant of [[assign]]. */
  def assignWithCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): Model = {
    val pts = prep(df, idCol, vecCol)
    try assignWithCentroidsPrepped(pts, k, iterations)
    finally pts.unpersist()
  }

  /** [[assignWithCentroids]] over an already-prepped (and persisted) points
    * dataset — the caller owns `pts`' lifecycle. Lets Similarity pay prep
    * once for sizing, training, and the pair join. */
  private[graft] def assignWithCentroidsPrepped(
      pts: org.apache.spark.sql.Dataset[(Long, Array[Double])], k: Int,
      iterations: Int): Model = {
    val spark = pts.sparkSession
    import spark.implicits._
    val finalCentroids = train(pts, k, iterations)

    val bc = spark.sparkContext.broadcast(finalCentroids)
    // materialize assignments before dropping the points cache — otherwise
    // every downstream action would recompute the scan + assignment pass
    val out = pts.map { case (id, v) => (id, nearest(bc.value)(v).toLong) }
      .toDF("id", "cluster")
      .persist()
    out.count()
    // executor copies freed eagerly (a long-lived session otherwise holds
    // every round's centroid blocks until ContextCleaner GC); unpersist,
    // not destroy — a re-fetch re-broadcasts if a cached block is ever
    // recomputed
    bc.unpersist()
    Model(out, finalCentroids)
  }

  /** [[assign]] over an already-prepped points dataset. */
  private[graft] def assignPrepped(
      pts: org.apache.spark.sql.Dataset[(Long, Array[Double])], k: Int,
      iterations: Int): DataFrame =
    assignWithCentroidsPrepped(pts, k, iterations).assignments

  /** Lloyd training only — no assignment materialization (assignTwoLevel
    * trains two codebooks and labels in ONE final pass; materializing an
    * assignment table per codebook would be two wasted full labeling
    * passes). `pts` must already be persisted (replay re-reads it every
    * round). */
  private def train(pts: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      k: Int, iterations: Int): Array[Array[Double]] = {
    val spark = pts.sparkSession
    import spark.implicits._

    val initCentroids: Array[Array[Double]] =
      pts.orderBy(col("id")).limit(k).collect().map(_._2)

    // the per-round shuffle reduces (#input partitions × k) partial rows —
    // grid-sized, never point-sized — so its width is sized from THAT, not
    // inherited from the session (AQE is off inside replay; at the session
    // width every round pays the full task-scheduling overhead for near-empty
    // partitions: measured 2.0 s → ~1 s at sf0.1 local[32])
    val reduceWidth = Iteration.sizedWidth(
      pts.rdd.getNumPartitions.toLong * math.max(k, 1))

    val finalCentroids = Iteration.withShuffleWidth(spark, Some(reduceWidth)) {
      Iteration.replay(pts, iterations, initCentroids) {
      (data, centroids) =>
        val bc = spark.sparkContext.broadcast(centroids)
        // per-cluster (sum vector, count) via typed partial aggregation
        val agg = data.mapPartitions { it =>
          val ctr = bc.value
          val sums = Array.fill(ctr.length)(new Array[Double](ctr.head.length))
          val counts = new Array[Long](ctr.length)
          it.foreach { case (_, v) =>
            val cI = nearest(ctr)(v)
            counts(cI) += 1
            val s = sums(cI)
            var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
          }
          Iterator.tabulate(ctr.length)(cI => (cI, sums(cI), counts(cI)))
        }.groupByKey(_._1)
          .reduceGroups { (a, b) =>
            val s = a._2.clone()
            var i = 0; while (i < s.length) { s(i) += b._2(i); i += 1 }
            (a._1, s, a._3 + b._3)
          }
          .map(_._2)
          .collect()
        bc.unpersist() // round is fully reduced; free the executor copies
        val next = centroids.clone()
        agg.foreach { case (cI, s, n) =>
          if (n > 0) next(cI) = s.map(x => round6(x / n))
        }
        next
      } { (_, _) => true }
    }
    finalCentroids
  }

  /** Two-level residual assignment: coarse k-means with kc = ⌈√k⌉
    * centroids, then a second k-means over the RESIDUALS (vec − its coarse
    * centroid) with kf = ⌈k/kc⌉ centroids; cluster = coarse·kf + fine.
    * Same contract as [[assign]] — a deterministic partition of the vector
    * space, identical vectors always share a label — but the per-point
    * assignment cost is kc+kf ≈ 2√k centroid distances instead of k. This
    * is the standard IVF answer once the cluster COUNT grows with the
    * corpus (Similarity.autoNlist): single-level assignment is n×k, i.e.
    * n²/clusterSize, and the round-14 100× sweep measured it as the
    * residual super-linear term of q_semantic_dedup after the pair stage
    * was linearized. Residuals are round6-snapped so the fine training and
    * the final labeling see bit-identical inputs regardless of plan. */
  def assignTwoLevel(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame = {
    // ONE point cache shared by both trainings and the final labeling —
    // no intermediate assignment table is ever materialized (both
    // codebooks are train-only; labels compose in the single pass below)
    val pts = prep(df, idCol, vecCol)
    try assignTwoLevelPrepped(pts, k, iterations)
    finally pts.unpersist()
  }

  /** Two-level assignments PLUS both codebooks. The IVF query side needs
    * the codebooks to select probe lists at the same ~2√k per-point cost
    * the assignment paid — recomputing "nearest cell" against k composed
    * centroids would reintroduce the n×k term [[assignTwoLevel]] exists to
    * remove. `cluster = coarse·kf + fine`, so a probe candidate's list id
    * is recomposable from the two codebook indices. */
  final case class TwoLevelModel(assignments: DataFrame,
      coarse: Array[Array[Double]], fine: Array[Array[Double]]) {
    def kf: Int = fine.length
  }

  /** [[assignTwoLevel]] over an already-prepped (persisted) points dataset —
    * the caller owns `pts`' lifecycle. */
  private[graft] def assignTwoLevelPrepped(
      pts: org.apache.spark.sql.Dataset[(Long, Array[Double])], k: Int,
      iterations: Int): DataFrame =
    assignTwoLevelPreppedModel(pts, k, iterations).assignments

  /** [[assignTwoLevelPrepped]], returning the codebooks too. */
  private[graft] def assignTwoLevelPreppedModel(
      pts: org.apache.spark.sql.Dataset[(Long, Array[Double])], k: Int,
      iterations: Int): TwoLevelModel = {
    val spark = pts.sparkSession
    import spark.implicits._
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kf = math.max(1, math.ceil(k.toDouble / kc).toInt)

    val bcC = spark.sparkContext.broadcast(train(pts, kc, iterations))

    def residOf(v: Array[Double]): (Int, Array[Double]) = {
      val c = nearest(bcC.value)(v)
      val ctr = bcC.value(c)
      val r = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { r(i) = round6(v(i) - ctr(i)); i += 1 }
      (c, r)
    }

    // persisted: the fine training replays the residuals every round, and
    // recomputing kc distances per point per round would re-pay the very
    // term this function removes
    // .toDF("id","vec").as[...]: train's init scan orders by col("id"), so
    // the tuple columns must carry the names, not _1/_2
    val resid = pts.map { case (id, v) => (id, residOf(v)._2) }
      .toDF("id", "vec").as[(Long, Array[Double])].persist()
    val bcF = spark.sparkContext.broadcast(train(resid, kf, iterations))

    val out = pts.map { case (id, v) =>
        val (c, r) = residOf(v)
        (id, c.toLong * kf + nearest(bcF.value)(r))
      }
      .toDF("id", "cluster")
      .persist()
    out.count()
    // labels are materialized; free the codebook executor copies eagerly
    // (unpersist, not destroy — cache recomputation can still re-fetch)
    val model = TwoLevelModel(out, bcC.value, bcF.value)
    bcC.unpersist()
    bcF.unpersist()
    resid.unpersist()
    model
  }
}
