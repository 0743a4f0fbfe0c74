package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.storage.StorageLevel

import scala.reflect.ClassTag

/** Iterative fixed-point computation — the analog of the reference's
  * iteration operators (reference: src/operator/iteration/):
  *
  *  - `iterate` (iterate.rs:363-545): a feedback edge in the dataflow graph,
  *    a singleton leader block folding per-round deltas into shared state and
  *    deciding continue/stop.
  *  - `replay` (replay.rs:256-358): the input is re-read each round, only the
  *    state evolves (kmeans, logistic regression).
  *  - `delta_iterate` (iterate_delta.rs:104-192): keyed incremental iteration
  *    over (solution set, workset).
  *
  * Spark-first design (SURVEY §3.3): the driver IS the leader block — a
  * driver-side loop over cached DataFrames with broadcast state. Per-round
  * caching bounds recomputation; `localCheckpoint` every `checkpointEvery`
  * rounds truncates the lineage so plans don't grow unboundedly (on a real
  * cluster, configure a checkpoint dir and reliable checkpoints instead).
  */
object Iteration {

  /** AQE re-plans every shuffle stage of every per-round job. For a
    * driver-loop iteration the round plans are shape-stable and each round
    * is its own small job, so the replan + extra stage-scheduling overhead
    * dominates: measured at sf0.1 local[32], a warm connected-components
    * round is ~0.17 s with AQE off vs ~1.9 s with it on (~10x). Every loop
    * in this object therefore runs with AQE disabled and restores the
    * previous setting on exit. Rounds whose joins are badly skewed at
    * cluster scale are the one case where AQE's skew-join splitting can be
    * worth the per-round overhead — opt back in with
    * `spark.conf.set("graft.iteration.adaptive", "true")`.
    *
    * The override is session-wide while the loop runs (Spark reads the conf
    * at execution), so concurrent queries on the same session observe it;
    * loops are driver-blocking, making that window explicit. */
  private[graft] def withLoopConf[A](spark: SparkSession)(f: => A): A = {
    val keepAqe = spark.conf.get("graft.iteration.adaptive", "false").toBoolean
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if (!keepAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally if (!keepAqe) spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Scoped `spark.sql.shuffle.partitions` override for driver loops. With
    * AQE off inside iterations (see [[withLoopConf]]) nothing coalesces the
    * per-round shuffles, so a loop over a small dataset inherits the
    * session-wide width and pays it in pure task-scheduling overhead every
    * round — measured at sf0.1 local[32]: connected components 7.5 s at
    * width 32 vs ~0.5 s at width 1 for the same rounds. Callers size the
    * width from their input (see [[sizedWidth]]) or pass it through. */
  private[graft] def withShuffleWidth[A](spark: SparkSession,
      parallelism: Option[Int])(f: => A): A = parallelism match {
    case None => f
    case Some(p) =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try f
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Shuffle width for `rows` rows of loop state: ≈64k rows per partition,
    * floor 1, capped — a billion-row state still gets ~15k partitions, a
    * bench-sized graph gets 1 instead of the session default. */
  private[graft] def sizedWidth(rows: Long, perPartition: Long = 65536L,
      cap: Int = 1 << 14): Int =
    math.max(1L, rows / perPartition).min(cap.toLong).toInt

  /** GRAFT_ITER_DEBUG=1 prints per-round timings to stderr. */
  private val debug = sys.env.contains("GRAFT_ITER_DEBUG")
  private def logRound(tag: String, i: Int, t0: Long): Unit =
    if (debug) System.err.println(
      f"[iter] $tag round=$i ${(System.nanoTime() - t0) / 1e9}%.2fs")

  /** Generic dataset fixpoint: evolve `ds` through `step` until `converged`
    * or `maxIter`. Handles caching + lineage truncation. The convergence
    * check receives (previous, next) — typically a count of changed rows
    * (one extra job per round, like the reference's leader fold).
    * When `materialize` is false, the `converged` callback is trusted to run
    * an action on `next` (e.g. an aggregate) — one job per round instead of
    * two. */
  def loop[T](init: Dataset[T], maxIter: Int, checkpointEvery: Int = 5,
      materialize: Boolean = true)(
      step: (Dataset[T], Int) => Dataset[T])(
      converged: (Dataset[T], Dataset[T]) => Boolean): Dataset[T] =
    withLoopConf(init.sparkSession) {
      // respect a caller-managed cache (the replay guard): persisting an
      // already-cached init is a no-op, but round 1's unpersist would then
      // DROP the caller's cache (incl. SharedCacheHandle caches shared
      // with sibling streams) — every later reuse silently recomputes
      val initCached = init.storageLevel != StorageLevel.NONE
      var cur = if (initCached) init else init.persist(StorageLevel.MEMORY_AND_DISK)
      if (materialize) cur.count()
      var curOwned = !initCached
      var i = 0
      var done = false
      while (i < maxIter && !done) {
        val t0 = System.nanoTime()
        // checkpoint OR persist, never both (the deltaIterate discipline):
        // localCheckpoint already stores the rows as RDD blocks — a second
        // Dataset-layer cache would hold a full duplicate copy
        val next =
          if ((i + 1) % checkpointEvery == 0) step(cur, i).localCheckpoint(false)
          else step(cur, i).persist(StorageLevel.MEMORY_AND_DISK)
        if (materialize) next.count()
        done = converged(cur, next)
        if (curOwned) cur.unpersist(false)
        curOwned = true
        cur = next
        i += 1
        logRound("loop", i, t0)
      }
      cur
    }

  /** Fixpoint driven by row-count stability: the materializing count() IS
    * the convergence check — exactly one job per round. Correct whenever
    * `step` is monotone (rows only ever get added, e.g. closure growth). */
  def loopFixpointByCount[T](init: Dataset[T], maxIter: Int,
      checkpointEvery: Int = 5)(
      step: (Dataset[T], Int) => Dataset[T]): Dataset[T] =
    withLoopConf(init.sparkSession) {
      // same caller-cache guard + checkpoint-OR-persist as loop (above)
      val initCached = init.storageLevel != StorageLevel.NONE
      var cur = if (initCached) init else init.persist(StorageLevel.MEMORY_AND_DISK)
      var prevCount = cur.count()
      var curOwned = !initCached
      var i = 0
      var done = false
      while (i < maxIter && !done) {
        val t0 = System.nanoTime()
        val next =
          if ((i + 1) % checkpointEvery == 0) step(cur, i).localCheckpoint(false)
          else step(cur, i).persist(StorageLevel.MEMORY_AND_DISK)
        val c = next.count()
        done = c == prevCount
        prevCount = c
        if (curOwned) cur.unpersist(false)
        curOwned = true
        cur = next
        i += 1
        logRound("fixpoint", i, t0)
      }
      cur
    }

  /** replay: recompute state from the (cached) input each round.
    * `round` returns the new state; `cond(old, new)` continues while true. */
  def replay[T, S](input: Dataset[T], maxIter: Int, init: S)(
      round: (Dataset[T], S) => S)(cond: (S, S) => Boolean): S =
    withLoopConf(input.sparkSession) {
      // respect a caller-managed cache: persisting twice would double the
      // memory and cost one wasted materialization job
      val alreadyCached = input.storageLevel != StorageLevel.NONE
      val cached =
        if (alreadyCached) input else input.persist(StorageLevel.MEMORY_AND_DISK)
      if (!alreadyCached) cached.count()
      var state = init
      var i = 0
      var go = true
      while (i < maxIter && go) {
        val next = round(cached, state)
        go = cond(state, next)
        state = next
        i += 1
      }
      if (!alreadyCached) cached.unpersist(false)
      state
    }

  /** Result of [[deltaIterate]]: the per-key outputs plus the per-round
    * workset sizes (number of keys that received a delta), the delta
    * iteration's defining telemetry — a healthy run shows it shrinking. */
  final case class DeltaResult[KO](output: Dataset[KO], worksetSizes: Seq[Long])

  /** Workset/solution-set incremental iteration — the reference's
    * `delta_iterate` (reference: src/operator/iteration/iterate_delta.rs:104-192):
    * a keyed solution set evolves in place; each round only the keys that
    * received a delta run `processDelta` and emit an update into `body`,
    * which computes the next round's deltas; the loop stops when no delta
    * satisfies `condition` (the reference's `TerminationCond`) or after
    * `maxIter` rounds. As in the reference, `condition` gates TERMINATION,
    * not delivery: a key stays in the workset as long as it receives any
    * delta rows — keys leave the workset when upstream stops sending to
    * them, not when their deltas go sub-threshold. Note that when NO delta
    * of a round satisfies `condition`, the loop stops and that terminating
    * round's deltas are DISCARDED unapplied (the reference's last_iteration
    * behavior) — callers with eps > 0 should fold that into their epsilon.
    *
    * Spark-first shape: the solution set lives as a hash-partitioned pair
    * RDD that NEVER re-shuffles — each round is a partitioner-aware
    * `cogroup` (narrow on the solution side), so the only shuffled data is
    * the workset itself, which shrinks as keys quiesce. This is the one
    * operator family where dropping below the Dataset API is justified:
    * Catalyst has no notion of a stable cross-job partitioning, and at
    * 100 TB re-shuffling the solution set every round IS the bottleneck.
    * `body` still receives a Dataset, so the per-round logic stays
    * declarative/Catalyst-planned.
    *
    * Divergences from the reference (documented, semantics-preserving):
    * `processDelta` folds all of a key's deltas functionally instead of
    * mutating in place; delta arrival order within a key is unspecified in
    * both engines, so the fold should be commutative (the reference has the
    * same network nondeterminism). Two jobs per round: one count on the
    * (small) deltas for termination, one materializing the merged solution.
    */
  def deltaIterate[K: ClassTag, S: ClassTag, U: ClassTag, D: ClassTag, O: ClassTag](
      solution: Dataset[(K, S)], maxIter: Int,
      numPartitions: Option[Int] = None, checkpointEvery: Int = 5)(
      processDelta: (K, S, Iterator[D]) => S)(
      makeUpdate: (K, S) => U)(
      makeOutput: (K, S) => O)(
      condition: D => Boolean)(
      body: Dataset[(K, U)] => Dataset[(K, D)])(
      implicit kuEnc: Encoder[(K, U)], koEnc: Encoder[(K, O)]): DeltaResult[(K, O)] =
    withLoopConf(solution.sparkSession) {
    val spark = solution.sparkSession
    val part = new HashPartitioner(
      numPartitions.getOrElse(math.max(solution.rdd.getNumPartitions, 1)))

    var sol: RDD[(K, S)] = solution.rdd.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sol.count()
    // round 0: every key is in the workset (the reference's Msg::Init pass)
    var updates: RDD[(K, U)] = sol.mapPartitions(
      _.map { case (k, s) => (k, makeUpdate(k, s)) }, preservesPartitioning = true)
    val worksets = scala.collection.mutable.ArrayBuffer.empty[Long]

    var i = 0
    var done = false
    var prevMerged: RDD[_] = null
    var prevCheckpointed = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      val deltas = body(spark.createDataset(updates)).rdd
        .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      val changed = deltas.filter { case (_, d) => condition(d) }.count()
      if (changed == 0) { done = true; deltas.unpersist(false) }
      else {
        val merged = sol.cogroup(deltas, part).mapPartitions(_.map {
          case (k, (ss, ds)) =>
            // a key can appear delta-only if body emits unseen keys; the
            // reference folds onto Default::default() — we require the key
            // to exist (solution sets are closed over their key domain).
            // Named error: a bare NoSuchElementException from ss.head would
            // surface as an inscrutable stage failure at scale.
            require(ss.nonEmpty,
              s"deltaIterate: delta for unknown key $k — the solution set is " +
                "closed over its key domain; body must not emit new keys")
            val s = ss.head
            if (ds.isEmpty) (k, (s, false))
            else (k, (processDelta(k, s, ds.iterator), true))
        }, preservesPartitioning = true)
        val checkpointed = (i + 1) % checkpointEvery == 0
        val persisted =
          if (checkpointed) { merged.localCheckpoint(); merged }
          else merged.persist(StorageLevel.MEMORY_AND_DISK)
        val wk = persisted.filter(_._2._2).count() // materializes too
        worksets += wk
        updates = persisted.mapPartitions(
          _.collect { case (k, (s, true)) => (k, makeUpdate(k, s)) },
          preservesPartitioning = true)
        sol.unpersist(false)
        // NEVER unpersist a locally-checkpointed RDD while descendants may
        // still need it — its blocks are the only copy (lineage truncated);
        // dropping the reference lets the ContextCleaner reclaim it safely
        if (prevMerged != null && !prevCheckpointed) prevMerged.unpersist(false)
        prevMerged = persisted
        prevCheckpointed = checkpointed
        sol = persisted.mapPartitions(
          _.map { case (k, (s, _)) => (k, s) }, preservesPartitioning = true)
        deltas.unpersist(false)
      }
      i += 1
      logRound("delta", i, t0)
    }
    val out = spark.createDataset(
      sol.mapPartitions(_.map { case (k, s) => (k, makeOutput(k, s)) },
        preservesPartitioning = true))
    DeltaResult(out, worksets.toSeq)
    }

  /** iterate: evolve BOTH a dataset and a state; the state is folded from
    * the round's output (the reference's leader global_fold) and the loop
    * stops when `cond(newState)` is false. Returns (state, final dataset) —
    * the reference's two output streams (iterate.rs:371-374). */
  def iterate[T, S](input: Dataset[T], maxIter: Int, init: S,
      checkpointEvery: Int = 5)(
      body: (Dataset[T], S) => Dataset[T])(
      foldState: (Dataset[T], S) => S)(
      cond: S => Boolean): (S, Dataset[T]) =
    withLoopConf(input.sparkSession) {
      // same caller-cache guard + checkpoint-OR-persist as loop (above)
      val initCached = input.storageLevel != StorageLevel.NONE
      var cur =
        if (initCached) input else input.persist(StorageLevel.MEMORY_AND_DISK)
      cur.count()
      var curOwned = !initCached
      var state = init
      var i = 0
      var go = true
      while (i < maxIter && go) {
        val next =
          if ((i + 1) % checkpointEvery == 0) body(cur, state).localCheckpoint(false)
          else body(cur, state).persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        state = foldState(next, state)
        go = cond(state)
        if (curOwned) cur.unpersist(false)
        curOwned = true
        cur = next
        i += 1
      }
      (state, cur)
    }
}
