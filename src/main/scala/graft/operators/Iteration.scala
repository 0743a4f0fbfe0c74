package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

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
      converged: (Dataset[T], Dataset[T]) => Boolean): Dataset[T] = {
    var cur = init.persist(StorageLevel.MEMORY_AND_DISK)
    if (materialize) cur.count()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      var next = step(cur, i)
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint(false)
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      if (materialize) next.count()
      done = converged(cur, next)
      cur.unpersist(false)
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
      step: (Dataset[T], Int) => Dataset[T]): Dataset[T] = {
    var cur = init.persist(StorageLevel.MEMORY_AND_DISK)
    var prevCount = cur.count()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      var next = step(cur, i)
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint(false)
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      val c = next.count()
      done = c == prevCount
      prevCount = c
      cur.unpersist(false)
      cur = next
      i += 1
      logRound("fixpoint", i, t0)
    }
    cur
  }

  /** replay: recompute state from the (cached) input each round.
    * `round` returns the new state; `cond(old, new)` continues while true. */
  def replay[T, S](input: Dataset[T], maxIter: Int, init: S)(
      round: (Dataset[T], S) => S)(cond: (S, S) => Boolean): S = {
    val cached = input.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    var state = init
    var i = 0
    var go = true
    while (i < maxIter && go) {
      val next = round(cached, state)
      go = cond(state, next)
      state = next
      i += 1
    }
    cached.unpersist(false)
    state
  }

  /** iterate: evolve BOTH a dataset and a state; the state is folded from
    * the round's output (the reference's leader global_fold) and the loop
    * stops when `cond(newState)` is false. Returns (state, final dataset) —
    * the reference's two output streams (iterate.rs:371-374). */
  def iterate[T, S](input: Dataset[T], maxIter: Int, init: S,
      checkpointEvery: Int = 5)(
      body: (Dataset[T], S) => Dataset[T])(
      foldState: (Dataset[T], S) => S)(
      cond: S => Boolean): (S, Dataset[T]) = {
    var cur = input.persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var state = init
    var i = 0
    var go = true
    while (i < maxIter && go) {
      var next = body(cur, state)
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint(false)
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      state = foldState(next, state)
      go = cond(state)
      cur.unpersist(false)
      cur = next
      i += 1
    }
    (state, cur)
  }
}
