package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming lowering of the reference's streaming surface.
  *
  * Mapping (SURVEY §2.9):
  *  - `add_timestamps(ts_gen, wm_gen)` → an event-time column +
  *    `withWatermark`: Spark derives watermarks as max(ts) − delay instead of
  *    user-programmed emission (reference: src/operator/add_timestamps.rs).
  *  - watermark frontier min-merge across replicas
  *    (reference: src/operator/start/watermark_frontier.rs:45-62) → Spark's
  *    global min across partitions, built in.
  *  - LATE-DATA DIVERGENCE: the reference hard-errors on elements at or
  *    before the watermark (tests/utils.rs:30-100); Spark DROPS them. Tests
  *    pin this behavior.
  *  - event-time windows → `groupBy(window(...))`; sessions →
  *    `session_window`; count/transaction windows (no SQL form) →
  *    `flatMapGroupsWithState` state machines below.
  */
object Streaming {

  /** Event-time + watermark (reference `add_timestamps`): `delay` is the
    * allowed out-of-orderness. */
  def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Tumbling event-time aggregation on a stream — append mode emits each
    * window once, when the watermark passes its end. */
  def tumblingCounts(df: DataFrame, tsCol: String, size: String,
      keys: Column*): DataFrame =
    df.groupBy((window(col(tsCol), size) +: keys): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("w_start") +: col("n") +: keys): _*)

  /** Session windows with gap on a stream. */
  def sessionCounts(df: DataFrame, tsCol: String, gap: String,
      keys: Column*): DataFrame =
    df.groupBy((session_window(col(tsCol), gap) +: keys): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("session_window.start").as("w_start") +: col("n") +: keys): _*)

  /** Stream-stream interval join (reference interval_join,
    * src/operator/interval_join.rs): right.ts ∈ [left.ts − lower,
    * left.ts + upper]; both sides need watermarks for state cleanup.
    * Each joined pair is stamped with `pair_ts = max(left.ts, right.ts)` —
    * the reference's output timestamp (interval_join.rs:113-120) — so a
    * downstream window op consumes the join output directly. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCond: Column,
      leftTs: Column, rightTs: Column, lower: String, upper: String): DataFrame =
    left.join(right, keyCond
      && rightTs >= leftTs - expr(s"INTERVAL $lower")
      && rightTs <= leftTs + expr(s"INTERVAL $upper"))
      .withColumn("pair_ts", greatest(leftTs, rightTs))

  /** Streaming CountWindow.tumbling(size) per key (reference descr/count.rs
    * on unbounded keys — SURVEY §7.4 names this as the
    * flatMapGroupsWithState case): buffers up to `size` elements per key,
    * emits the aggregate when the window fills. Partial windows are held in
    * state (emitted only by the `exact=false` variant on timeout). */
  def countTumbling[K, V, O](ds: Dataset[(K, V)], size: Int)(agg: Seq[V] => O)(
      implicit ek: Encoder[K], ev: Encoder[Seq[V]], eo: Encoder[(K, O)],
      ekv: Encoder[(K, V)]): Dataset[(K, O)] =
    countTumblingImpl(ds, size, identity[Seq[V]])(agg)

  /** ONE window state machine for both count-window variants (the shared-
    * helper discipline: a buffer/emit fix must not have a twin to miss).
    * `sortBatch` is identity for arrival order, a sort for the ordered
    * variant. Fails fast on size <= 0 — the batch CountWindow's guard:
    * an unfillable window would otherwise grow per-key state forever
    * while emitting nothing. */
  private def countTumblingImpl[K, V, O](ds: Dataset[(K, V)], size: Int,
      sortBatch: Seq[V] => Seq[V])(agg: Seq[V] => O)(
      implicit ek: Encoder[K], ev: Encoder[Seq[V]], eo: Encoder[(K, O)],
      ekv: Encoder[(K, V)]): Dataset[(K, O)] = {
    require(size > 0, s"count window needs size > 0, got $size")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[V], (K, O)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[Seq[V]]) =>
          // mutable buffer within the batch: appending to an immutable Seq
          // per element is O(n²) on large windows
          val buf = scala.collection.mutable.ArrayBuffer.empty[V]
          buf ++= state.getOption.getOrElse(Seq.empty[V])
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, O)]
          sortBatch(rows.map(_._2).toVector).foreach { v =>
            buf += v
            if (buf.size == size) { out += ((key, agg(buf.toSeq))); buf.clear() }
          }
          state.update(buf.toSeq)
          out.iterator
      }
  }

  /** [[countTumbling]] with a per-batch ORDER: each micro-batch's rows for
    * a key are sorted by `order` before they fold into the running window
    * buffer, so window membership is deterministic under Spark's arbitrary
    * within-batch row order. The cross-batch contract matches the other
    * state machines here (funnel/sessionize): batches arrive key-ascending
    * in `order` (the log-ingestion case — runStream's ts-range split
    * satisfies it since event time is monotone in the order key). State is
    * the (size-bounded) open window buffer per key; complete windows emit,
    * the trailing partial stays buffered — the batch CountWindow
    * `exact=true` semantics (reference: descr/count.rs:99-137). */
  def countTumblingOrdered[K, V, B, O](ds: Dataset[(K, V)], size: Int,
      order: V => B)(agg: Seq[V] => O)(implicit ob: Ordering[B],
      ek: Encoder[K], ev: Encoder[Seq[V]], eo: Encoder[(K, O)],
      ekv: Encoder[(K, V)]): Dataset[(K, O)] =
    countTumblingImpl(ds, size, (vs: Seq[V]) => vs.sortBy(order))(agg)

  /** Per-user funnel progress ((t1, t2, t3, stage) after every update) —
    * the streaming twin of the batch ordered funnel (Queries.q_funnel):
    * first `stages(0)`, then the first `stages(1)` at-or-after it, then the
    * first `stages(2)` at-or-after that.
    *
    * State is O(1) per user (the three stage timestamps + an event count);
    * the sequential gating is replayed by folding each micro-batch's events
    * in timestamp order. Contract: per-user event-time order across
    * micro-batches (the log-ingestion case) — a retroactively EARLIER
    * stage-1 event would need the full event history to re-derive later
    * stages, which is exactly the batch query's job. `n_events` in the
    * output makes the latest row per user identifiable in an update sink.
    *
    * Input tuples: (user, event_type, ts). Output: (user, n_events, t1,
    * t2, t3, stage) with -1 sentinels. */
  def funnelStream(ds: Dataset[(Long, String, Long)],
      stages: (String, String, String)): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.Encoders
    implicit val eState: Encoder[(Long, Long, Long, Long)] =
      Encoders.product[(Long, Long, Long, Long)]
    implicit val eOut: Encoder[(Long, Long, Long, Long, Long, Long)] =
      Encoders.product[(Long, Long, Long, Long, Long, Long)]
    implicit val eKey: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long), (Long, Long, Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          var (n, t1, t2, t3) = state.getOption.getOrElse((0L, -1L, -1L, -1L))
          // equal-ts tie-break by stage order (view < click < purchase):
          // the batch oracle's whole-partition conditional mins are
          // inclusive at equal timestamps (a click AT t1 counts for t2),
          // so an equal-ts pair must process earlier-stage-first — a bare
          // ts sort left the order to shuffle arrival, nondeterministic
          def prio(et: String): Int =
            if (et == stages._1) 0
            else if (et == stages._2) 1
            else if (et == stages._3) 2 else 3
          rows.toSeq.sortBy(r => (r._3, prio(r._2))).foreach { case (_, et, us) =>
            n += 1
            if (t1 < 0 && et == stages._1) t1 = us
            else if (t1 >= 0 && t2 < 0 && et == stages._2 && us >= t1) t2 = us
            else if (t2 >= 0 && t3 < 0 && et == stages._3 && us >= t2) t3 = us
          }
          state.update((n, t1, t2, t3))
          val stage = if (t3 >= 0) 3L else if (t2 >= 0) 2L else if (t1 >= 0) 1L else 0L
          (user, n, t1, t2, t3, stage)
      }
  }

  /** Streaming per-event sessionization — the stateful twin of
    * `operators.WindowsDF.sessionize`: O(1) state per user (last event time
    * + session counter) folded over each micro-batch's slice in (ts, id)
    * order, emitting every event with its (is_new, session_id) assignment
    * in Append mode. Same in-order-across-batches contract as
    * [[funnelStream]]: batch boundaries must respect event-time order per
    * key for cross-batch gaps to be measured against the true previous
    * event (a bounded AvailableNow run is one sorted batch, so it equals
    * the batch assignment exactly — the catalog twin's claim).
    *
    * rows: (event_id, user_id, us); out: (event_id, user_id, is_new,
    * session_id). */
  def sessionizeStream(ds: Dataset[(Long, Long, Long)], gapUs: Long)
      : Dataset[(Long, Long, Boolean, Long)] = {
    import org.apache.spark.sql.Encoders
    implicit val eKey: Encoder[Long] = Encoders.scalaLong
    implicit val eState: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
    implicit val eOut: Encoder[(Long, Long, Boolean, Long)] =
      Encoders.product[(Long, Long, Boolean, Long)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Boolean, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (lastUs, nSess) = state.getOption.getOrElse((0L, 0L))
          val out = rows.toSeq.sortBy(r => (r._3, r._1)).map { case (id, _, us) =>
            // short-circuit guards the sentinel: nSess == 0 means no
            // previous event, so lastUs is never read there
            val isNew = nSess == 0L || us - lastUs > gapUs
            if (isNew) nSess += 1
            lastUs = us
            (id, user, isNew, nSess)
          }
          state.update((lastUs, nSess))
          out.iterator
      }
  }

  /** Streaming ProcessingTimeWindow.tumbling per key (reference:
    * descr/processing_time.rs:92-107): elements buffer in keyed state; a
    * wall-clock timeout of `sizeMs`, armed when the window opens (first
    * element), emits the window's aggregate. As with all processing-time
    * semantics the exact cut points are wall-clock-dependent; the invariants
    * (buffer-until-timeout, emit-once, re-arm on next element, and a window
    * never absorbs data that arrives past its absolute deadline — such data
    * closes the expired window and opens the next) are what the
    * spec pins. Note Structured Streaming fires timeouts at the NEXT
    * micro-batch after the deadline; run with a throttled trigger (e.g.
    * `Trigger.ProcessingTime`) — with the default ASAP trigger the pending
    * timeouts busy-loop no-data batches. Don't synchronize on
    * `processAllAvailable()`: pending timeouts keep scheduling no-data
    * batches, so its no-new-data signal never fires — poll the sink. */
  final case class PtWindowState[V](buf: Seq[V], deadlineMs: Long)

  def processingTimeTumbling[K, V, O](ds: Dataset[(K, V)], sizeMs: Long)(
      agg: Seq[V] => O)(
      implicit ek: Encoder[K], ev: Encoder[PtWindowState[V]], eo: Encoder[(K, O)],
      ekv: Encoder[(K, V)]): Dataset[(K, O)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[PtWindowState[V], (K, O)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[PtWindowState[V]]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.map(_.buf).getOrElse(Seq.empty[V])
            state.remove()
            if (buf.nonEmpty) Iterator.single((key, agg(buf))) else Iterator.empty
          } else {
            // Spark clears the timeout on EVERY invocation for a key, so it
            // must be re-armed each time; the window's ABSOLUTE deadline
            // (open time + size) is kept in state so later batches don't
            // slide it
            val now = state.getCurrentProcessingTimeMs()
            val prev = state.getOption
            // timeouts fire at the NEXT batch, so data can arrive for a key
            // whose deadline already passed before its timeout callback ran:
            // that window is CLOSED — emit it now and open a fresh one for
            // this batch's rows instead of merging across the deadline
            val expired = prev.filter(p => now >= p.deadlineMs && p.buf.nonEmpty)
            val live = prev.filterNot(p => now >= p.deadlineMs)
            val deadline = live.map(_.deadlineMs).getOrElse(now + sizeMs)
            val buf = scala.collection.mutable.ArrayBuffer.empty[V]
            live.foreach(buf ++= _.buf)
            rows.foreach { case (_, v) => buf += v }
            state.update(PtWindowState(buf.toSeq, deadline))
            state.setTimeoutDuration(math.max(1L, deadline - now))
            expired.map(p => (key, agg(p.buf))).iterator
          }
      }

  /** Streaming exact dedup: keeps the FIRST record per distinct text (by md5
    * digest) across micro-batches. Without a watermark the digest state grows
    * with the distinct-document count — the batch-equivalent semantics; pass
    * `withinWatermark = Some((tsCol, delay))` to bound state to the watermark
    * horizon (`dropDuplicatesWithinWatermark`), the production shape for
    * unbounded streams. */
  def dedupExactStream(df: DataFrame, textCol: String,
      withinWatermark: Option[(String, String)] = None): DataFrame = {
    val digested = df.withColumn("digest", md5(col(textCol)))
    withinWatermark match {
      case Some((tsCol, delay)) =>
        digested.withWatermark(tsCol, delay)
          .dropDuplicatesWithinWatermark("digest")
      case None => digested.dropDuplicates("digest")
    }
  }

  /** Streaming KMV distinct-count sketch — the streaming twin of
    * [[graft.functions.Sketches.kmvSketch]]: the k smallest distinct item
    * hashes maintained across triggers, one refreshed (h_k, n_h, est) row
    * emitted per batch (Update mode).
    *
    * Shape mirrors the batch sketch exactly: a NARROW per-partition pass
    * keeps each micro-batch partition's k smallest distinct hashes
    * (bounded TreeSet), so the stateful operator receives at most
    * partitions·k candidate rows per trigger — the stream's distinct-value
    * universe never shuffles, and state is O(k) Longs regardless of how
    * much data has flowed. Estimator and hash modes are the batch ones, so
    * the emitted estimate after any prefix of the stream equals
    * [[graft.functions.Sketches.kmvEstimate]] over that prefix
    * (StreamingSpec pins it). */
  def kmvStream(df: DataFrame, c: Column, k: Int,
      portable: Boolean = false): Dataset[(Long, Long, Double)] = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val space = graft.functions.Sketches.hashSpace(portable)
    val hashes = df.where(c.isNotNull) // null items excluded (itemHash contract)
      .select(graft.functions.Sketches.itemHash(c, portable).as("h")).as[Long]
    val local = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { v =>
        if (set.size < k) set.add(v)
        else if (v < set.last) { if (set.add(v)) set.pollLast() }
      }
      scala.collection.JavaConverters.asScalaIterator(set.iterator())
        .map(_.longValue()).toVector.iterator
    }
    local.groupByKey(_ => 0)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (_: Int, batch: Iterator[Long], state: GroupState[Seq[Long]]) => {
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.getOrElse(Seq.empty).foreach(set.add(_))
          batch.foreach { v =>
            if (set.size < k) set.add(v)
            else if (v < set.last) { if (set.add(v)) set.pollLast() }
          }
          val sk = scala.collection.JavaConverters
            .asScalaIterator(set.iterator()).map(_.longValue()).toVector
          state.update(sk)
          val (hk, n) = (sk.last, sk.size.toLong)
          val est = if (n < k) n.toDouble else (k - 1).toDouble * space / hk
          (hk, n, est)
        })
  }

  /** One band's state for [[simhashNearDupPairs]]: every (id, signature)
    * seen in the band bucket so far. */
  final case class BandState(docs: Seq[(Long, Long)])

  /** Streaming SimHash near-dup PAIR detection — the streaming twin of
    * [[graft.functions.Dedup.simhashNearDups]] (StreamingSpec pins set
    * equality of the emitted pairs against the batch output on the same
    * documents).
    *
    * Shape: per-row signature (native [[graft.plans.SimHashExpr]] — no
    * explode/groupBy on a stream), exploded into the same (maxDist+1)-band
    * pigeonhole buckets as the batch path, then one `flatMapGroupsWithState`
    * keyed by (band_id, band_val) holding the (id, sig) pairs seen in that
    * bucket. A new arrival emits (a_id, b_id, hamming) against every stored
    * near match.
    *
    * Exactly-once pair emission WITHOUT a second stateful operator: both
    * full signatures are in state, so each band recomputes the pair's
    * colliding-band set and only the LOWEST colliding band emits. (The batch
    * path gets the same dedupe via `.distinct()`; chaining a streaming
    * distinct after a flatMapGroupsWithState would be a second stateful op.)
    *
    * State is per-bucket linear in the documents seen — the same unbounded
    * growth as any dedup-against-history; production bounds it by keying the
    * band value with a coarse time bucket or TTL-ing via timeouts. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): Dataset[(Long, Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBits = 64
    val nBands = maxDist + 1
    require(maxDist >= 0 && nBands <= nBits,
      s"maxDist=$maxDist out of range for $nBits-bit signatures")
    val width = nBits / nBands

    def bandValOf(sig: Long, b: Int): Long = {
      val w = if (b == nBands - 1) nBits - b * width else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      (sig >>> (b * width)) & mask
    }

    val sig = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.plans.TextExpressions.simhashRow(col(textCol), nBits).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until nBands).map { b =>
        val w = if (b == nBands - 1) nBits - b * width else width
        val mask = if (w >= 64) -1L else (1L << w) - 1
        shiftright(col("sig"), b * width).bitwiseAND(mask)
      }: _*)).as(Seq("band_id", "band_val")))
      .as[(Long, Long, Int, Long)]

    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BandState, (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Long, Long, Int, Long)],
         state: GroupState[BandState]) =>
          val bandId = key._1
          val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          seen ++= state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          rows.foreach { case (id, s, _, _) =>
            // redelivery idempotence (at-least-once sources): a doc id
            // already in the bucket re-pairs against the whole history and
            // duplicates its state entry — the batch twin collapses this
            // with .distinct(); here we skip the re-arrival outright
            if (!seen.exists(_._1 == id)) {
            seen.foreach { case (oid, os) =>
              if (oid != id) {
                val ham = java.lang.Long.bitCount(s ^ os)
                if (ham <= maxDist) {
                  // emit only from the lowest band where the pair collides
                  val minBand = (0 until nBands)
                    .find(b => bandValOf(s, b) == bandValOf(os, b)).get
                  if (minBand == bandId) {
                    val (a, b) = if (id < oid) (id, oid) else (oid, id)
                    out += ((a, b, ham))
                  }
                }
              }
            }
            seen += ((id, s))
            }
          }
          state.update(BandState(seen.toSeq))
          out.iterator
      }
  }

  /** One band bucket's state for [[minhashNearDupPairs]]: the (id, full
    * signature) pairs seen in the bucket. Signatures ride the state because
    * est_sim and the exactly-once band election need BOTH signatures at
    * arrival time (the batch path fetches them with a join; inside one
    * stateful operator there is no second lookup). Production variants
    * bound this with TTL timeouts or store a doc reference + side lookup. */
  final case class MinHashBandState(docs: Seq[(Long, Seq[Long])])

  /** Streaming MinHash+LSH near-dup PAIR detection — the streaming twin of
    * [[graft.functions.Dedup.minhashNearDups]] (StreamingSpec pins set
    * equality of (a_id, b_id, est_sim) against the batch output on the same
    * documents).
    *
    * Shape: per-row signature (native [[graft.plans.MinHashRowExpr]] — no
    * explode/groupBy on a stream; documents with fewer than `shingleSize`
    * words produce no signature, as in batch), banded with the SAME band
    * hashes as the batch path (xxhash64 over the joined signature slice),
    * then one `flatMapGroupsWithState` keyed by (band_id, band_hash). A new
    * arrival emits (a_id, b_id, est_sim) for every stored bucket-mate with
    * est_sim ≥ `minEstSim`; only the LOWEST colliding band emits, so each
    * pair surfaces exactly once without a second stateful operator. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      minEstSim: Double = 0.5, bands: Int = 16, numHashes: Int = 64,
      shingleSize: Int = 5): Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands
    val consts = (0 until numHashes).map(graft.functions.Dedup.defaultPermConsts)
    val (as, bs) = consts.unzip

    // driver-side twin of the batch band key: xxhash64(seed 42) of the
    // "_"-joined decimal signature slice (Long.toString ≡ Spark's long→string
    // cast inside concat_ws)
    def bandHashOf(sig: Seq[Long], b: Int): Long = {
      val joined = (b * rows until (b + 1) * rows).map(sig).mkString("_")
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(joined),
        org.apache.spark.sql.types.StringType, 42L)
    }

    val sig = docs.select(col(idCol).cast("long").as("doc_id"),
        graft.plans.TextExpressions.minhashRow(col(textCol), shingleSize, as, bs)
          .as("sig"))
      .filter(col("sig").isNotNull)
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws("_",
          (b * rows until (b + 1) * rows).map(i => col("sig").getItem(i)): _*))
      }: _*)).as(Seq("band_id", "band_hash")))
      .as[(Long, Seq[Long], Int, Long)]

    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[MinHashBandState, (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rowsIt: Iterator[(Long, Seq[Long], Int, Long)],
         state: GroupState[MinHashBandState]) =>
          val bandId = key._1
          val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
          seen ++= state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          rowsIt.foreach { case (id, s, _, _) =>
            // redelivery idempotence — same rationale as the simhash twin
            if (!seen.exists(_._1 == id)) {
            seen.foreach { case (oid, os) =>
              if (oid != id) {
                var m = 0
                var i = 0
                while (i < numHashes) { if (s(i) == os(i)) m += 1; i += 1 }
                val est = m.toDouble / numHashes
                if (est >= minEstSim) {
                  val minBand = (0 until bands)
                    .find(b => bandHashOf(s, b) == bandHashOf(os, b)).get
                  if (minBand == bandId) {
                    val (a, b) = if (id < oid) (id, oid) else (oid, id)
                    out += ((a, b, est))
                  }
                }
              }
            }
            seen += ((id, s))
            }
          }
          state.update(MinHashBandState(seen.toSeq))
          out.iterator
      }
  }

  /** One LSH bucket's state for [[embeddingNearDupPairs]]. */
  final case class VecBucketState(docs: Seq[(Long, Seq[Double], Double)])

  /** Streaming embedding near-dup pairs — the streaming twin of
    * [[graft.functions.Similarity.cosineNearDups]] (StreamingSpec pins set
    * equality against the batch output). Each vector's LSH bucket is a
    * stateless Column (the fused [[graft.plans.LshBucket]]), so the stream
    * plan is: bucket per row → one `flatMapGroupsWithState` per bucket
    * holding (id, vec, norm) history → emit (a_id, b_id, sim) for new
    * arrivals against bucket-mates with sim ≥ `minSim`. A vector has exactly
    * ONE bucket, so each pair can only ever surface once — no band election
    * needed. Same state-growth caveat as the other streaming dedups. */
  def embeddingNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      minSim: Double, bits: Int = 12): Dataset[(Long, Long, Double)] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bucketed = vecs.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket", graft.functions.Similarity.lshBucket(col("vec"), bits))
      .as[(Long, Seq[Double], Long)]
    bucketed.groupByKey(_._3)
      .flatMapGroupsWithState[VecBucketState, (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Seq[Double], Long)],
         state: GroupState[VecBucketState]) =>
          val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double], Double)]
          seen ++= state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          rows.foreach { case (id, v, _) =>
            // redelivery idempotence — same rationale as the simhash twin
            if (!seen.exists(_._1 == id)) {
            // sequential ascending-index fold = the batch dot/norm FP order
            var nrm = 0.0
            var i = 0
            while (i < v.length) { nrm += v(i) * v(i); i += 1 }
            nrm = math.sqrt(nrm)
            seen.foreach { case (oid, ov, onrm) =>
              if (oid != id) {
                var d = 0.0
                i = 0
                while (i < v.length && i < ov.length) { d += v(i) * ov(i); i += 1 }
                // zero-norm guard, matching the batch twin's cosineOf: an
                // all-zero embedding must score 0.0 — the raw 0/0 is NaN
                // and BigDecimal(NaN) would CRASH the streaming query
                val raw = if (nrm * onrm == 0.0) 0.0 else d / (nrm * onrm)
                val sim = BigDecimal(raw)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (sim >= minSim) {
                  val (a, b) = if (id < oid) (id, oid) else (oid, id)
                  out += ((a, b, sim))
                }
              }
            }
            seen += ((id, v, nrm))
            }
          }
          state.update(VecBucketState(seen.toSeq))
          out.iterator
      }
  }

  /** Keyed state for [[asofJoinStream]]: right rows seen so far, as a
    * (ts-ascending) sorted vector, trimmed to the newest `keepRights`. */
  final case class AsOfStreamState[R](rights: Seq[(Long, R)])

  /** First index in the ts-sorted `hist` with ts > `ts` (upper bound) —
    * the O(log n) probe the sorted-state docstring promises; with a large
    * `keepRights` the previous linear scan made each batch O(rows·|hist|). */
  private def tsUpperBound[R](hist: Vector[(Long, R)], ts: Long): Int = {
    var lo = 0; var hi = hist.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hist(mid)._1 <= ts) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Streaming as-of join — the enrichment twin of
    * [[graft.operators.AsOfJoin.backward]]: each left event is matched to
    * the latest right row on its key with `right.ts <= left.ts`, among the
    * rights that have ARRIVED so far (the stream cannot wait for rights it
    * has not seen — at-arrival semantics, the standard "enrich events with
    * the latest dimension state" shape). Within a micro-batch, rows process
    * in event-time order with rights-before-lefts at ties, so a batch whose
    * arrival respects event order reproduces the batch operator exactly;
    * a right arriving AFTER a left it would have matched does not
    * retro-emit (StreamingSpec pins both sides of this divergence).
    *
    * Emits `(key, left_ts, left, Option[right], Option[right_ts])` —
    * unmatched lefts emit immediately with None (left-outer, append mode).
    *
    * State per key is the right-row history, sorted for binary search;
    * `keepRights` bounds it (oldest trimmed) — keepRights=1 is the pure
    * latest-state enrichment mode, correct when lefts never arrive
    * event-time-earlier than the newest right. */
  def asofJoinStream[K, L, R](lefts: Dataset[(K, Long, L)],
      rights: Dataset[(K, Long, R)], keepRights: Int = Int.MaxValue)(
      implicit ek: Encoder[K], es: Encoder[AsOfStreamState[R]],
      eu: Encoder[(K, Long, Option[L], Option[R])],
      eo: Encoder[(K, Long, L, Option[R], Option[Long])])
      : Dataset[(K, Long, L, Option[R], Option[Long])] = {
    require(keepRights >= 1, s"keepRights must be >= 1, got $keepRights")
    val tagged = lefts
      .map { case (k, t, l) => (k, t, Option(l), Option.empty[R]) }
      .unionByName(rights
        .map { case (k, t, r) => (k, t, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[AsOfStreamState[R], (K, Long, L, Option[R], Option[Long])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, Long, Option[L], Option[R])],
         state: GroupState[AsOfStreamState[R]]) =>
          var hist = state.getOption.map(_.rights.toVector)
            .getOrElse(Vector.empty[(Long, R)])
          // event-time order within the batch; rights first at equal ts so
          // an equal-ts right is visible to its left (inclusive match)
          val batch = rows.toVector.sortBy(t => (t._2, t._3.isDefined))
          val out = scala.collection.mutable
            .ArrayBuffer.empty[(K, Long, L, Option[R], Option[Long])]
          batch.foreach {
            case (_, rts, None, Some(r)) =>
              // insert keeping ts order (late rights land mid-vector)
              val i = tsUpperBound(hist, rts)
              hist = hist.patch(i, Seq((rts, r)), 0)
              if (hist.size > keepRights) hist = hist.drop(hist.size - keepRights)
            case (_, lts, Some(l), None) =>
              val i = tsUpperBound(hist, lts) - 1
              if (i < 0) out += ((key, lts, l, None, None))
              else out += ((key, lts, l, Some(hist(i)._2), Some(hist(i)._1)))
            case _ => () // unreachable: every tagged row is left xor right
          }
          state.update(AsOfStreamState(hist))
          out.iterator
      }
  }

  /** Streaming TransactionWindow (reference descr/transaction.rs — the
    * NEXMark q4 auction-close shape): per-key single active window driven by
    * a user signal; CommitAfter arms an event-time timer (processing
    * lowering: committed when a later element's event time passes it —
    * batch-compatible semantics of graft.api.WindowDescr.TransactionWindow). */
  sealed trait TxOp extends Serializable
  case object TxContinue extends TxOp
  case object TxCommit extends TxOp
  case object TxDiscard extends TxOp
  final case class TxCommitAfter(tsMillis: Long) extends TxOp

  final case class TxState[V](buf: Seq[V], commitAt: Option[Long])

  def transactionWindow[K, V, O](ds: Dataset[(K, V)], logic: V => TxOp,
      tsMillis: V => Long)(agg: Seq[V] => O)(
      implicit ek: Encoder[K], es: Encoder[TxState[V]], eo: Encoder[(K, O)],
      ekv: Encoder[(K, V)]): Dataset[(K, O)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TxState[V], (K, O)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[TxState[V]]) =>
          val init = state.getOption.getOrElse(TxState[V](Seq.empty, None))
          // mutable buffer within the batch (O(n) appends), immutable in state
          val buf = scala.collection.mutable.ArrayBuffer.empty[V]
          buf ++= init.buf
          var commitAt = init.commitAt
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, O)]
          rows.foreach { v0 =>
            val v = v0._2
            if (commitAt.exists(t => tsMillis(v) > t)) {
              if (buf.nonEmpty) out += ((key, agg(buf.toSeq)))
              buf.clear(); commitAt = None
            }
            buf += v
            logic(v) match {
              case TxContinue => ()
              case TxCommit =>
                out += ((key, agg(buf.toSeq))); buf.clear(); commitAt = None
              case TxDiscard => buf.clear(); commitAt = None
              case TxCommitAfter(t) => commitAt = Some(t)
            }
          }
          state.update(TxState(buf.toSeq, commitAt))
          out.iterator
      }

  /** State for [[transactionWindowBounded]]: the open buffer plus the
    * per-key window counter (`winSeq`, bumps every time a window closes by
    * ANY path) and a monotone emission counter (`emitSeq`) that lets the
    * reconciling sink pick the newest provisional snapshot. */
  final case class TxBoundedState[V](buf: Seq[V], commitAt: Option[Long],
      winSeq: Long, emitSeq: Long)

  /** Bounded-replay TransactionWindow with an END-OF-STREAM FLUSH — the
    * exact batch semantics of [[graft.api.Windowing.TransactionWindow]]
    * (reference descr/transaction.rs:100-131) over a finite stream.
    *
    * The plain [[transactionWindow]] machine can never emit a trailing
    * pending-`CommitAfter` window: `flatMapGroupsWithState` has no
    * end-of-input hook, so state that the batch operator would flush at
    * stream end (Windowing.scala's `if (commitAt.isDefined && cur.nonEmpty)`
    * tail) stays buried in the state store. This variant solves it with a
    * PROVISIONAL-EMISSION discipline — the standard "reconciling sink"
    * bridge from an append stream to batch-equivalent results:
    *
    *  - every committed window emits `(key, winSeq, "commit", emitSeq, agg)`;
    *  - a `Discard` emits a `"tomb"` row (its agg value is a placeholder),
    *    so stale provisionals of the discarded window can be cancelled;
    *  - at each micro-batch end, a still-open window with a pending
    *    `CommitAfter` emits a `"prov"` snapshot of its current aggregate.
    *
    * [[reconcileTxBounded]] then resolves, per (key, winSeq): a commit row
    * wins outright; otherwise the newest provisional survives unless a tomb
    * closed the window. Given the house cross-batch contract (micro-batches
    * arrive `order`-ascending per key — runStream's ts-range split), the
    * reconciled set equals the batch `assign` over the whole input,
    * INCLUDING the trailing flush (StreamingSpec pins it, Discard path too).
    *
    * Scale shape: emissions are O(#windows + #open-windows × #batches), so
    * the reconciling epilogue is window-count-sized, never event-sized. */
  def transactionWindowBounded[K, V, B, O](ds: Dataset[(K, V)],
      logic: V => TxOp, tsMillis: V => Long, order: V => B)(agg: Seq[V] => O)(
      implicit ob: Ordering[B], ek: Encoder[K], es: Encoder[TxBoundedState[V]],
      eo: Encoder[(K, Long, String, Long, O)], ekv: Encoder[(K, V)])
      : Dataset[(K, Long, String, Long, O)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TxBoundedState[V], (K, Long, String, Long, O)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[TxBoundedState[V]]) =>
          val init = state.getOption.getOrElse(
            TxBoundedState[V](Seq.empty, None, 0L, 0L))
          val buf = scala.collection.mutable.ArrayBuffer.empty[V]
          buf ++= init.buf
          var commitAt = init.commitAt
          var winSeq = init.winSeq
          var emitSeq = init.emitSeq
          val out = scala.collection.mutable
            .ArrayBuffer.empty[(K, Long, String, Long, O)]
          def emit(kind: String): Unit = {
            out += ((key, winSeq, kind, emitSeq, agg(buf.toSeq)))
            emitSeq += 1
          }
          // within-batch sort by `order` = the batch machine's element order;
          // cross-batch order is the runStream contract
          rows.map(_._2).toVector.sortBy(order).foreach { v =>
            if (commitAt.exists(t => tsMillis(v) > t)) {
              if (buf.nonEmpty) emit("commit")
              buf.clear(); winSeq += 1; commitAt = None
            }
            buf += v
            logic(v) match {
              case TxContinue => ()
              case TxCommit =>
                emit("commit"); buf.clear(); winSeq += 1; commitAt = None
              case TxDiscard =>
                emit("tomb"); buf.clear(); winSeq += 1; commitAt = None
              case TxCommitAfter(t) => commitAt = Some(t)
            }
          }
          if (buf.nonEmpty && commitAt.isDefined) emit("prov")
          state.update(TxBoundedState(buf.toSeq, commitAt, winSeq, emitSeq))
          out.iterator
      }

  /** Batch epilogue resolving [[transactionWindowBounded]] emissions to the
    * final window set. Input columns: (key, win_seq, kind, emit_seq, out) —
    * callers name them with `.toDF(...)`. Output: (key, out), one row per
    * batch-semantics window. Runs over the emitted-window stream only
    * (window-count-sized input). */
  def reconcileTxBounded(emits: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("win_seq")).orderBy(col("emit_seq").desc)
    // renamed join keys: both sides derive from the SAME sink table, and a
    // bare self-anti-join on shared attribute ids fails analysis
    val closed = emits.filter(col("kind") =!= "prov")
      .select(col("key").as("c_key"), col("win_seq").as("c_win")).distinct()
    val trailing = emits.filter(col("kind") === "prov")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(closed, col("key") === col("c_key") && col("win_seq") === col("c_win"),
        "left_anti")
    emits.filter(col("kind") === "commit").select(col("key"), col("out"))
      .unionByName(trailing.select(col("key"), col("out")))
  }

  /** [[bothSeenOnce]] with an EVENT-TIME TTL — the production shape for an
    * unbounded key space (e.g. NEXMark q8's (user, day) keys): rows carry
    * their event time (the input must already be watermarked on that
    * column), and a key whose newest event is `ttlMs` behind the watermark
    * has its state REMOVED. A pair completing within the horizon emits
    * exactly once; a polarity arriving after its partner expired re-opens
    * fresh state (and can re-emit) — the standard TTL trade, pinned by
    * StreamingSpec. State is O(1) per LIVE key; expired keys leave the
    * store (numRowsTotal-verified). */
  def bothSeenOnceTtl[K](ds: Dataset[(K, Boolean, java.sql.Timestamp)],
      ttlMs: Long)(implicit ek: Encoder[K],
      ekb: Encoder[(K, Boolean, java.sql.Timestamp)]): Dataset[K] = {
    // EventTimeTimeout preconditions, failed fast at build time instead of
    // an IllegalArgumentException from setTimeoutTimestamp mid-query: the
    // TTL must be positive, and the INPUT must carry a watermark (the
    // timeout clock IS the query watermark — without one it never fires
    // and expired state lives forever).
    require(ttlMs > 0, s"bothSeenOnceTtl: ttlMs must be > 0 (got $ttlMs)")
    require(!ds.isStreaming || ds.queryExecution.analyzed.collectFirst {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
      }.isDefined,
      "bothSeenOnceTtl: streaming input must be watermarked (withWatermark) " +
        "for the event-time TTL to expire state")
    implicit val es: Encoder[(Boolean, Boolean, Boolean)] =
      org.apache.spark.sql.Encoders.product[(Boolean, Boolean, Boolean)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Boolean, Boolean, Boolean), K](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: K, rows: Iterator[(K, Boolean, java.sql.Timestamp)],
         state: GroupState[(Boolean, Boolean, Boolean)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (sawTrue, sawFalse, emitted) =
              state.getOption.getOrElse((false, false, false))
            var maxTs = Long.MinValue
            rows.foreach { case (_, flag, t) =>
              if (flag) sawTrue = true else sawFalse = true
              if (t.getTime > maxTs) maxTs = t.getTime
            }
            val fire = sawTrue && sawFalse && !emitted
            if (fire) emitted = true
            state.update((sawTrue, sawFalse, emitted))
            // expire when the watermark passes the key's newest event + TTL
            state.setTimeoutTimestamp(maxTs + ttlMs)
            if (fire) Iterator.single(key) else Iterator.empty
          }
      }
  }

  /** Emit each key EXACTLY ONCE, the moment both flag polarities have been
    * observed for it (the NEXMark q8 "signup AND purchase in the same
    * window" gate, keyed by (user, window)): O(1) state per key — two seen
    * bits plus the emitted latch — and order-independent, so it needs no
    * cross-batch ordering contract. Unbounded key count is the usual
    * dedup-against-history caveat; production bounds it with a watermark
    * TTL on the window component of the key ([[bothSeenOnceTtl]]). */
  def bothSeenOnce[K](ds: Dataset[(K, Boolean)])(implicit ek: Encoder[K],
      ekb: Encoder[(K, Boolean)]): Dataset[K] = {
    implicit val es: Encoder[(Boolean, Boolean, Boolean)] =
      org.apache.spark.sql.Encoders.product[(Boolean, Boolean, Boolean)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Boolean, Boolean, Boolean), K](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, Boolean)],
         state: GroupState[(Boolean, Boolean, Boolean)]) =>
          var (sawTrue, sawFalse, emitted) =
            state.getOption.getOrElse((false, false, false))
          rows.foreach { case (_, flag) =>
            if (flag) sawTrue = true else sawFalse = true
          }
          val fire = sawTrue && sawFalse && !emitted
          if (fire) emitted = true
          state.update((sawTrue, sawFalse, emitted))
          if (fire) Iterator.single(key) else Iterator.empty
      }
  }
}
