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
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[V], (K, O)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[Seq[V]]) =>
          // mutable buffer within the batch: appending to an immutable Seq
          // per element is O(n²) on large windows
          val buf = scala.collection.mutable.ArrayBuffer.empty[V]
          buf ++= state.getOption.getOrElse(Seq.empty[V])
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, O)]
          rows.foreach { case (_, v) =>
            buf += v
            if (buf.size == size) { out += ((key, agg(buf.toSeq))); buf.clear() }
          }
          state.update(buf.toSeq)
          out.iterator
      }

  /** Streaming ProcessingTimeWindow.tumbling per key (reference:
    * descr/processing_time.rs:92-107): elements buffer in keyed state; a
    * wall-clock timeout of `sizeMs`, armed when the window opens (first
    * element), emits the window's aggregate. As with all processing-time
    * semantics the exact cut points are wall-clock-dependent; the invariants
    * (buffer-until-timeout, emit-once, re-arm on next element) are what the
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
            val deadline = prev.map(_.deadlineMs).getOrElse(now + sizeMs)
            val buf = scala.collection.mutable.ArrayBuffer.empty[V]
            prev.foreach(buf ++= _.buf)
            rows.foreach { case (_, v) => buf += v }
            state.update(PtWindowState(buf.toSeq, deadline))
            state.setTimeoutDuration(math.max(1L, deadline - now))
            Iterator.empty
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
}
