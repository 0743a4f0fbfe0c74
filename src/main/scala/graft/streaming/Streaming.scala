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
    * left.ts + upper]; both sides need watermarks for state cleanup. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCond: Column,
      leftTs: Column, rightTs: Column, lower: String, upper: String): DataFrame =
    left.join(right, keyCond
      && rightTs >= leftTs - expr(s"INTERVAL $lower")
      && rightTs <= leftTs + expr(s"INTERVAL $upper"))

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
          var buf = state.getOption.getOrElse(Seq.empty[V])
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, O)]
          rows.foreach { case (_, v) =>
            buf = buf :+ v
            if (buf.size == size) { out += ((key, agg(buf))); buf = Seq.empty[V] }
          }
          state.update(buf)
          out.iterator
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
          var st = state.getOption.getOrElse(TxState[V](Seq.empty, None))
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, O)]
          rows.foreach { v0 =>
            val v = v0._2
            if (st.commitAt.exists(t => tsMillis(v) > t)) {
              if (st.buf.nonEmpty) out += ((key, agg(st.buf)))
              st = TxState(Seq.empty, None)
            }
            st = st.copy(buf = st.buf :+ v)
            logic(v) match {
              case TxContinue => ()
              case TxCommit =>
                out += ((key, agg(st.buf))); st = TxState(Seq.empty, None)
              case TxDiscard => st = TxState(Seq.empty, None)
              case TxCommitAfter(t) => st = st.copy(commitAt = Some(t))
            }
          }
          state.update(st)
          out.iterator
      }
}
