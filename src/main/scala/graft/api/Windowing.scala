package graft.api

import org.apache.spark.sql.{Encoder, SparkSession}

/** Window descriptors — the analogs of the reference's `WindowDescription`
  * strategies (reference: src/operator/window/mod.rs:18-78). Each descriptor
  * is a pure assignment function from a key's ordered elements to windows;
  * the typed path runs it per key inside `flatMapGroups` (one shuffle on the
  * key, bounded state per key — same memory model as the reference's
  * per-key `WindowManager`).
  *
  * Scale note: event-time windows over huge keys should use the Catalyst
  * lowering in [[graft.operators.WindowsDF]] (`groupBy(window(ts, ...))`),
  * which streams through partial aggregation instead of materializing the
  * key's elements. The typed path below exists for the descriptors Spark SQL
  * cannot express (exact count windows, transaction windows, last-k
  * per-element emission).
  */
sealed trait WindowDescr[V] extends Serializable {
  /** Assign ordered elements of one key to windows (each window = its
    * elements in order). */
  def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]]

  /** Windows tagged with a stable identity, used to pair windows across two
    * streams in window joins. Positional by default (count-style windows);
    * time-based descriptors override with the window start so empty windows
    * on one side cannot shift the alignment. */
  def assignWithId(elems: IndexedSeq[V]): Iterator[(Long, IndexedSeq[V])] =
    assign(elems).zipWithIndex.map { case (w, i) => (i.toLong, w) }

  /** Per-element window-id assignment, defined when an element's windows
    * depend only on the element itself (event-time style descriptors) —
    * None when assignment needs the whole key's ordering (count, session,
    * transaction windows). Ids match [[assignWithId]]. This is what lets
    * order-insensitive aggregators run incrementally with O(#windows)
    * state per key instead of materializing O(#elements) (the reference's
    * `WindowAccumulator` contract, src/operator/window/mod.rs:36-44). */
  def elementWindows: Option[V => Iterator[Long]] = None
}

object WindowDescr {

  /** Count-based windows: `size` elements, every `slide` elements; `exact`
    * controls whether the trailing partial window is emitted
    * (reference: descr/count.rs:99-137). `order` fixes the intra-key order
    * (the reference relies on arrival order; batch needs it explicit). */
  final case class CountWindow[V, B](size: Int, slide: Int, exact: Boolean,
      order: V => B)(implicit val ord: Ordering[B]) extends WindowDescr[V] {
    require(size > 0 && slide > 0)
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] = {
      val sorted = elems.sortBy(order)(ord)
      val starts = Iterator.from(0, slide).takeWhile(_ < sorted.length)
      val full = starts.map(s => sorted.slice(s, s + size))
      if (exact) full.filter(_.length == size)
      else {
        // on terminate, the first incomplete window is emitted if present
        var emittedPartial = false
        full.filter { w =>
          if (w.length == size) true
          else if (!emittedPartial) { emittedPartial = true; true }
          else false
        }
      }
    }
  }
  object CountWindow {
    def tumbling[V, B: Ordering](size: Int)(order: V => B): CountWindow[V, B] =
      CountWindow(size, size, exact = true, order)
    def sliding[V, B: Ordering](size: Int, slide: Int)(order: V => B): CountWindow[V, B] =
      CountWindow(size, slide, exact = true, order)
  }

  /** A window per arriving element, holding the up-to-k most recent elements
    * (reference: descr/last_k.rs:97-105). */
  final case class LastKWindow[V, B](k: Int, order: V => B)(
      implicit val ord: Ordering[B]) extends WindowDescr[V] {
    // fail fast here, not as a NoSuchElementException inside an executor
    // stage: k <= 0 would emit EMPTY windows, and every aggregator that
    // reads a window's head (first/foldFirst/maxBy/...) assumes one exists
    require(k >= 1, s"LastKWindow needs k >= 1, got $k")
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] = {
      val sorted = elems.sortBy(order)(ord)
      sorted.indices.iterator.map(i => sorted.slice(math.max(0, i - k + 1), i + 1))
    }
  }

  /** Event-time tumbling/sliding windows, epoch-aligned like Spark's
    * `window()` (reference: descr/event_time.rs:112-130). `tsMillis` extracts
    * the event time. */
  final case class EventTimeWindow[V](sizeMs: Long, slideMs: Long, tsMillis: V => Long)
      extends WindowDescr[V] {
    require(sizeMs > 0 && slideMs > 0)
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] =
      assignWithId(elems).map(_._2)
    override def assignWithId(elems: IndexedSeq[V]): Iterator[(Long, IndexedSeq[V])] = {
      val sorted = elems.sortBy(tsMillis)
      val byWindow = scala.collection.mutable.LinkedHashMap.empty[Long, scala.collection.mutable.ArrayBuffer[V]]
      for (e <- sorted) {
        val ts = tsMillis(e)
        // windows with start in (ts - size, ts] aligned to slide
        var start = math.floorDiv(ts, slideMs) * slideMs
        while (start > ts - sizeMs) {
          byWindow.getOrElseUpdate(start, scala.collection.mutable.ArrayBuffer.empty) += e
          start -= slideMs
        }
      }
      byWindow.iterator.map { case (s, b) => (s, b.toIndexedSeq) }
    }
    override def elementWindows: Option[V => Iterator[Long]] = Some { e =>
      val ts = tsMillis(e)
      val first = math.floorDiv(ts, slideMs) * slideMs
      Iterator.iterate(first)(_ - slideMs).takeWhile(_ > ts - sizeMs)
    }
  }
  object EventTimeWindow {
    def tumbling[V](sizeMs: Long)(ts: V => Long): EventTimeWindow[V] =
      EventTimeWindow(sizeMs, sizeMs, ts)
    def sliding[V](sizeMs: Long, slideMs: Long)(ts: V => Long): EventTimeWindow[V] =
      EventTimeWindow(sizeMs, slideMs, ts)
  }

  /** Event-time session windows with a max-gap: a new session starts when
    * the inter-event gap is >= `gapMs`. The reference's SessionWindow is
    * processing-time (descr/session.rs:39-43); we use event time — the
    * documented divergence (SURVEY §7.4), matching Spark's `session_window`. */
  final case class SessionWindow[V](gapMs: Long, tsMillis: V => Long) extends WindowDescr[V] {
    // gapMs <= 0 would make EVERY element its own session, with sessions
    // sharing a head timestamp COLLIDING on the session id (windowJoin's
    // per-id map keeps one and silently drops the rest) — reject up front
    require(gapMs > 0, s"SessionWindow needs gapMs > 0, got $gapMs")
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] = {
      val sorted = elems.sortBy(tsMillis)
      if (sorted.isEmpty) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(sorted.head))
        for (e <- sorted.tail) {
          if (tsMillis(e) - tsMillis(out.last.last) >= gapMs)
            out += scala.collection.mutable.ArrayBuffer(e)
          else out.last += e
        }
        out.iterator.map(_.toIndexedSeq)
      }
    }
    override def assignWithId(elems: IndexedSeq[V]): Iterator[(Long, IndexedSeq[V])] =
      assign(elems).map(w => (tsMillis(w.head), w)) // session id = its start
  }

  /** One window over everything (reference: descr/all.rs:53-60). In batch,
    * processing-time windows also collapse to this (a batch is one instant of
    * wall-clock time; reference: descr/processing_time.rs). */
  final case class AllWindow[V]() extends WindowDescr[V] {
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] =
      if (elems.isEmpty) Iterator.empty else Iterator.single(elems)
    override def elementWindows: Option[V => Iterator[Long]] =
      Some(_ => Iterator.single(0L))
  }

  /** Batch alias for ProcessingTimeWindow — see [[AllWindow]]. */
  def processingTime[V](): WindowDescr[V] = AllWindow[V]()

  /** User-signal transaction windows (reference: descr/transaction.rs:100-131,
    * semantics at :99-113): one active window per key; `logic` decides per
    * element: Continue, Commit (element included, output emitted), Discard
    * (window dropped), CommitAfter(t) (commit once event time passes t —
    * the watermark analog in batch is a later element's timestamp). */
  sealed trait TransactionOp extends Serializable
  case object Continue extends TransactionOp
  case object Commit extends TransactionOp
  case object Discard extends TransactionOp
  final case class CommitAfter(tsMillis: Long) extends TransactionOp

  final case class TransactionWindow[V, B](logic: V => TransactionOp,
      tsMillis: V => Long, order: V => B)(implicit val ord: Ordering[B])
      extends WindowDescr[V] {
    def assign(elems: IndexedSeq[V]): Iterator[IndexedSeq[V]] = {
      val sorted = elems.sortBy(order)(ord)
      val out = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[V]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[V]
      var commitAt: Option[Long] = None
      for (e <- sorted) {
        // watermark passes: a pending CommitAfter fires before this element
        if (commitAt.exists(t => tsMillis(e) > t)) {
          if (cur.nonEmpty) out += cur.toIndexedSeq
          cur = scala.collection.mutable.ArrayBuffer.empty[V]
          commitAt = None
        }
        cur += e
        logic(e) match {
          case Continue => ()
          case Commit =>
            out += cur.toIndexedSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[V]
            commitAt = None
          case Discard =>
            cur = scala.collection.mutable.ArrayBuffer.empty[V]
            commitAt = None
          case CommitAfter(t) => commitAt = Some(t)
        }
      }
      if (commitAt.isDefined && cur.nonEmpty) out += cur.toIndexedSeq
      out.iterator
    }
  }
}

/** A keyed stream with a window descriptor attached — the analog of the
  * reference's `WindowedStream` (src/stream.rs:92-101). Aggregators mirror
  * the reference's `WindowAccumulator` suite (src/operator/window/aggr/). */
final class WindowedStream[K, V](val ks: KeyedStream[K, V], val descr: WindowDescr[V])
    extends Serializable {

  /** The general collect-then-map aggregator (reference: aggr/collect.rs:47):
    * everything below is sugar over it. */
  def mapWindow[O](f: IndexedSeq[V] => O)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], eko: Encoder[(K, O)]): Stream[(K, O)] =
    new Stream(ks.ds.groupByKey(_._1).flatMapGroups { (k: K, it: Iterator[(K, V)]) =>
      descr.assign(it.map(_._2).toIndexedSeq).map(w => (k, f(w)))
    })

  /** Incremental per-window fold for order-insensitive aggregators:
    * O(#windows) state per key instead of O(#elements) — removes the
    * hot-key OOM cliff of the collect path for descriptors that can assign
    * per element (event-time, all). Seeds each window's accumulator from
    * its first element; falls back to the collect path otherwise. Folds in
    * arrival order, which is why only order-insensitive aggregators
    * (sum/count/min/max) route here. */
  private def aggWindow[A](seed: V => A, step: (A, V) => A,
      whole: IndexedSeq[V] => A)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], eka: Encoder[(K, A)]): Stream[(K, A)] =
    descr.elementWindows match {
      case Some(ew) =>
        new Stream(ks.ds.groupByKey(_._1).flatMapGroups { (k: K, it: Iterator[(K, V)]) =>
          val accs = scala.collection.mutable.HashMap.empty[Long, A]
          it.foreach { case (_, v) =>
            ew(v).foreach { w =>
              accs.update(w,
                accs.get(w) match { case Some(a) => step(a, v); case None => seed(v) })
            }
          }
          accs.toSeq.sortBy(_._1).iterator.map { case (_, a) => (k, a) }
        })
      case None => mapWindow(whole)
    }

  /** reference: aggr/fold.rs:126. (Stays on the collect path: an arbitrary
    * fold is order-sensitive and the batch contract folds in key order.) */
  def fold[A](init: A)(f: (A, V) => A)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], eka: Encoder[(K, A)]): Stream[(K, A)] =
    mapWindow(w => w.foldLeft(init)(f))

  /** reference: aggr/sum.rs:14. Fractional sums stay on the (key-ordered)
    * collect path: the incremental fold adds in arrival order, which is
    * nondeterministic across runs for floating point — integral sums are
    * order-exact and take the bounded-memory path. */
  def sum[N](get: V => N)(implicit num: Numeric[N], ek: Encoder[K],
      ekv: Encoder[(K, V)], ekn: Encoder[(K, N)]): Stream[(K, N)] =
    num match {
      case _: Fractional[_] => mapWindow(w => w.iterator.map(get).sum)
      case _ =>
        aggWindow[N](get, (a, v) => num.plus(a, get(v)), w => w.iterator.map(get).sum)
    }

  /** reference: aggr/count.rs:30. */
  def count(implicit ek: Encoder[K], ekv: Encoder[(K, V)],
      ekl: Encoder[(K, Long)]): Stream[(K, Long)] =
    aggWindow[Long](_ => 1L, (a, _) => a + 1L, _.length.toLong)

  /** reference: aggr/max.rs:14 / min.rs:14. */
  def max[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)], ekb: Encoder[(K, B)]): Stream[(K, B)] =
    aggWindow[B](get, (a, v) => ord.max(a, get(v)), w => w.iterator.map(get).max)

  def min[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)], ekb: Encoder[(K, B)]): Stream[(K, B)] =
    aggWindow[B](get, (a, v) => ord.min(a, get(v)), w => w.iterator.map(get).min)

  /** arg-max/arg-min by projection (reference: aggr/max.rs:31,43). */
  def maxBy[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)]): Stream[(K, V)] = mapWindow(w => w.maxBy(get))

  def minBy[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)]): Stream[(K, V)] = mapWindow(w => w.minBy(get))

  /** reference: aggr/nth.rs:52,65 first.rs / last.rs. */
  def first(implicit ek: Encoder[K], ekv: Encoder[(K, V)]): Stream[(K, V)] =
    mapWindow(_.head)

  def last(implicit ek: Encoder[K], ekv: Encoder[(K, V)]): Stream[(K, V)] =
    mapWindow(_.last)

  def nth(n: Int)(implicit ek: Encoder[K], ekv: Encoder[(K, V)],
      eko: Encoder[(K, Option[V])]): Stream[(K, Option[V])] =
    mapWindow(w => w.lift(n))

  /** reference: aggr/collect_vec.rs:56. */
  def toVec(implicit ek: Encoder[K], ekv: Encoder[(K, V)],
      eks: Encoder[(K, Seq[V])]): Stream[(K, Seq[V])] =
    mapWindow(w => w: Seq[V])

  /** Fold seeded by the window's FIRST element — no separate `init`, the
    * accumulator type is the element type (reference: aggr/fold.rs:142
    * `fold_first`). Empty windows produce no output row (a window only
    * exists once an element is assigned to it, so the head always exists).
    * Stays on the collect path like [[fold]]: an arbitrary combine is
    * order-sensitive and the batch contract folds in key order. */
  def foldFirst(f: (V, V) => V)(implicit ek: Encoder[K],
      ekv: Encoder[(K, V)]): Stream[(K, V)] =
    mapWindow(w => w.tail.foldLeft(w.head)(f))

  /** Struct-of-arrays per window (reference: aggr/columnar.rs:51
    * `to_arrow`): transposes a window of tuples into a tuple of columns —
    * e.g. a window of `(Int, String)` becomes one `(Seq[Int], Seq[String])`
    * row. The columnar shape is what a per-window vectorized kernel (or an
    * Arrow hand-off) consumes; Spark's own Tungsten format stays columnar
    * underneath either way, so this is a LAYOUT contract, not a performance
    * fork — which is why it is sugar over [[mapWindow]]. Scalar element
    * types degrade to the single-column `Seq[V]` (≡ [[toVec]]). */
  def toColumnar[C](implicit soa: Windowing.StructOfArrays[V, C],
      ek: Encoder[K], ekv: Encoder[(K, V)], ekc: Encoder[(K, C)]): Stream[(K, C)] =
    mapWindow(soa.transpose)

  /** Per-key per-window cartesian product with another keyed stream sharing
    * the same descriptor semantics (reference: window `join`,
    * src/operator/window/aggr/join.rs:79-99). Implemented as a cogroup: both
    * sides' elements of a key are windowed together by window index. */
  def windowJoin[V2](other: KeyedStream[K, V2], descr2: WindowDescr[V2])(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], ekv2: Encoder[(K, V2)],
      eout: Encoder[(K, (V, V2))]): Stream[(K, (V, V2))] = {
    val leftG = ks.ds.groupByKey(_._1)
    val rightG = other.ds.groupByKey(_._1)
    new Stream(leftG.cogroup(rightG) { (k, lit, rit) =>
      // pair windows by identity, not position — an empty window on one
      // side must not shift the alignment (time descriptors use the window
      // start as id, count descriptors the window index)
      val lw = descr.assignWithId(lit.map(_._2).toIndexedSeq).toMap
      val rw = descr2.assignWithId(rit.map(_._2).toIndexedSeq).toMap
      lw.keySet.intersect(rw.keySet).toSeq.sorted.iterator.flatMap { id =>
        for (a <- lw(id).iterator; b <- rw(id)) yield (k, (a, b))
      }
    })
  }
}

/** Companion utilities for the windowing layer. */
object Windowing {

  /** Evidence that a window of `V`s transposes to the struct-of-arrays
    * value `C` — the typed analog of the reference's `Extend<Out> + Default`
    * collection bound on `to_arrow` (aggr/columnar.rs:51). Tuple elements
    * transpose column-wise; any scalar falls back to a single column. */
  sealed trait StructOfArrays[V, C] extends Serializable {
    def transpose(w: IndexedSeq[V]): C
  }

  object StructOfArrays extends LowPriorityStructOfArrays {
    implicit def pair[A, B]: StructOfArrays[(A, B), (Seq[A], Seq[B])] =
      new StructOfArrays[(A, B), (Seq[A], Seq[B])] {
        def transpose(w: IndexedSeq[(A, B)]): (Seq[A], Seq[B]) =
          (w.map(_._1), w.map(_._2))
      }

    implicit def triple[A, B, C]: StructOfArrays[(A, B, C), (Seq[A], Seq[B], Seq[C])] =
      new StructOfArrays[(A, B, C), (Seq[A], Seq[B], Seq[C])] {
        def transpose(w: IndexedSeq[(A, B, C)]): (Seq[A], Seq[B], Seq[C]) =
          (w.map(_._1), w.map(_._2), w.map(_._3))
      }
  }

  sealed trait LowPriorityStructOfArrays {
    /** Scalar elements: the struct-of-arrays of one column is that column. */
    implicit def scalar[A]: StructOfArrays[A, Seq[A]] =
      new StructOfArrays[A, Seq[A]] {
        def transpose(w: IndexedSeq[A]): Seq[A] = w
      }
  }
}
