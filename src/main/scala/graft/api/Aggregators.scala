package graft.api

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s backing the keyed fold/reduce surface. A typed
  * `Aggregator` is Spark's native partial/final aggregation shell — the exact
  * analog of the reference's local→global `group_by_fold` design
  * (reference: src/operator/mod.rs:822-854): `reduce` is the local fold,
  * `merge` the global fold, and Catalyst runs them map-side/reduce-side
  * automatically.
  */
object Aggregators {

  /** General fold aggregator: zero/local/global supplied by the user —
    * the reference's `group_by_fold` triple. */
  def foldAgg[T, A](init: A, local: (A, T) => A, global: (A, A) => A)(
      implicit ea: Encoder[A]): Aggregator[T, A, A] =
    new Aggregator[T, A, A] {
      def zero: A = init
      def reduce(b: A, a: T): A = local(b, a)
      def merge(b1: A, b2: A): A = global(b1, b2)
      def finish(r: A): A = r
      def bufferEncoder: Encoder[A] = ea
      def outputEncoder: Encoder[A] = ea
    }

  /** Reduce aggregator over Option[T] buffer (reference: `group_by_reduce`,
    * src/operator/mod.rs:1693). */
  def reduceAgg[T](f: (T, T) => T)(implicit et: Encoder[T], eo: Encoder[Option[T]]): Aggregator[T, Option[T], T] =
    new Aggregator[T, Option[T], T] {
      def zero: Option[T] = None
      def reduce(b: Option[T], a: T): Option[T] = b.map(f(_, a)).orElse(Some(a))
      def merge(a: Option[T], b: Option[T]): Option[T] =
        (a, b) match {
          case (Some(x), Some(y)) => Some(f(x, y))
          case (x, None) => x
          case (None, y) => y
        }
      def finish(r: Option[T]): T = r.get
      def bufferEncoder: Encoder[Option[T]] = eo
      def outputEncoder: Encoder[T] = et
    }

  /** Bounded top-k by `sortKey` (descending), as a partial/final aggregate:
    * each map task keeps at most k elements per key, so the shuffle moves
    * O(k · partitions) rows per key instead of the whole group — the
    * scale-correct per-group top-k (the window `row_number` lowering sorts
    * and shuffles every row of every group). Ties in `sortKey` keep
    * whichever element a partial saw first; pass a totally-ordering key for
    * a deterministic result. */
  def topKAgg[T, B](k: Int, sortKey: T => B)(implicit ord: Ordering[B],
      es: Encoder[Seq[T]]): Aggregator[T, Seq[T], Seq[T]] =
    new Aggregator[T, Seq[T], Seq[T]] {
      require(k > 0, s"topK needs k > 0, got $k")
      private def trim(s: Seq[T]): Seq[T] =
        s.sortBy(sortKey)(ord.reverse).take(k)
      def zero: Seq[T] = Seq.empty
      def reduce(b: Seq[T], a: T): Seq[T] =
        // avoid the O(k log k) re-sort when the buffer is full and the new
        // element can't place — the common case on large groups
        if (b.length == k && ord.lteq(sortKey(a), sortKey(b.last))) b
        else trim(b :+ a)
      def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = trim(b1 ++ b2)
      def finish(r: Seq[T]): Seq[T] = r
      def bufferEncoder: Encoder[Seq[T]] = es
      def outputEncoder: Encoder[Seq[T]] = es
    }

  /** Numeric sum of a projection (reference: `group_by_sum`, src/operator/mod.rs:1467). */
  def sumAgg[T, N](get: T => N)(implicit num: Numeric[N], en: Encoder[N]): Aggregator[T, N, N] =
    new Aggregator[T, N, N] {
      def zero: N = num.zero
      def reduce(b: N, a: T): N = num.plus(b, get(a))
      def merge(a: N, b: N): N = num.plus(a, b)
      def finish(r: N): N = r
      def bufferEncoder: Encoder[N] = en
      def outputEncoder: Encoder[N] = en
    }

  /** Running (sum, count) → avg (reference: `group_by_avg`, src/operator/mod.rs:1531). */
  def avgAgg[T](get: T => Double): Aggregator[T, (Double, Long), Double] =
    new Aggregator[T, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: T): (Double, Long) = (b._1 + get(a), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
      def finish(r: (Double, Long)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** count (reference: `group_by_count`, src/operator/mod.rs:1594). */
  def countAgg[T]: Aggregator[T, Long, Long] =
    new Aggregator[T, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: T): Long = b + 1
      def merge(a: Long, b: Long): Long = a + b
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** arg-max of the whole element by a projection (reference:
    * `group_by_max_element`, src/operator/mod.rs:1418). Ties break toward the
    * first-seen element in partition order; callers needing determinism should
    * use a unique projection. */
  def maxByAgg[T, B](get: T => B)(implicit ord: Ordering[B], et: Encoder[T], eo: Encoder[Option[T]]): Aggregator[T, Option[T], T] =
    reduceAgg[T]((a, b) => if (ord.gteq(get(a), get(b))) a else b)

  /** arg-min (reference: `group_by_min_element`, src/operator/mod.rs:1636). */
  def minByAgg[T, B](get: T => B)(implicit ord: Ordering[B], et: Encoder[T], eo: Encoder[Option[T]]): Aggregator[T, Option[T], T] =
    reduceAgg[T]((a, b) => if (ord.lteq(get(a), get(b))) a else b)
}
