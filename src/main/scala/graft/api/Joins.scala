package graft.api

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.{broadcast => bcast, col}

/** Typed equi-join strategy builder — the analog of the reference's join API
  * (reference: src/operator/join/mod.rs:230-266): `join_with(rhs, k1, k2)` →
  * ship strategy → local strategy → variant.
  *
  * Strategy mapping:
  *  - `ship_hash` (join/ship.rs:30) → Spark shuffle join (default).
  *  - `ship_broadcast_right` (join/ship.rs:45) → `broadcast()` hint on the
  *    right side.
  *  - `local_hash` vs `local_sort_merge` (join/local_hash.rs,
  *    local_sort_merge.rs) → Catalyst picks SHJ/SMJ by cost; the builder's
  *    choice becomes a preference hint, not an obligation — at 100 TB letting
  *    AQE decide per-partition beats a static user choice.
  *
  * Variants: inner / left (`(T1, Option[T2])`) / full outer
  * (`(Option[T1], Option[T2])`) — exactly the reference's surface (no right
  * join: "switch the sides", join/mod.rs:49-52).
  */
final class JoinBuilder[T1, T2, K](left: Dataset[(K, T1)], right: Dataset[(K, T2)],
    broadcastRight: Boolean) {

  private def rhs = if (broadcastRight) bcast(right) else right

  /** ship strategy selectors (fluent, reference join/mod.rs:307,320) */
  def shipHash: JoinBuilder[T1, T2, K] = new JoinBuilder(left, right, false)
  def shipBroadcastRight: JoinBuilder[T1, T2, K] = new JoinBuilder(left, right, true)

  /** local strategy selectors — hints only (see class doc). */
  def localHash: JoinBuilder[T1, T2, K] = this
  def localSortMerge: JoinBuilder[T1, T2, K] = this

  /** inner join (reference: join/mod.rs:115-131). */
  def inner(implicit e: Encoder[(K, (T1, T2))]): Stream[(K, (T1, T2))] =
    new Stream(left.joinWith(rhs, left("_1") === right("_1"), "inner")
      .map { case ((k, a), (_, b)) => (k, (a, b)) })

  /** left outer join → (T1, Option[T2]) (reference: join/mod.rs:163-179). */
  def leftOuter(implicit e: Encoder[(K, (T1, Option[T2]))]): Stream[(K, (T1, Option[T2]))] =
    new Stream(left.joinWith(rhs, left("_1") === right("_1"), "left_outer")
      .map { case ((k, a), r) => (k, (a, Option(r).map(_._2))) })

  /** full outer join → (Option[T1], Option[T2]) (reference: join/mod.rs:212-228). */
  def fullOuter(implicit e: Encoder[(K, (Option[T1], Option[T2]))]): Stream[(K, (Option[T1], Option[T2]))] =
    new Stream(left.joinWith(rhs, left("_1") === right("_1"), "full_outer")
      .map { case (l, r) =>
        val k = Option(l).map(_._1).getOrElse(r._1)
        (k, (Option(l).map(_._2), Option(r).map(_._2)))
      })
}

object Joins {

  /** Entry point: `join(s1, s2)(k1, k2)` (reference: join/mod.rs:115). */
  def joinWith[T1, T2, K](s1: Stream[T1], s2: Stream[T2])(
      k1: T1 => K, k2: T2 => K)(
      implicit e1: Encoder[(K, T1)], e2: Encoder[(K, T2)]): JoinBuilder[T1, T2, K] =
    new JoinBuilder(s1.ds.map(x => (k1(x), x)), s2.ds.map(x => (k2(x), x)), false)

  /** Co-partitioned keyed-stream join (reference: join/keyed_join.rs:408):
    * both sides already (K, V) — join without re-keying. */
  def keyedJoin[K, V1, V2](a: KeyedStream[K, V1], b: KeyedStream[K, V2])(
      implicit e: Encoder[(K, (V1, V2))]): Stream[(K, (V1, V2))] =
    new Stream(a.ds.joinWith(b.ds, a.ds("_1") === b.ds("_1"), "inner")
      .map { case ((k, x), (_, y)) => (k, (x, y)) })

  /** Event-time interval join (reference: interval_join.rs:20-200): left
    * element at ts matches right elements in [ts − lower, ts + upper] on the
    * same key; output timestamp = max of the pair (interval_join.rs:113-120).
    *
    * Batch lowering: the event times are stamped into columns by ONE narrow
    * map per side, then key equality AND the range residual go into the join
    * condition itself — Catalyst plans an equi-join on the key with the range
    * evaluated inside the join on unsafe rows, so non-matching pairs are
    * never deserialized and the residual is visible to the optimizer (the
    * streaming twin, streaming/Streaming.scala intervalJoin, has the same
    * shape). The only typed stage left is the output map, which touches
    * output-sized data. JoinSpec pins the no-post-join-Filter plan. */
  def intervalJoin[K, V1, V2](a: KeyedStream[K, V1], b: KeyedStream[K, V2])(
      ts1: V1 => Long, ts2: V2 => Long)(lowerMs: Long, upperMs: Long)(
      implicit e: Encoder[(K, (Long, V1, V2))], el: Encoder[(K, Long, V1)],
      er: Encoder[(K, Long, V2)]): Stream[(K, (Long, V1, V2))] = {
    val l = a.ds.map { case (k, v) => (k, ts1(v), v) }
    val r = b.ds.map { case (k, v) => (k, ts2(v), v) }
    new Stream(l.joinWith(r,
        l("_1") === r("_1")
          && r("_2") >= l("_2") - lowerMs
          && r("_2") <= l("_2") + upperMs, "inner")
      .map { case ((k, t1, x), (_, t2, y)) => (k, (math.max(t1, t2), x, y)) })
  }
}
