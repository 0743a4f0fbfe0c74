package graft.api

import org.apache.spark.sql.{Column, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** A stream of `(K, V)` pairs logically partitioned by key — the analog of
  * the reference's `KeyedStream` (reference: src/stream.rs:59-67).
  *
  * Spark-first note: the reference shuffles eagerly on `group_by`
  * (src/operator/mod.rs:1377); here keying is a *logical* tag, and the single
  * hash shuffle happens inside whatever keyed aggregation/join follows —
  * Catalyst inserts map-side partial aggregation first, so less data crosses
  * the network than the reference's shuffle-then-fold. At 100 TB this is the
  * difference between shuffling the input and shuffling one row per key.
  */
final class KeyedStream[K, V](val ds: Dataset[(K, V)]) extends Serializable {
  def spark: SparkSession = ds.sparkSession

  private def kvg(implicit ek: Encoder[K], ev: Encoder[(K, V)]) = ds.groupByKey(_._1)

  // --- per-element ops preserving the key (reference keyed variants, §2.3) ---

  /** Reference: keyed `map`, src/operator/mod.rs:2717. */
  def map[O](f: V => O)(implicit e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(ds.map { case (k, v) => (k, f(v)) })

  /** Map with access to the key (reference closures receive `(&K, V)`). */
  def mapWithKey[O](f: (K, V) => O)(implicit e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(ds.map { case (k, v) => (k, f(k, v)) })

  /** Reference: keyed `filter`, src/operator/mod.rs:2546. */
  def filter(p: V => Boolean): KeyedStream[K, V] =
    new KeyedStream(ds.filter(kv => p(kv._2)))

  /** Reference: keyed `filter_map`, src/operator/mod.rs:2517. */
  def filterMap[O](f: V => Option[O])(implicit e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(ds.flatMap { case (k, v) => f(v).map((k, _)).iterator })

  /** Reference: keyed `flat_map`, src/operator/mod.rs:2573. */
  def flatMap[O](f: V => IterableOnce[O])(implicit e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(ds.flatMap { case (k, v) => f(v).iterator.map((k, _)) })

  /** Reference: keyed `flatten`, src/operator/mod.rs:3248. */
  def flatten[O](implicit ev: V <:< IterableOnce[O], e: Encoder[(K, O)]): KeyedStream[K, O] =
    flatMap(v => ev(v))

  /** Stateful per-key map — state lives per key, not per partition
    * (reference: keyed `rich_map`, src/operator/mod.rs:2740). Batch lowering:
    * sort-free mapGroups with a fresh state per key. */
  def richMapPerKey[S, O](init: () => S)(f: (S, V) => O)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(kvg.flatMapGroups { (k: K, it: Iterator[(K, V)]) =>
      val s = init(); it.map { case (_, v) => (k, f(s, v)) }
    })

  /** Reference: keyed `rich_flat_map`, src/operator/mod.rs:2753. */
  def richFlatMapPerKey[S, O](init: () => S)(f: (S, V) => IterableOnce[O])(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(kvg.flatMapGroups { (k: K, it: Iterator[(K, V)]) =>
      val s = init(); it.flatMap { case (_, v) => f(s, v).iterator.map((k, _)) }
    })

  /** Reference: keyed `rich_filter_map`, src/operator/mod.rs:2769. */
  def richFilterMapPerKey[S, O](init: () => S)(f: (S, V) => Option[O])(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], e: Encoder[(K, O)]): KeyedStream[K, O] =
    new KeyedStream(kvg.flatMapGroups { (k: K, it: Iterator[(K, V)]) =>
      val s = init(); it.flatMap { case (_, v) => f(s, v).map((k, _)).iterator }
    })

  /** Side-effecting peek (reference: keyed `inspect`, src/operator/mod.rs:2597). */
  def inspect(f: ((K, V)) => Unit)(implicit ekv: Encoder[(K, V)]): KeyedStream[K, V] =
    new KeyedStream(ds.map { kv => f(kv); kv })

  // --- key plumbing ---

  /** KeyedStream → Stream of pairs (reference: `unkey`, src/operator/mod.rs:2808). */
  def unkey: Stream[(K, V)] = new Stream(ds)

  /** Drop key, keep values (reference: `drop_key`, src/operator/mod.rs:2830). */
  def dropKey(implicit e: Encoder[V]): Stream[V] = new Stream(ds.map(_._2))

  /** Random repartition, breaking keying (reference: keyed `shuffle`, src/operator/mod.rs:2950). */
  def shuffle: Stream[(K, V)] = new Stream(ds.repartition())

  /** Physically co-locate each key's elements on one partition (the
    * reference's eager `group_by` shuffle). Only needed before raw
    * partition-level logic — keyed aggregations and per-key rich variants
    * group correctly without it and shuffle less. */
  def partitionByKey(numPartitions: Int = 0): KeyedStream[K, V] =
    new KeyedStream(
      if (numPartitions > 0) ds.repartition(numPartitions, org.apache.spark.sql.functions.col("_1"))
      else ds.repartition(org.apache.spark.sql.functions.col("_1")))

  /** Union with another keyed stream (reference: keyed `merge`, src/operator/mod.rs:2912). */
  def merge(other: KeyedStream[K, V]): KeyedStream[K, V] =
    new KeyedStream(ds.union(other.ds))

  // --- keyed aggregations (§2.5) ---

  /** Per-key fold (reference: keyed `fold`, src/operator/mod.rs:2641;
    * keyed_fold.rs keeps a hashmap of per-key accumulators after the shuffle).
    * Lowered to a typed Aggregator → partial+final HashAggregate; same result,
    * strictly less data shuffled. Requires `local` to tolerate partial runs;
    * for the general non-commutative case use [[foldSorted]]. */
  def fold[A](init: A)(local: (A, V) => A, global: (A, A) => A)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], ea: Encoder[A],
      eka: Encoder[(K, A)]): Stream[(K, A)] = {
    val agg = Aggregators.foldAgg[(K, V), A](init, (a, kv) => local(a, kv._2), global)
    new Stream(kvg.agg(agg.toColumn.name("agg")).toDF("_1", "_2").as[(K, A)])
  }

  /** Order-sensitive per-key fold: groups are folded sequentially in `sortBy`
    * order within each key — matches the reference's single-pass keyed fold
    * when element order matters. */
  def foldSorted[A, B](init: A)(sortKey: V => B)(f: (A, V) => A)(
      implicit ord: Ordering[B], ek: Encoder[K], ekv: Encoder[(K, V)],
      eka: Encoder[(K, A)]): Stream[(K, A)] =
    new Stream(kvg.mapGroups { (k, it) =>
      (k, it.map(_._2).toSeq.sortBy(sortKey).foldLeft(init)(f))
    })

  /** Pre-aggregated keyed fold — the reference's `group_by_fold`
    * (src/operator/mod.rs:822): local fold per partition, hash shuffle of
    * accumulators, global fold. Exactly a typed Aggregator. */
  def groupByFold[A](init: A)(local: (A, V) => A, global: (A, A) => A)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], ea: Encoder[A],
      eka: Encoder[(K, A)]): Stream[(K, A)] = fold(init)(local, global)

  /** Reference: keyed `reduce`, src/operator/mod.rs:2686 / `group_by_reduce`,
    * :1693. `reduceGroups` is Spark's partial-aggregating typed reduce — the
    * pre-aggregated local→global design for free. */
  def reduce(f: (V, V) => V)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)]): Stream[(K, V)] =
    new Stream(kvg.reduceGroups((a, b) => (a._1, f(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) })

  /** Reference: `group_by_sum`, src/operator/mod.rs:1467. */
  def sum[N](get: V => N)(implicit num: Numeric[N], en: Encoder[N],
      ek: Encoder[K], ekv: Encoder[(K, V)], ekn: Encoder[(K, N)]): Stream[(K, N)] = {
    val agg = Aggregators.sumAgg[(K, V), N](kv => get(kv._2))
    new Stream(kvg.agg(agg.toColumn.name("sum")).toDF("_1", "_2").as[(K, N)])
  }

  /** Reference: `group_by_avg`, src/operator/mod.rs:1531. */
  def avg(get: V => Double)(implicit ek: Encoder[K], ekv: Encoder[(K, V)],
      ekd: Encoder[(K, Double)]): Stream[(K, Double)] = {
    val agg = Aggregators.avgAgg[(K, V)](kv => get(kv._2))
    new Stream(kvg.agg(agg.toColumn.name("avg")).toDF("_1", "_2").as[(K, Double)])
  }

  /** Reference: `group_by_count`, src/operator/mod.rs:1594. */
  def count(implicit ek: Encoder[K], ekv: Encoder[(K, V)],
      ekl: Encoder[(K, Long)]): Stream[(K, Long)] =
    new Stream(kvg.agg(Aggregators.countAgg[(K, V)].toColumn.name("n"))
      .toDF("_1", "_2").as[(K, Long)])

  /** Reference: `group_by_max_element`, src/operator/mod.rs:1418. */
  def maxElement[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)]): Stream[(K, V)] =
    reduce((a, b) => if (ord.gteq(get(a), get(b))) a else b)

  /** Reference: `group_by_min_element`, src/operator/mod.rs:1636. */
  def minElement[B](get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)]): Stream[(K, V)] =
    reduce((a, b) => if (ord.lteq(get(a), get(b))) a else b)

  /** Per-key top-k by `get` (descending), k largest elements per key in
    * descending order (beyond-reference: the keyed analog of global
    * `sorted_limit_by`, declared src/operator/mod.rs:1317, operator in
    * src/operator/limit_sorted.rs). Bounded-buffer aggregator —
    * map-side partials cap at k elements, so hot keys never shuffle their
    * whole group (the window-function lowering sorts and moves every row). */
  def topK[B](k: Int)(get: V => B)(implicit ord: Ordering[B], ek: Encoder[K],
      ekv: Encoder[(K, V)], eskv: Encoder[Seq[(K, V)]],
      eks: Encoder[(K, Seq[V])]): Stream[(K, Seq[V])] = {
    // aggregate over (K,V) pairs, then strip the key from each element
    val agg = Aggregators.topKAgg[(K, V), B](k, kv => get(kv._2))
    new Stream(kvg.agg(agg.toColumn.name("agg"))
      .map { case (key, items) => (key, items.map(_._2)) })
  }

  /** Per-key distinct values (reference: `unique_assoc_by_key`, src/operator/mod.rs:951-1017). */
  def unique: KeyedStream[K, V] = new KeyedStream(ds.distinct())

  /** Keyed two-pass scan — per-key aggregate then map each element with its
    * key's aggregate (reference: keyed `fold_scan`, src/operator/mod.rs:2954).
    * Lowered to agg + shuffle-join on the key (both sides hash-partitioned on
    * k, so AQE can plan a co-located join; for low-cardinality keys the agg
    * side is tiny and broadcasts). */
  def foldScan[A, O](init: A)(local: (A, V) => A, global: (A, A) => A)(
      project: (A, V) => O)(
      implicit ek: Encoder[K], ekv: Encoder[(K, V)], ea: Encoder[A],
      eka: Encoder[(K, A)], eko: Encoder[(K, O)]): KeyedStream[K, O] = {
    val aggDs = fold(init)(local, global).ds
    val joined = ds.joinWith(aggDs, ds("_1") === aggDs("_1"), "inner")
    new KeyedStream(joined.map { case ((k, v), (_, a)) => (k, project(a, v)) })
  }

  // --- windows (§2.9) ---

  /** Attach a window descriptor (reference: `window()`, src/operator/window/mod.rs:311). */
  def window(descr: WindowDescr[V]): WindowedStream[K, V] =
    new WindowedStream(this, descr)

  // --- sinks ---
  def collectVec(): Seq[(K, V)] = ds.collect().toSeq
  def collectCount(): Long = ds.count()
  def forEach(f: ((K, V)) => Unit): Unit = ds.foreach(kv => f(kv))
}
