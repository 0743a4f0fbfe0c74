package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Item co-occurrence mining — the "bought/clicked/cited together"
  * primitive behind recommendation candidates, related-item panels, and
  * co-citation graphs: for every item pair sharing a basket (order,
  * session, document), how many baskets, and how associated.
  *
  * The naive lowering is a basket self-join — quadratic in the LARGEST
  * basket, which at corpus scale means one pathological session (a
  * crawler account touching every item) manufactures billions of pairs.
  * The scale discipline here:
  *
  *  1. (basket, item) pairs dedup first — multiplicity inside a basket
  *     must not inflate counts (and dedup shrinks everything downstream);
  *  2. baskets larger than `maxBasketSize` are DROPPED WHOLE (the
  *     standard market-basket practice: a basket that big is a bot or a
  *     feed, and its pairs are noise) — this caps the per-basket
  *     quadratic at maxBasketSize², making worst-case fan-out a
  *     constant, not data-dependent;
  *  3. ONE basket-keyed exchange carries the whole per-basket phase:
  *     `HashPartitioning(bk)` satisfies the (bk, it) dedup's clustering,
  *     the size filter and the ≤cap-bounded item-array collect, so
  *     dedup → cap → collect all run partition-local on it. Pairs are
  *     then EXPANDED MAP-SIDE from each basket's sorted array (nested
  *     `transform` over array slices — pure codegen'd builtins, ≤cap²/2
  *     structs per basket) and only the (a, b, 1) rows shuffle, keyed by
  *     the pair, with partial aggregation collapsing duplicates map-side.
  *     The self-join the expansion replaces paid a second full exchange
  *     of the (basket, item) table.
  *
  * Association scores divide exact integer counts once in double, in a
  * fixed operation order, so the SQL oracle reproduces them
  * bit-for-bit.
  */
object CoOccurrence {

  /** Deduped, size-capped baskets as (bk, its) with `its` the SORTED
    * distinct item array (≤ maxBasketSize elements — bounded state, the
    * cap filter runs before the collect). One exchange total. */
  private def keptBaskets(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2, s"need baskets of >= 2 items, got $maxBasketSize")
    val bi0 = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
    // the ONE shuffle: everything after it is clustered by bk
    val bi = bi0.repartition(col("bk")).dropDuplicates("bk", "it")
    val sized = bi.groupBy(col("bk")).agg(count(lit(1)).as("bk_n"))
      .filter(col("bk_n") <= maxBasketSize)
    bi.join(sized.select(col("bk")), Seq("bk"), "left_semi")
      .groupBy(col("bk")).agg(sort_array(collect_set(col("it"))).as("its"))
  }

  /** Map-side pair expansion: all (a < b) item pairs of each basket's
    * sorted array. `explode` drops size-1 baskets' empty arrays. */
  private def expandPairs(baskets: DataFrame): DataFrame = {
    val its = col("its")
    val pairsArr = flatten(transform(its, (x, i) =>
      transform(slice(its, i + lit(2), greatest(size(its) - i - lit(1), lit(0))),
        y => struct(x.as("a_item"), y.as("b_item")))))
    baskets.select(explode(pairsArr).as("p"))
      .select(col("p.a_item").as("a_item"), col("p.b_item").as("b_item"))
  }

  /** The lean pair-count core: co-occurring item pairs (a_item < b_item)
    * with `n_ab` = number of shared baskets — the edge list the graph
    * algorithms (communities, k-core, clustering) consume. No item
    * marginals, no basket total: callers that don't need association
    * scores skip those aggregates entirely. */
  def pairCounts(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 100, minCount: Long = 1L): DataFrame =
    expandPairs(keptBaskets(df, basketCol, itemCol, maxBasketSize))
      .groupBy(col("a_item"), col("b_item"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)

  /** All co-occurring item pairs (a_item < b_item): `n_ab` baskets
    * containing both, each item's own basket count, and two exact-ratio
    * association scores — Jaccard n_ab/(n_a+n_b−n_ab) and lift
    * n_ab·N/(n_a·n_b) with N the number of surviving baskets (a 1-row
    * broadcast scalar epilogue, not a driver-side count job). */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 100, minCount: Long = 1L): DataFrame = {
    val baskets = keptBaskets(df, basketCol, itemCol, maxBasketSize)
    val ab = expandPairs(baskets)
      .groupBy(col("a_item"), col("b_item"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val itemN = baskets.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    ab
      .join(itemN.select(col("it").as("a_item"), col("n_it").as("n_a")), "a_item")
      .join(itemN.select(col("it").as("b_item"), col("n_it").as("n_b")), "b_item")
      .crossJoin(broadcast(nb))
      .select(col("a_item"), col("b_item"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double")).as("jaccard"),
        (col("n_ab").cast("double") * col("n_baskets").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** Top-k most associated partners per item by (n_ab, partner id) — the
    * related-items panel. A per-item window top-k over the pair table
    * (symmetrized first so every item sees all its partners); Spark
    * lowers the rank-filter to WindowGroupLimit, so each partition keeps
    * k rows per item before the exchange. */
  def topPartners(pairTable: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val sym = pairTable
      .select(col("a_item").as("item"), col("b_item").as("partner"), col("n_ab"))
      .unionByName(pairTable
        .select(col("b_item").as("item"), col("a_item").as("partner"), col("n_ab")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("n_ab").desc, col("partner"))
    sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("item"), col("partner"), col("n_ab"), col("rk").cast("long").as("rk"))
  }
}
