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
  *     must not inflate counts (and dedup shrinks the join input);
  *  2. baskets larger than `maxBasketSize` are DROPPED WHOLE (the
  *     standard market-basket practice: a basket that big is a bot or a
  *     feed, and its pairs are noise) — this caps the per-basket
  *     quadratic at maxBasketSize², making worst-case fan-out a
  *     constant, not data-dependent;
  *  3. the pair aggregate shuffles (a, b, 1) rows keyed by the pair —
  *     partial aggregation collapses duplicates map-side.
  *
  * Association scores divide exact integer counts once in double, in a
  * fixed operation order, so the SQL oracle reproduces them
  * bit-for-bit.
  */
object CoOccurrence {

  /** All co-occurring item pairs (a_item < b_item): `n_ab` baskets
    * containing both, each item's own basket count, and two exact-ratio
    * association scores — Jaccard n_ab/(n_a+n_b−n_ab) and lift
    * n_ab·N/(n_a·n_b) with N the number of surviving baskets. */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 100, minCount: Long = 1L): DataFrame = {
    require(maxBasketSize >= 2, s"need baskets of >= 2 items, got $maxBasketSize")
    val bi = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    val sized = bi.groupBy(col("bk")).agg(count(lit(1)).as("bk_n"))
      .filter(col("bk_n") <= maxBasketSize)
    val kept = bi.join(sized.select(col("bk")), Seq("bk"), "left_semi")
    val itemN = kept.groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    val nBaskets = kept.select(col("bk")).distinct().count()
    val a = kept.select(col("bk"), col("it").as("a_item"))
    val b = kept.select(col("bk"), col("it").as("b_item"))
    val ab = a.join(b, Seq("bk"))
      .filter(col("a_item") < col("b_item"))
      .groupBy(col("a_item"), col("b_item"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    ab
      .join(itemN.select(col("it").as("a_item"), col("n_it").as("n_a")), "a_item")
      .join(itemN.select(col("it").as("b_item"), col("n_it").as("n_b")), "b_item")
      .select(col("a_item"), col("b_item"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double")).as("jaccard"),
        (col("n_ab").cast("double") * lit(nBaskets.toDouble) /
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
