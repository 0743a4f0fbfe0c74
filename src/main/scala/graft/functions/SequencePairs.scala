package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skip-gram training-pair generation over per-key ordered sequences —
  * the word2vec/item2vec data step: for every element, its neighbors
  * within ±`window` positions become (target, context, offset) pairs.
  * Runs over event streams (per-user behavior sequences), token streams,
  * or any (key, order, item) shape.
  *
  * Scale shape: positions come from a per-KEY window (state bounded by
  * one key's activity, the partitionBy guarantees no one-task global
  * sort); pairing is NOT a per-key self-join (which fans out
  * quadratically in key activity) but an offset EXPLODE — each position
  * row emits its 2·window wanted neighbor positions, resolved by ONE
  * (key, position) equi-join. Volume is exactly rows·2·window, a
  * constant multiple of the input at any key skew. */
object SequencePairs {

  /** (target, context, offset, n) counts of co-occurring items at each
    * relative position in [−window, window] \ {0}, sequences ordered per
    * `keyCol` by `orderCols` (make the order total per key — ties would
    * make positions nondeterministic). */
  def skipGramCounts(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      itemCol: String, window: Int): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val w = Window.partitionBy(col("k")).orderBy(orderCols: _*)
    val pos = df
      .select((Seq(col(keyCol).as("k"), col(itemCol).as("item")) ++ orderCols): _*)
      .withColumn("pos", row_number().over(w))
      .select(col("k"), col("item"), col("pos"))
    val offsets = ((-window to -1) ++ (1 to window)).map(lit(_))
    val wanted = pos
      .select(col("k"), col("item").as("target"), col("pos"),
        explode(array(offsets: _*)).as("offset"))
      .withColumn("b_pos", col("pos") + col("offset"))
    wanted.join(pos.select(col("k"), col("item").as("context"),
        col("pos").as("b_pos")), Seq("k", "b_pos"))
      .groupBy(col("target"), col("context"),
        col("offset").cast("long").as("offset"))
      .agg(count(lit(1)).as("n"))
  }
}
