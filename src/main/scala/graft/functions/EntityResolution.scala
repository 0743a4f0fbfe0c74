package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by graded string similarity — record linkage over
  * name-like columns (merchant/product/author canonicalization before
  * joining corpora). [[FuzzyJoin]] answers "within edit distance 1";
  * this family answers "how alike" with Jaro–Winkler, whose prefix
  * boost matches how real-world identifiers diverge (typos concentrate
  * late in the string).
  *
  * Scale shape: the naive form is the all-pairs cross join. Here
  * candidates come from STANDARD BLOCKING — pairs must share a block
  * key (by default the 2-byte prefix) — so the quadratic is bounded per
  * block, the shuffle carries (block, id, string) rows, and the score
  * runs only on co-blocked pairs. Blocking is part of the operator's
  * SPEC (the oracle replays it): like every ER blocking scheme it
  * trades recall for tractability — a pair differing in its first two
  * bytes is not a candidate. Use two passes with different keys (e.g.
  * prefix + suffix) when that recall matters.
  */
object EntityResolution {

  /** Jaro–Winkler similarity of two string columns, in [0,1] — a native
    * expression ([[graft.plans.JaroWinklerExpr]]), byte-oriented,
    * DuckDB-compatible semantics. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.JaroWinklerExpr(
      ColumnBridge.expr(a.cast("string")), ColumnBridge.expr(b.cast("string"))))
  }

  /** Blocked similarity self-join: all id pairs (a_id < b_id) sharing a
    * `blockLen`-byte prefix whose Jaro–Winkler similarity, rounded to
    * `dp` decimals, reaches `threshold`. Rounding BEFORE the threshold
    * keeps the cut engine-reproducible (a last-ulp difference cannot
    * flip a >=). Returns (a_id, b_id, a_str, b_str, sim). */
  def erSelfJoin(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, blockLen: Int = 2, dp: Int = 9): DataFrame = {
    require(blockLen >= 1, s"need a positive block prefix, got $blockLen")
    // strings SHORTER than blockLen block on their full value (substring
    // already returns the whole string) — a length >= blockLen filter here
    // would silently lose even identical short strings, and the SQL oracle's
    // substr() blocking keeps them. EMPTY strings are excluded: they would
    // all share the single '' block and self-join quadratically (m empty
    // rows → ~m²/2 distance-0 pairs), the degenerate-data shape the quality
    // gates upstream exist to strip.
    val rows = df
      .select(col(idCol).as("id"), col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull && length(col("s")) > 0)
      .withColumn("blk", substring(col("s"), 1, blockLen))
    val a = rows.select(col("blk"), col("id").as("a_id"), col("s").as("a_str"))
    val b = rows.select(col("blk"), col("id").as("b_id"), col("s").as("b_str"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(jaroWinkler(col("a_str"), col("b_str")), dp))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "a_str", "b_str", "sim")
  }
}
