package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points against intervals — all pairs with
  * `lo <= point <= hi` (plus optional equi-keys). The reference expresses
  * the keyed time flavor as `interval_join`
  * (reference: src/operator/interval_join.rs:20-200); this is the general
  * numeric form a curation pipeline hits for banding, histogram assignment
  * and time-range enrichment.
  *
  * Why not `points.join(intervals, p between lo and hi)`: with no equi
  * conjunct Spark plans a BroadcastNestedLoopJoin (or a cartesian product
  * once the intervals outgrow the broadcast threshold) — O(N·M) compares,
  * a non-starter at 100 TB. This lowering manufactures the equi conjunct:
  *
  *   bin(x)       = floor(x / binWidth)               (points: one bin each)
  *   bins([lo,hi]) = floor(lo/w) .. floor(hi/w)       (intervals: exploded)
  *   equi-join on (keys..., bin) + residual `between` filter
  *
  * Every matching pair shares exactly the point's one bin, so the join is
  * duplicate-free by construction — no post-join distinct. Cost: shuffle of
  * N point rows + M·(1 + len/binWidth) interval rows into a hash/SMJ join,
  * instead of N·M compares; AQE handles bin skew like any other hot key.
  *
  * Pick `binWidth` near the TYPICAL interval length: much smaller explodes
  * intervals into many bins (shuffle amplification); much larger piles
  * unrelated points into each bin (residual-filter waste). Intervals
  * spanning more than `maxBinsPerInterval` bins fail fast rather than
  * silently materializing a runaway `sequence()`.
  */
object RangeJoin {

  /** All (point, interval) pairs with `point ∈ [lo, hi]` and equal `keys`.
    *
    * @param points    each row one point; all its columns are kept
    * @param intervals each row one interval; its non-key columns are kept
    *                  (`lo`/`hi` included); intervals with `hi < lo` match
    *                  nothing and are dropped
    * @param pointCol  numeric point column on `points`
    * @param loCol     inclusive lower bound column on `intervals`
    * @param hiCol     inclusive upper bound column on `intervals`
    * @param binWidth  bucketing width (> 0) in point units
    * @param keys      optional equi-key column names present on both sides
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, binWidth: Double,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val reserved = "__bin"
    require(!(points.columns ++ intervals.columns).contains(reserved),
      s"rangeJoin reserves column name $reserved")
    val pPayload = points.columns.filterNot(keys.contains).toSeq
    val iPayload = intervals.columns.filterNot(keys.contains).toSeq
    require(pPayload.intersect(iPayload).isEmpty,
      s"column collision ${pPayload.intersect(iPayload).mkString(",")}: " +
        "rename interval payload columns before joining")

    def bin(c: String) = floor(col(c) / lit(binWidth)).cast("long")
    val p = points.withColumn(reserved, bin(pointCol))
    val i = intervals
      .filter(col(hiCol) >= col(loCol))
      // fail fast on a bin explosion instead of letting sequence() build a
      // multi-million-element array per interval
      // strict <: an interval spanning bins b0..b0+d materializes d+1 rows,
      // so d == max would admit max+1 bins — one past the documented cap
      .withColumn(reserved, explode(sequence(
        when(bin(hiCol) - bin(loCol) < maxBinsPerInterval, bin(loCol))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth ["), col(loCol), lit(", "),
            col(hiCol), lit("] — increase binWidth")))),
        bin(hiCol))))
    p.join(i, keys :+ reserved)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(reserved)
  }

  /** Interval × interval OVERLAP join — the sibling of [[pointInInterval]]
    * for two interval sets (session vs session, ad slot vs visit, shift vs
    * incident): all pairs with `lLo <= rHi && rLo <= lHi` (inclusive
    * overlap) and equal `keys`.
    *
    * Same bin-explode lowering, both sides exploded; the duplicate-free
    * trick generalizes: every overlapping pair's intervals BOTH contain
    * max(lLo, rLo) (overlap means max(lo) <= min(hi)), so both carry the
    * bin of that point and the pair is emitted ONLY there — one canonical
    * bin per pair, no post-join distinct. Cost: shuffles of
    * N·(1 + len/binWidth) rows per side into an equi-join; never N·M.
    *
    * @param left   one interval per row; all columns kept; degenerate
    *               (hi < lo) intervals match nothing and are dropped
    * @param right  one interval per row; non-key columns kept — rename
    *               collisions first; same degenerate-interval rule
    * @param binWidth near the TYPICAL interval length (see class doc) */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      binWidth: Double, keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val reserved = "__bin"
    require(!(left.columns ++ right.columns).contains(reserved),
      s"intervalOverlap reserves column name $reserved")
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    require(lPayload.intersect(rPayload).isEmpty,
      s"column collision ${lPayload.intersect(rPayload).mkString(",")}: " +
        "rename right-side payload columns before joining")

    def bin(c: String) = floor(col(c) / lit(binWidth)).cast("long")
    def exploded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) >= col(lo))
      // strict < — same one-past-the-cap reasoning as rangeJoin above
      .withColumn(reserved, explode(sequence(
        when(bin(hi) - bin(lo) < maxBinsPerInterval, bin(lo))
          .otherwise(raise_error(concat(
            lit(s"intervalOverlap: interval spans more than " +
              s"$maxBinsPerInterval bins at binWidth=$binWidth ["), col(lo),
            lit(", "), col(hi), lit("] — increase binWidth")))),
        bin(hi))))
    exploded(left, lLoCol, lHiCol)
      .join(exploded(right, rLoCol, rHiCol), keys :+ reserved)
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      // canonical bin: the one containing max(lLo, rLo) — emit once
      .filter(col(reserved) ===
        floor(greatest(col(lLoCol), col(rLoCol)) / lit(binWidth)).cast("long"))
      .drop(reserved)
  }
}
