package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering by Z-order (Morton) curve — the data
  * LAYOUT lever the single-key levers in [[Scale]] can't provide: sorting by
  * one column makes min/max file statistics selective on that column only,
  * while sorting by the interleaved z-value makes them selective on ALL the
  * interleaved columns at once (the public pattern behind Delta Lake's
  * `OPTIMIZE ZORDER BY`).
  *
  * At 100 TB this decides how much of the corpus a selective scan touches:
  * training-data reads are filtered by several dimensions at once (source ×
  * quality bucket × length band; lang × domain), and a z-clustered layout
  * lets parquet row-group pruning skip the files whose bounding box misses
  * the predicate. ZOrderSpec pins the claim executably: the summed
  * per-partition bounding-box area of a z-clustered layout is a fraction of
  * a round-robin layout's on the same data.
  *
  * Mechanics: each column is scaled to an unsigned `bits`-bit integer by
  * min/max quantization, and the quantized words are bit-interleaved into a
  * single long (dimension j contributes bit i at position `i*D + j`). The
  * whole computation is a static sum of shift/mask Column terms — no UDF,
  * fully whole-stage-codegen. Quantization uses one IEEE-double multiply +
  * divide (`floor((x-min)*mask/range)`), exact while `(max-min)*mask` stays
  * under 2^53 — bits=8 leaves headroom to 2^45-wide key ranges, and the
  * DuckDB oracle reproduces it bit-for-bit from the same expression shape.
  *
  * Beyond-reference operator (the reference has no layout machinery — its
  * single-node channels make locality free); kept alongside Scale's
  * salting/bucketing as the third scale lever.
  */
object ZOrder {

  /** Min/max-quantize `x` to `[0, 2^bits)` as a long. `minV`/`maxV` are the
    * column's global bounds (literals from one agg pass). Degenerate
    * constant columns (max == min) quantize to 0. Values OUTSIDE the bounds
    * saturate to the edge cells — the identity for in-bounds data (so the
    * oracle path is unaffected) and the defined behavior for appends
    * quantized under frozen bounds (see [[zvalueWithBounds]]). */
  def quantize(x: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val mask = (1L << bits) - 1
    val range = (maxV - minV).cast("double")
    // degenerate constant column → cell 0; otherwise divide by the TRUE
    // range (a sub-1.0 double range — quality scores, ratios — must keep
    // its full 2^bits resolution, so no floor on the divisor).
    // NULL and NaN values pin to cell 0, NOT the top cell: least/greatest
    // SKIP nulls, so a null x would otherwise land at mask — co-locating
    // every null row with the max-value rows and poisoning the top
    // z-range's min/max pruning.
    when(x.isNull || isnan(x.cast("double")), lit(0L))
      .when(range <= 0.0, lit(0L)).otherwise(
      greatest(lit(0L), least(lit(mask),
        floor((x - minV).cast("double") * lit(mask.toDouble) / range)
          .cast("long"))))
  }

  /** Bit-interleave already-quantized `bits`-bit words: dimension j's bit i
    * lands at position `i * qs.length + j`. Static sum of `bits * D`
    * shift/mask terms — codegen-friendly, no higher-order functions. */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits * qs.length <= 62,
      s"interleave: ${qs.length} dims x $bits bits exceeds a long")
    qs.zipWithIndex.flatMap { case (q, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * qs.length + j)
      }
    }.reduce(_ + _)
  }

  /** Per-column (min, max) quantization bounds from one driver-collected
    * aggregation (the same two-pass discipline as tfidf's corpus count — a
    * metadata-sized job). Persist these alongside a clustered table to keep
    * APPENDS layout-consistent (see [[zvalueWithBounds]]). */
  def boundsOf(df: DataFrame, cols: Seq[String]): Seq[(Any, Any)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(j => (row.getAs[Any](2 * j), row.getAs[Any](2 * j + 1)))
  }

  /** Append a `zval` column interleaving `cols` at `bits` bits each, under
    * FROZEN `bounds` — the crawl-cycle shape (same discipline as IvfIndex's
    * frozen-quantizer append): compute bounds once at initial-build time,
    * then quantize every later batch under the same bounds so identical
    * rows get identical z-values and new files land in the established
    * z-ranges without re-clustering history. Out-of-bounds appends saturate
    * to edge cells (documented drift signal: re-cluster when the saturated
    * fraction grows). */
  def zvalueWithBounds(df: DataFrame, cols: Seq[String],
      bounds: Seq[(Any, Any)], bits: Int = 8,
      zCol: String = "zval"): DataFrame = {
    require(bounds.length == cols.length,
      s"zvalueWithBounds: ${cols.length} cols but ${bounds.length} bounds")
    val qs = cols.zip(bounds).map { case (c, (lo, hi)) =>
      quantize(col(c), lit(lo), lit(hi), bits)
    }
    df.withColumn(zCol, interleave(qs, bits))
  }

  /** Append a `zval` column interleaving `cols` at `bits` bits each; bounds
    * come from `df` itself ([[boundsOf]]). */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      zCol: String = "zval"): DataFrame =
    zvalueWithBounds(df, cols, boundsOf(df, cols), bits, zCol)

  /** Cluster `df` into `numPartitions` z-ordered partitions: range-partition
    * on the z-value and sort within each, so every output partition covers a
    * compact run of the space-filling curve (a small bounding box in ALL the
    * clustered dimensions). Write the result with any file sink and min/max
    * statistics prune multi-dimensional predicates. */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 8): DataFrame = {
    val z = zvalue(df, cols, bits)
    z.repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
