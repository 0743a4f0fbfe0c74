package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single closest right row on the
  * same key whose timestamp is at-or-before (backward) / at-or-after
  * (forward) the left timestamp — the time-series "latest state as of t"
  * join (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * The reference covers the *range* flavor with `interval_join`
  * (reference: src/operator/interval_join.rs:20-200, all matches in a band);
  * as-of is the 1-row degenerate case Spark lacks as a built-in, and the
  * naive lowering — range join + per-left-row argmax — is a quadratic
  * disaster on hot keys. This lowering is the scale-correct one:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window over (key) ordered by (ts, tag[, tiebreak])
  *     → last(right_payload, ignoreNulls) per row → filter tag=1
  *
  * ONE hash shuffle on the key plus a per-partition sort — the same cost as
  * the sort-merge join Spark would run for an equi-join, with no candidate
  * blow-up on skewed keys (a key with L lefts and R rights costs
  * O((L+R) log(L+R)), not O(L·R)). At 100 TB both sides stream through a
  * single Exchange+Sort; no broadcast, no per-key state accumulation.
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (inclusive, DuckDB's `>=`). Among right rows sharing (key, ts) the last
  * by `tieBreak` wins; pass a unique column to make the result
  * deterministic, or pre-aggregate the right side to unique (key, ts).
  *
  * Left rows with no matching right row keep null payloads (left-outer).
  */
object AsOfJoin {

  /** Backward as-of: latest right with `right(rightTs) <= left(leftTs)`.
    *
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTs     left timestamp column (any orderable type; must be
    *                   comparable to `rightTs` — use epoch longs or both
    *                   TimestampType)
    * @param rightTs    right timestamp column
    * @param tolerance  optional max distance `leftTs - rightTs` (numeric ts
    *                   only); matches further back are nulled out
    * @param tieBreak   right-side ordering columns breaking (key, ts) ties —
    *                   the greatest wins
    * @return left columns unchanged + every non-key right column (the right
    *         timestamp included), null when unmatched
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Option[Column] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    asof(left, right, keys, leftTs, rightTs, tolerance, tieBreak,
      forward = false)

  /** Forward as-of: earliest right with `right(rightTs) >= left(leftTs)`.
    * `tolerance` bounds `rightTs - leftTs`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Option[Column] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    asof(left, right, keys, leftTs, rightTs, tolerance, tieBreak,
      forward = true)

  /** Nearest as-of: whichever of the backward and forward matches is closer
    * in time; an exact distance tie resolves to the backward (at-or-before)
    * match — pandas `merge_asof(direction='nearest')` semantics. `tolerance`
    * bounds the absolute distance.
    *
    * Same cost as one directional as-of: the two directional windows share
    * the single hash Exchange on the key (the second Window reuses the
    * partitioning; only the per-partition sort runs twice, once per
    * direction). No candidate blow-up on hot keys at any scale. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Option[Column] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val (u, rPayload, lCols) = unioned(left, right, keys, leftTs, rightTs)
    val back = matchOver(keys, tieBreak, rightTs, forward = false)
    val fwd = matchOver(keys, tieBreak, rightTs, forward = true)
    val withBoth = u.withColumn("__b", back).withColumn("__f", fwd)
    val dB = col("__ts") - col("__b").getField(rightTs)
    val dF = col("__f").getField(rightTs) - col("__ts")
    val chosenRaw =
      when(col("__b").isNull, col("__f"))
        .when(col("__f").isNull, col("__b"))
        .when(dF < dB, col("__f"))
        .otherwise(col("__b"))
    val chosen = tolerance match {
      case Some(tol) =>
        val mTs = chosenRaw.getField(rightTs)
        val dist = when(mTs >= col("__ts"), mTs - col("__ts"))
          .otherwise(col("__ts") - mTs)
        when(chosenRaw.isNotNull && dist <= tol, chosenRaw)
      case None => chosenRaw
    }
    withBoth
      .withColumn("__m", chosen)
      .filter(col("__src") === 1)
      .select(lCols.map(col) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** One unioned relation: right rows carry the payload struct, left rows
    * carry their own columns; __src orders right BEFORE left at equal ts so
    * the window at a left row already contains the equal-ts right row.
    * Returns (union, right payload column names, left column names). */
  private def unioned(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): (DataFrame, Seq[String], Seq[String]) = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val reserved = Seq("__ts", "__src", "__r", "__m", "__b", "__f")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${clash.distinct.mkString(",")}")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    require(rPayload.contains(rightTs), s"right side must carry $rightTs")
    val lCols = left.columns.toSeq
    require(lCols.intersect(rPayload).isEmpty,
      s"column collision ${lCols.intersect(rPayload).mkString(",")}: " +
        "rename right payload columns before joining")
    val payload = struct(rPayload.map(col): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__src"),
          payload.as("__r")) ++
        lCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__src"),
          lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    (r.unionByName(l), rPayload, lCols)
  }

  /** The directional running match: last non-null right payload in the
    * (key)-partitioned window ordered toward the left row. */
  private def matchOver(keys: Seq[String], tieBreak: Seq[String],
      rightTs: String, forward: Boolean): Column = {
    val dir: Column => Column = if (forward) _.desc else _.asc
    // tieBreak stays ASCENDING in both directions: last() takes the final
    // row of the equal-(key, ts) run, so ascending order makes the GREATEST
    // tieBreak win as documented — mirroring the ts direction here would
    // invert the rule for forward joins
    val order = Seq(dir(col("__ts")), col("__src").asc) ++
      tieBreak.map(t => col("__r").getField(t).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__r"), ignoreNulls = true).over(w)
  }

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Option[Column],
      tieBreak: Seq[String], forward: Boolean): DataFrame = {
    val (u, rPayload, lCols) = unioned(left, right, keys, leftTs, rightTs)
    val matchedRaw = matchOver(keys, tieBreak, rightTs, forward)

    // tolerance gate: distance from the left ts to the matched right ts
    val matched = tolerance match {
      case Some(tol) =>
        val dist =
          if (forward) matchedRaw.getField(rightTs) - col("__ts")
          else col("__ts") - matchedRaw.getField(rightTs)
        when(matchedRaw.isNotNull && dist <= tol, matchedRaw)
      case None => matchedRaw
    }

    u.withColumn("__m", matched)
      .filter(col("__src") === 1)
      .select(lCols.map(col) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
