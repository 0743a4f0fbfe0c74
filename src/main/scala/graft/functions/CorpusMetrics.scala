package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-vs-corpus and corpus-diversity metrics — the decisions a data
  * mixer makes BETWEEN corpora (is this crawl distributionally different
  * from the last one? is this source diverse or boilerplate?), complementing
  * the per-document scores in [[TextAnalysis]] and the per-bin drift in
  * [[Sketches.histogramDrift]].
  *
  * FP discipline (the q_drift / charLm convention): every per-token
  * contribution is computed in one fixed operation order and rounded to an
  * integer scale BEFORE summing, so both engines aggregate exact integers
  * in any order and the result is bit-reproducible.
  */
object CorpusMetrics {

  private def tokenCounts(df: DataFrame, textCol: String): DataFrame = df
    .select(explode(split(col(textCol), " ")).as("tok"))
    .filter(col("tok") =!= "")
    .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))

  /** Token-level Jensen–Shannon divergence between two corpora — the
    * bounded, symmetric "how different are these two text distributions"
    * number (0 = identical, 1 bit = disjoint). No smoothing needed: a
    * token absent from one side contributes only its present side's
    * p·log2(2p/(p+q)) term, which is finite — unlike KL, JS is defined on
    * disjoint support.
    *
    * Scale shape: two partial-aggregated unigram counts, a vocabulary-sized
    * full-outer join, corpus totals as a 1-row broadcast scalar (never a
    * driver count job), and ONE scalar aggregate — per-token contributions
    * are integer-nano-scaled before that sum, so the report is a single
    * row and the whole plan is exchange-bounded by vocabulary size.
    *
    * Returns one row: vocab sizes, token totals, and `js2_nano_bits` =
    * 2·JS in nano-bits as an exact BIGINT (halve and scale in the report
    * layer; the integer is the portable artifact). */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val ca = tokenCounts(a, textCol).select(col("tok"), col("cnt").as("na"))
    val cb = tokenCounts(b, textCol).select(col("tok"), col("cnt").as("nb"))
    val j = ca.join(cb, Seq("tok"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    // totals from each SIDE's counts, not from the joined table: the
    // vocabulary full-outer join would otherwise run twice (ReuseExchange
    // reuses the aggregates, not the join); sum(na) over the join rows
    // equals the side total, so values are identical
    val tots = ca.agg(coalesce(sum(col("na")), lit(0L)).as("ta"))
      .crossJoin(cb.agg(coalesce(sum(col("nb")), lit(0L)).as("tb")))
    // null-safe p's: an EMPTY side (t=0) contributes probability 0 — the
    // raw n/0 is NULL, which would null the OTHER side's term through the
    // shared (pa+pb) denominator and report NULL divergence exactly when a
    // crawl came back empty (null often reads as "no drift" downstream)
    val pa = when(col("ta") > 0,
      col("na").cast("double") / col("ta").cast("double")).otherwise(lit(0.0))
    val pb = when(col("tb") > 0,
      col("nb").cast("double") / col("tb").cast("double")).otherwise(lit(0.0))
    val termA = when(col("na") > 0,
      pa * log2(lit(2.0) * pa / (pa + pb))).otherwise(lit(0.0))
    val termB = when(col("nb") > 0,
      pb * log2(lit(2.0) * pb / (pa + pb))).otherwise(lit(0.0))
    j.crossJoin(broadcast(tots))
      .select(col("na"), col("nb"),
        round(termA * lit(1000000000.0), 0).cast("long").as("ca_nano"),
        round(termB * lit(1000000000.0), 0).cast("long").as("cb_nano"))
      .agg(count(lit(1)).as("vocab"),
        count(when(col("na") > 0 && col("nb") > 0, 1)).as("vocab_shared"),
        sum(col("na")).as("tokens_a"), sum(col("nb")).as("tokens_b"),
        sum(col("ca_nano") + col("cb_nano")).as("js2_nano_bits"))
  }

  /** Zipf slope — the corpus-health scalar: the least-squares slope of
    * ln(frequency) on ln(rank) over the top-`topK` tokens. Natural text
    * sits near −1; machine-generated or templated corpora drift flat
    * (> −0.7) or cliff-steep. The corpus collapses to token counts
    * (partial-aggregated), top-K lowers to TakeOrdered, and the rank
    * window + regression run on the REPORT-sized K rows — one row out,
    * `dp`-rounded (double-sum tolerance, as everywhere). Ties rank by
    * token for a deterministic fit. */
  def zipfSlope(df: DataFrame, textCol: String, topK: Int = 1000,
      dp: Int = 6): DataFrame = {
    require(topK >= 3, s"need topK >= 3 for a fit, got $topK")
    val top = tokenCounts(df, textCol)
      .orderBy(col("cnt").desc, col("tok")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok"))
    top.withColumn("rank", row_number().over(w))
      .agg(
        round(regr_slope(log(col("cnt").cast("double")),
          log(col("rank").cast("double"))), dp).as("zipf_slope"),
        count(lit(1)).as("n_tokens_fit"))
  }

  /** Distinct-n diversity per group — the boilerplate detector: the share
    * of a group's n-grams that are distinct (1.0 = every n-gram unique,
    * →0 = the source repeats itself). Computed as an aggregate OF an
    * aggregate — (key, gram) counts first, then per-key totals — so both
    * levels partial-aggregate and the distinct never materializes a set.
    * Ratio divides exact integers once in double. */
  def distinctNgrams(df: DataFrame, keyCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // explode_outer + count(gram): a key whose every document is shorter
    // than n words must still APPEAR (n_grams = 0) — a plain explode made
    // exactly the degenerate sources this detector exists to catch vanish
    // from the report
    val grams = df.select(col(keyCol).as("key"),
        explode_outer(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy(col("key"), col("gram")).agg(count(col("gram")).as("cnt"))
    grams.groupBy(col("key"))
      .agg(sum(col("cnt")).as("n_grams"),
        count(when(col("cnt") > 0, 1)).as("n_distinct"))
      .select(col("key"), col("n_grams"), col("n_distinct"),
        // zero grams → ratio 1.0 (vacuously distinct: no repetition
        // observed), not a NULL that reads as missing data downstream
        when(col("n_grams") === 0, lit(1.0)).otherwise(
          col("n_distinct").cast("double") / col("n_grams").cast("double"))
          .as("distinct_ratio"))
  }
}
