package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-trigram stupid-backoff language-model scoring — the CCNet-style
  * perplexity filter (Wenzek et al. 2020 train a KenLM on a reference
  * corpus and rank crawled text by perplexity; Brants et al. 2007 introduce
  * stupid backoff as the distributed-counting score that needs no
  * discounting pass). [[TextAnalysis.charLmScore]] is the self-trained
  * character-level proxy; this is the word-level reference-corpus form: a
  * model is COUNTED on one split and APPLIED to another, so out-of-model
  * trigrams genuinely back off (reference `renoir` expresses such corpus
  * statistics as group_by_fold pipelines, e.g. wordcount —
  * examples/wordcount.rs — the model here is three of those plus a keyed
  * application join).
  *
  * Score of a scored-split trigram (w1 w2 w3), with counts c(·) from the
  * train split, N its token count, V its vocabulary size:
  *   - c(w1w2w3) > 0 → c(w1w2w3) / c(w1w2)          (level 3)
  *   - else c(w2w3) > 0 → 0.4 · c(w2w3) / c(w2)      (level 2)
  *   - else 0.16 · (c(w3)+1) / (N+V+1)               (level 1, add-1 so an
  *     unseen word scores a finite log; 0.16 is the squared backoff factor
  *     as an exact literal — 0.4·0.4 in doubles is NOT 0.16 bit-for-bit,
  *     so both engines must parse the same literal)
  *
  * FP portability (the q_char_lm discipline): each DISTINCT trigram's
  * log-score is rounded to `dp` decimals and scaled to an integer micro
  * BEFORE any per-document summing, so both engines aggregate exact
  * integers in any order; only the final per-doc average divides back to
  * double.
  *
  * 100 TB shape: counting is three word-keyed groupBys over the train
  * split's token stream (map-side partial, shuffles carry (gram, long)).
  * Scoring collapses the scored split to its DISTINCT trigram set first,
  * scores each distinct trigram once through five left joins against the
  * count tables (model tables are corpus-vocabulary-sized — far too big to
  * broadcast at scale, so these are plain shuffle joins, each linear in
  * the smaller of probe/model), then ships the per-trigram integer score
  * back onto the occurrence stream with a single trigram-keyed join and a
  * map-side-partial doc collapse. Nothing wider than
  * (gram, id, long) ever crosses the network, and the quadratic-free
  * distinct-first shape means a pathological document repeating one
  * trigram a million times costs one model lookup, not a million. */
object NgramLm {

  /** The counted trigram model of a reference split, with all three count
    * tables PERSISTED: built for stream-static scoring, where every
    * micro-batch is its own action re-reading the static side — exactly
    * the cross-action shape where an explicit cache pays (SCALE.md
    * "within one action" note; contrast the batch scorer below, which
    * leaves t2/t3 to AQE stage reuse inside its one action). Callers
    * release with [[TrigramModel.unpersistAll]] once the stream stops. */
  final case class TrigramModel(t3: DataFrame, t2: DataFrame, t1: DataFrame,
      nTok: Long, vSize: Long) {
    def unpersistAll(): Unit = Seq(t3, t2, t1).foreach(_.unpersist())
  }

  /** Count (trigram, bigram, unigram) tables + (N, V) on `trainDf`. */
  def trigramModel(trainDf: DataFrame, textCol: String): TrigramModel = {
    def counts(n: Int): DataFrame = trainDf
      .select(explode(Dedup.shingles(lower(col(textCol)), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
    val t1 = counts(1).persist()
    val sized = t1.agg(sum(col("c")), count(lit(1))).head()
    TrigramModel(counts(3).persist(), counts(2).persist(), t1,
      if (sized.isNullAt(0)) 0L else sized.getLong(0), sized.getLong(1))
  }

  /** Score every `scoreDf` document against a trigram model counted on
    * `trainDf`. Returns one row per scored document:
    * (doc_id, n_grams, n_tri, n_bi, n_uni, lm_score) where n_tri/n_bi/n_uni
    * count trigram occurrences resolved at each backoff level (their sum is
    * n_grams) and lm_score is the average per-trigram natural-log score
    * (0.0 with n_grams = 0 for documents shorter than three tokens).
    *
    * The result is returned materialized-and-persisted (house pattern of
    * [[TextAnalysis.charLmScore]]): the intermediate occurrence cache is
    * released before returning; callers unpersist the result when done. */
  def scoreAgainst(trainDf: DataFrame, scoreDf: DataFrame, idCol: String,
      textCol: String, dp: Int = 6): DataFrame = {
    def grams(df: DataFrame, n: Int): DataFrame =
      df.select(explode(Dedup.shingles(lower(col(textCol)), n)).as("g"))
    def counts(df: DataFrame, n: Int): DataFrame =
      grams(df, n).groupBy(col("g")).agg(count(lit(1)).as("c"))

    // model: t1 is persisted because
    // its consumers span TWO actions (the driver-side sizing head() below
    // is its own job; the probes run in the result's job) — cross-action
    // reuse is exactly what AQE stage-caching can NOT provide. t2's two
    // probes both run inside the ONE result action, where AQE reuses the
    // identical partial-count exchange stage — persisting it measured a
    // wash-to-loss at sf0.1 (SCALE.md "within one action" note), so t2/t3
    // stay unpersisted.
    val t1 = counts(trainDf, 1).persist()
    val t2 = counts(trainDf, 2)
    val t3 = counts(trainDf, 3)
    val sized = t1.agg(sum(col("c")), count(lit(1))).head()
    val nTok = if (sized.isNullAt(0)) 0L else sized.getLong(0)
    val vSize = sized.getLong(1)

    // scored-split trigram occurrences, cached: probed once for the
    // distinct model-lookup set and once for the final per-doc collapse
    val occ = scoreDf.select(col(idCol).cast("long").as("doc_id"),
        explode(Dedup.shingles(lower(col(textCol)), 3)).as("g3"))
      .persist()
    val parts = split(col("g3"), " ")
    val dist = occ.select(col("g3")).distinct()
      .select(col("g3"),
        concat_ws(" ", parts(0), parts(1)).as("g12"),
        concat_ws(" ", parts(1), parts(2)).as("g23"),
        parts(1).as("w2"), parts(2).as("w3"))

    val j = dist
      .join(t3.select(col("g").as("g3"), col("c").as("c3")), Seq("g3"), "left_outer")
      .join(t2.select(col("g").as("g12"), col("c").as("c12")), Seq("g12"), "left_outer")
      .join(t2.select(col("g").as("g23"), col("c").as("c23")), Seq("g23"), "left_outer")
      .join(t1.select(col("g").as("w2"), col("c").as("cw2")), Seq("w2"), "left_outer")
      .join(t1.select(col("g").as("w3"), col("c").as("cw3")), Seq("w3"), "left_outer")
    // c3 > 0 implies c12 > 0 and c23 > 0 implies cw2 > 0: a train-split
    // trigram/bigram always contributes its own prefix/context count
    def lpMicro(x: Column): Column =
      round(round(log(x), dp) * 1e6, 0).cast("long")
    val scoresByGram = j.select(col("g3"),
      when(col("c3").isNotNull, lit(3))
        .when(col("c23").isNotNull, lit(2))
        .otherwise(lit(1)).as("lvl"),
      when(col("c3").isNotNull,
          lpMicro(col("c3").cast("double") / col("c12")))
        .when(col("c23").isNotNull,
          lpMicro(lit(0.4) * col("c23") / col("cw2")))
        .otherwise(lpMicro(lit(0.16) * (coalesce(col("cw3"), lit(0L)) + 1) /
          lit((nTok + vSize + 1).toDouble)))
        .as("lp_micro"))

    val perDoc = occ.join(scoresByGram, Seq("g3"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(col("lp_micro")).as("micro"))
    val out = scoreDf.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        // no final rounding: the raw IEEE division of the exact integer
        // micro sum is bit-identical in any engine, whereas a last
        // round(x, 6) tie-breaks differently across round implementations
        // (observed as a 1-micro mismatch at sf0.1)
        when(col("n_grams").isNull, lit(0.0))
          .otherwise(col("micro").cast("double") / 1e6 / col("n_grams"))
          .as("lm_score"))
      .persist()
    out.count()
    occ.unpersist()
    t1.unpersist()
    out
  }
}
