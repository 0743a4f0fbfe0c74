package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the vocabulary
  * LEARNING step of an LLM data pipeline (TextAnalysis counts tokens;
  * nothing else here builds the tokenizer those counts assume). Classic
  * Sennrich-style BPE over a word-frequency table: per merge round, count
  * adjacent symbol pairs weighted by word frequency, take the most frequent
  * pair (ties broken lexicographically — deterministic, oracle-matching),
  * and merge its occurrences greedily left-to-right in every word.
  *
  * 100 TB shape: the corpus is touched by exactly ONE pass (word →
  * frequency, a single shuffle on the word); every merge round then runs
  * over the DISTINCT-WORD table — vocabulary-sized, Zipf-bounded, orders of
  * magnitude smaller than the corpus — with one pair-count shuffle per
  * round and a narrow `replace` map for the merge. Rounds persist their
  * state and release the previous round's (the Iteration discipline).
  *
  * Mechanics of the merge: a word's symbol sequence is kept as a single
  * string with every symbol wrapped in \u0001 sentinels ("hi" →
  * "\u0001h\u0001\u0001i\u0001"), so merging pair (a, b) is the plain
  * string replace of "\u0001a\u0001\u0001b\u0001" with "\u0001ab\u0001" —
  * non-overlapping left-to-right, which is exactly BPE's greedy merge
  * order, and exactly replicable in the DuckDB oracle with the same
  * `replace` semantics (q_bpe unrolls the rounds in SQL, the
  * unrolled-Lloyd precedent of q_kmeans). Sentinel-wrapping makes symbol
  * boundaries unambiguous: "ya b" cannot match pair (a, b) because the
  * match must be sentinel-delimited. \u0001 must not occur in the corpus
  * (guaranteed for text data; control characters are stripped upstream by
  * quality gates).
  */
object BpeTrainer {

  private val S = "\u0001"

  /** Learned merge table: one row per round — (round, lhs, rhs, freq),
    * where (lhs, rhs) is the pair merged in that round and freq its
    * weighted occurrence count at merge time. Applying the merges in round
    * order to a new word reproduces the learned tokenization. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // every char wrapped in sentinels; "." skips newlines identically in
    // both engines, so the (degenerate, corpus-absent) newline case still
    // oracle-matches
    var state = words.select(
      regexp_replace(col("word"), "(.)", S + "$1" + S).as("wstr"),
      col("cnt")).persist()
    val vocab = state.count()

    val out = Seq.newBuilder[Row]
    // the Iteration loop discipline: AQE off (no per-round replan), shuffle
    // width sized from the vocabulary (the loop state), lineage truncated
    // every 5 rounds so a realistic merge count (tens of thousands) neither
    // stacks one Project per round into the plan nor overflows Catalyst's
    // recursive traversals
    val iter = graft.operators.Iteration
    // try/finally (the QualityClassifier.train discipline): a mid-round
    // collect/count failure must not leak the current state cache for the
    // session lifetime — `state` points at the newest MATERIALIZED table
    // in every round, so the one finally covers them all (a failing
    // merged.count() can leave only partial blocks of that round's not-yet-
    // adopted cache, bounded by one round's completed partitions)
    try {
    iter.withLoopConf(spark) {
      iter.withShuffleWidth(spark, Some(iter.sizedWidth(vocab))) {
        var r = 1
        var exhausted = false
        while (r <= merges && !exhausted) {
          val syms = split(trim(col("wstr"), S), S + S)
          val top = state
            .select(col("cnt"), syms.as("s"))
            .filter(size(col("s")) >= 2)
            .select(col("cnt"), explode(expr(
              "transform(sequence(1, size(s) - 1), i -> " +
                "named_struct('lhs', element_at(s, i), 'rhs', element_at(s, i + 1)))"))
              .as("p"))
            .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
            .agg(sum(col("cnt")).as("freq"))
            .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
            .limit(1).collect()
          if (top.isEmpty) exhausted = true
          else {
            val (l, rr, f) =
              (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
            out += Row(r, l, rr, f)
            var merged = state.select(
              replace(col("wstr"),
                lit(S + l + S + S + rr + S), lit(S + l + rr + S)).as("wstr"),
              col("cnt"))
            if (r % 5 == 0) merged = merged.localCheckpoint(false)
            merged = merged.persist()
            merged.count()
            state.unpersist()
            state = merged
            r += 1
          }
        }
      }
    }
    } finally { state.unpersist(); () }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }

  /** Tokenize `textCol` with a learned merge table (the apply side of
    * [[train]]): wrap, replay the merges in round order, unwrap. Returns
    * the symbol array per row. `mergeRows` is the collected merge table —
    * vocabulary-sized, shipped as literals inside the plan (broadcast-free
    * narrow map). */
  def tokenize(df: DataFrame, textCol: String,
      mergeRows: Seq[(String, String)]): DataFrame = {
    val wrapped = regexp_replace(col(textCol), "(.)", S + "$1" + S)
    val mergedStr = mergeRows.foldLeft(wrapped) { case (acc, (l, rr)) =>
      replace(acc, lit(S + l + S + S + rr + S), lit(S + l + rr + S))
    }
    df.withColumn("tokens", split(trim(mergedStr, S), S + S))
  }
}
