package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-pruned vocabulary build + encode — the word-level
  * tokenization path next to [[BpeTrainer]]'s subword path: classical
  * word-model pipelines (fastText-style classifiers, n-gram LMs) keep the
  * top-V corpus words and map everything else to one OOV id.
  *
  * Determinism: ids are assigned 1..V in (count desc, word asc) order —
  * the tie-break is total, so the vocabulary is a pure function of the
  * corpus in both hash-free engines (the DuckDB oracle replays it
  * exactly). Id 0 is reserved for OOV.
  *
  * Scale shape: the build is a word-count aggregate (partial-aggregated,
  * vocabulary-sized output) + a TakeOrdered of V rows; encode is
  * posexplode → broadcast-hash join against the V-row vocabulary → one
  * token-sized re-aggregation keyed by document. The vocabulary always
  * broadcasts (V rows); the corpus never joins wider than its token
  * count.
  */
object Vocabulary {

  /** The top-`v` corpus words: (word, cnt, id) with ids 1..v assigned in
    * (cnt desc, word asc) order. */
  def build(df: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v >= 1, s"vocabulary size must be >= 1, got $v")
    val counts = df
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // TakeOrdered the V survivors first (distributed), THEN rank: the
    // single-partition ranking window only ever sees V rows, never the
    // distinct-word universe
    counts.orderBy(col("cnt").desc, col("word").asc).limit(v)
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("word").asc)))
  }

  /** Encode every document against `vocab` (a [[build]] result): one row
    * per token, (idCol, pos, word, id) with pos 0-based in document order
    * and id 0 for out-of-vocabulary words. Exploded row output keeps the
    * result engine-comparable and streaming-friendly; callers wanting the
    * packed form re-aggregate with `array_agg` ordered by pos. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    df.select(col(idCol),
        posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(vocab.select(col("word"), col("id"))), Seq("word"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"), col("word"),
        coalesce(col("id"), lit(0)).cast("long").as("id"))
}
