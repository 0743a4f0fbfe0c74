package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality filters for training-data curation — the
  * Gopher rules (Rae et al. 2021, "Scaling Language Models: Methods,
  * Analysis & Insights from Training Gopher", appendix A1.1) plus the
  * C4-style symbol heuristics. These complement [[TextAnalysis]] (which
  * scores well-formedness) by scoring INTERNAL REDUNDANCY: boilerplate,
  * scraped navigation, auto-generated listings.
  *
  * Scale shape: every metric here is a closed-form Column expression over
  * one document — a narrow map stage with zero shuffles at any corpus
  * size. The max-n-gram-share metric, which naively needs a per-(doc,
  * gram) aggregation (an explode + groupBy shuffle linear in total grams),
  * is instead computed per row as the longest run in the SORTED gram
  * array via a single `aggregate` fold — no shuffle, no per-doc hash map.
  */
object QualityFilters {

  /** Non-blank lines of a document (trimmed). */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Fraction of non-blank lines that repeat an earlier line:
    * 1 - distinct/total. Gopher drops docs above 0.30. */
  def duplicateLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      lit(1.0) -
        size(array_distinct(ls)).cast("double") / size(ls).cast("double"))
  }

  /** Fraction of line CHARACTERS inside repeated lines (Gopher's stricter
    * character-weighted variant): duplicates of a line contribute its full
    * length again, so the numerator is total line chars minus the chars of
    * each line's first occurrence. */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = lines(text)
    val total = aggregate(transform(ls, l => length(l).cast("long")),
      lit(0L), (a, v) => a + v)
    val firstOcc = aggregate(
      transform(array_distinct(ls), l => length(l).cast("long")),
      lit(0L), (a, v) => a + v)
    when(total === 0L, lit(0.0)).otherwise(
      (total - firstOcc).cast("double") / total.cast("double"))
  }

  /** Fraction of word occurrences beyond their first: 1 - distinct/total.
    * High values mean the doc is a permutation of few words. */
  def repeatedWordFraction(text: Column): Column = {
    val w = TextAnalysis.words(text)
    when(size(w) === 0, lit(0.0)).otherwise(
      lit(1.0) -
        size(array_distinct(w)).cast("double") / size(w).cast("double"))
  }

  /** Symbol-to-word ratio: occurrences of hash / ellipsis / bullet marks
    * per word (C4 and Gopher both cap this; Gopher's bound is 0.1).
    * OCCURRENCES, not removed characters: the rule counts an ellipsis as
    * one symbol — length arithmetic would weight it 3x and wrongly drop
    * docs near the 0.10 bound. */
  def symbolWordRatio(text: Column): Column = {
    val symbols = regexp_count(text, lit("[#*>|]|\\.\\.\\.")).cast("double")
    symbols / greatest(size(TextAnalysis.words(text)), lit(1)).cast("double")
  }

  /** Longest run length in a pre-sorted array — equal elements are
    * adjacent after sorting, so the max multiplicity is the max run. One
    * `aggregate` fold, state = (prev, current run, best run). */
  private def maxRunInSorted(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && x === acc("prev"),
          acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Share of word n-gram occurrences taken by the single most frequent
    * n-gram — Gopher's "top n-gram fraction" (bounds: 0.20 for n=2, 0.18
    * for n=3, 0.16 for n=4). 0.0 for docs with < n words. */
  def topNgramShare(text: Column, n: Int): Column = {
    val grams = Dedup.shingles(text, n)
    when(size(grams) === 0, lit(0.0)).otherwise(
      maxRunInSorted(array_sort(grams)).cast("double") /
        size(grams).cast("double"))
  }

  /** Gopher-rule keep/drop decision from the standard bounds. */
  def gopherKeep(dupLineFrac: Column, dupCharFrac: Column,
      top2: Column, top3: Column, rep: Column, sym: Column): Column =
    dupLineFrac <= 0.30 && dupCharFrac <= 0.20 &&
      top2 <= 0.20 && top3 <= 0.18 && rep <= 0.70 && sym <= 0.10

  // ── C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits
  // of Transfer Learning with a Unified Text-to-Text Transformer", §2.2:
  // the heuristics that produced the C4 corpus) — the LINE-granularity
  // complement of the doc-level Gopher gates above: C4 EDITS a document
  // line by line before any whole-document gate runs. ──

  /** Lines of `text` surviving the C4 line rules: terminal punctuation
    * (. ! ? "), at least `minWords` words, and no boilerplate marker
    * ("javascript" is C4's). CRLF and bare-CR line endings are normalized
    * to \n first (literal replaces — identical on any engine), so CRLF
    * corpora clean like \n corpora instead of every line failing the
    * terminal test on its trailing \r. The terminal check itself is a
    * LAST-CHARACTER test, not a regex `$` anchor — Java's `$` matches
    * before a trailing \r while RE2's does not, so the anchor form would
    * silently diverge from a DuckDB oracle on un-normalized input. Word
    * counting shares the corpus-wide `\s+` convention (see
    * [[TextAnalysis.words]]). NULL text cleans to zero lines. */
  def c4KeptLines(text: Column, minWords: Int = 5): Column = {
    val t = replace(replace(coalesce(text, lit("")),
      lit("\r\n"), lit("\n")), lit("\r"), lit("\n"))
    filter(lines(t), l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= minWords &&
        !contains(lower(l), lit("javascript")))
  }

  /** The cleaned document: surviving lines re-joined. */
  def c4CleanText(text: Column, minWords: Int = 5): Column =
    array_join(c4KeptLines(text, minWords), "\n")

  /** C4 page-level keep: at least `minLines` surviving lines and no
    * page-level ban marker ("lorem ipsum" placeholder text, or a curly
    * brace — C4 drops source-code-looking pages). */
  def c4Keep(keptLineCount: Column, text: Column, minLines: Int = 3): Column =
    keptLineCount >= minLines &&
      !contains(lower(coalesce(text, lit(""))), lit("lorem ipsum")) &&
      !contains(coalesce(text, lit("")), lit("{"))

  /** C4 cleaning profile: cleaned text, surviving-line count, page keep
    * flag. Same scale shape as [[gopherProfile]] — one narrow codegen pass
    * per document, zero shuffles at any corpus size; chains onto a stream
    * unchanged. `lineify` as in [[gopherProfile]]. */
  def c4Profile(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minLines: Int = 3,
      lineify: Column => Column = identity): DataFrame = {
    val t = lineify(col(textCol))
    df.select(col(idCol), c4KeptLines(t, minWords).as("kept"), t.as("t"))
      .select(col(idCol),
        array_join(col("kept"), "\n").as("cleaned"),
        size(col("kept")).cast("long").as("n_kept"),
        c4Keep(size(col("kept")), col("t"), minLines).as("keep"))
  }

  /** Full repetition profile + keep flag, one narrow pass per document.
    * `lineify` optionally rewrites a delimiter into newlines before the
    * LINE metrics only (the corpus here is single-line synthetic text;
    * callers with real multi-line docs pass identity) — word/gram metrics
    * always run on the raw text so they share [[Dedup.shingles]]'
    * tokenization. */
  def gopherProfile(df: DataFrame, idCol: String, textCol: String,
      lineify: Column => Column = identity): DataFrame = {
    // NULL text follows the empty-doc contract (all metrics 0, keep=true)
    // instead of tri-state NULLs that vanish from BOTH sides of a
    // filter(keep)/filter(!keep) curation split — the charEntropy pattern
    val raw = coalesce(col(textCol), lit(""))
    val t = lineify(raw)
    df.select(col(idCol),
        duplicateLineFraction(t).as("dup_line_frac"),
        duplicateLineCharFraction(t).as("dup_char_frac"),
        topNgramShare(raw, 2).as("top2_share"),
        topNgramShare(raw, 3).as("top3_share"),
        repeatedWordFraction(raw).as("repeated_word_frac"),
        symbolWordRatio(raw).as("symbol_ratio"))
      .withColumn("keep",
        gopherKeep(col("dup_line_frac"), col("dup_char_frac"),
          col("top2_share"), col("top3_share"),
          col("repeated_word_frac"), col("symbol_ratio")))
  }
}
