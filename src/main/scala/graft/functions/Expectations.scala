package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality expectations — the validation gate a curation
  * pipeline runs on every crawl/ETL output before it may feed training:
  * declare rules, get one (rule, metric, pass) row each, fail the batch on
  * any `pass = false`.
  *
  * Scale shape: every declared metric is an AGGREGATE EXPRESSION, so a
  * whole rule set is ONE partially-aggregated corpus scan (a single
  * 1-row × N-metric aggregate, stacked to rows driver-free); only
  * [[uniqueRule]] adds a distinct (its exactness requires the key
  * shuffle — swap in the KMV/HLL sketches when approximate uniqueness is
  * acceptable at 100 TB) and [[subsetRule]] one left-anti join against the
  * reference keys.
  *
  * Determinism: metrics are count ratios — exact integer counts divided
  * once in double, in a fixed operation order — so the DuckDB oracle
  * reproduces every metric bit-for-bit.
  */
object Expectations {

  /** One expectation: `metric` must be an aggregate Column yielding DOUBLE;
    * `pass` maps the metric to the verdict (applied AFTER aggregation). */
  final case class Rule(name: String, metric: Column, pass: Column => Column)

  /** Count ratio that is NULL (not an ANSI divide-by-zero error) on an
    * empty batch; [[check]] coalesces the null verdict to FAIL. */
  private def ratio(num: Column): Column =
    try_divide(num.cast("double"), count(lit(1)).cast("double"))

  /** Fraction of non-null values in `c` ≥ `atLeast`. */
  def completenessRule(c: String, atLeast: Double): Rule =
    Rule(s"completeness($c)", ratio(count(col(c))), m => m >= atLeast)

  /** Fraction of rows inside [lo, hi] (nulls count as violations) ≥
    * `atLeast`. */
  def rangeRule(c: String, lo: Double, hi: Double, atLeast: Double): Rule =
    Rule(s"range($c)",
      ratio(count(when(col(c) >= lo && col(c) <= hi, 1))),
      m => m >= atLeast)

  /** Fraction of rows matching an arbitrary predicate ≥ `atLeast`. */
  def predicateRule(name: String, pred: Column, atLeast: Double): Rule =
    Rule(name, ratio(count(when(pred, 1))), m => m >= atLeast)

  /** distinct(keys)/count = 1.0 ⟺ the key combination is unique. EXACT —
    * costs the key-distinct shuffle. Distinct is over the key STRUCT:
    * bare countDistinct skips any row with a null key entirely, which
    * would fail a perfectly unique batch that merely contains nulls
    * (struct values are never null, so null keys count — and duplicate
    * null keys are duplicates, as they should be). */
  def uniqueRule(keys: String*): Rule =
    Rule(s"unique(${keys.mkString(",")})",
      ratio(countDistinct(struct(keys.map(col): _*))),
      m => m === 1.0)

  /** Run a rule set in ONE aggregate pass: (rule, metric, pass) rows. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules declared")
    val agg = df.agg(rules.head.metric.as("m0"),
      rules.tail.zipWithIndex.map { case (r, i) => r.metric.as(s"m${i + 1}") }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      // null metric (0/0 count ratio on an empty batch) must FAIL, not
      // null-propagate through enforce's filter(!pass) — an empty crawl
      // output is the most broken input a gate can see
      struct(lit(r.name).as("rule"), col(s"m$i").as("metric"),
        coalesce(r.pass(col(s"m$i")), lit(false)).as("pass"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.metric"), col("r.pass"))
  }

  /** Per-GROUP rule report: every rule evaluated within each value of
    * `groupCol` — the "which SOURCE is broken" drill-down (a corpus can
    * pass globally while one crawl source ships garbage). Same one-scan
    * discipline: a single grouped aggregate over all metrics, stacked to
    * (g, rule, metric, pass) rows. */
  def checkPerGroup(df: DataFrame, groupCol: String,
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules declared")
    val agg = df.groupBy(col(groupCol).as("g")).agg(
      rules.head.metric.as("m0"),
      rules.tail.zipWithIndex.map { case (r, i) => r.metric.as(s"m${i + 1}") }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"m$i").as("metric"),
        coalesce(r.pass(col(s"m$i")), lit(false)).as("pass"))
    }
    agg.select(col("g"), explode(array(rows: _*)).as("r"))
      .select(col("g"), col("r.rule"), col("r.metric"), col("r.pass"))
  }

  /** Fail-fast gate: run [[check]] and THROW (with every failing rule and
    * its metric in the message) if any rule fails — the shape a pipeline
    * driver wants between "crawl landed" and "training may read". Returns
    * the report when all rules pass. */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // ONE corpus scan: collect the full (rule-count-sized) report and
    // rebuild the returned frame from the rows — returning the lazy plan
    // would re-run the whole aggregate when the caller displays/writes it
    val report = check(df, rules)
    val rows = report.collect()
    val failed = rows.filter(!_.getBoolean(2))
      .map(r => s"${r.getString(0)}=" +
        (if (r.isNullAt(1)) "null" else r.getDouble(1).toString))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"data-quality gate failed: ${failed.mkString(", ")}")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), report.schema)
  }

  /** Referential integrity as a rule row: the fraction of `df` keys present
    * in `ref`'s key column (one left-anti join; the violation side is
    * usually tiny). Emitted in the same (rule, metric, pass) shape so it
    * unions with [[check]]'s output. */
  def subsetRule(df: DataFrame, key: String, ref: DataFrame, refKey: String,
      atLeast: Double): DataFrame = {
    // ONE pass (left join + a single aggregate), not two counts over df;
    // the empty-batch metric is NULL → FAIL (try_divide + coalesce), the
    // same contract as check() — the old 0.0/0.0 emitted a NaN row that
    // broke the report's bit-for-bit oracle convention
    val marked = df.select(col(key))
      .join(ref.select(col(refKey).as(key), lit(1).as("_present"))
        .dropDuplicates(key), Seq(key), "left")
    val row = marked.agg(
      try_divide(count(col("_present")).cast("double"),
        count(lit(1)).cast("double")).as("metric")).head()
    val metric: java.lang.Double = if (row.isNullAt(0)) null else row.getDouble(0)
    val pass = metric != null && metric >= atLeast
    val spark = df.sparkSession
    import spark.implicits._
    Seq((s"subset($key)", Option(metric).map(_.toDouble), pass))
      .toDF("rule", "metric", "pass")
  }
}
