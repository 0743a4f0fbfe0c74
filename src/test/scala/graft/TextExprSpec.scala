package graft

import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native WordShingles expression: string-for-string equality with the
  * composed split→transform→slice→concat_ws formulation it replaced, on the
  * real corpus and on the whitespace edge cases (empty words are KEPT by
  * split's limit=-1, so shingles can contain doubled spaces). */
class TextExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  def docs = { spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") }

  test("native shingles equal composed shingles on the corpus (n=5 and n=3)") {
    for (n <- Seq(3, 5)) {
      val diff = docs.select(
          Dedup.shingles(col("text"), n).as("fast"),
          Dedup.shinglesComposed(col("text"), n).as("slow"))
        .filter(not(col("fast") <=> col("slow"))).count()
      assert(diff == 0, s"n=$n: $diff docs shingled differently")
    }
  }

  test("native shingles equal composed shingles on whitespace edge cases") {
    val s = spark; import s.implicits._
    val edge = Seq(
      "",                      // empty text → one empty word
      "one",                   // fewer words than n
      "a b",                   // exactly n words
      "a b c d",               // normal
      "a  b c",                // doubled space → empty word kept
      " a b c",                // leading space
      "a b c ",                // trailing space (split limit=-1 keeps it)
      "  ",                    // only spaces
      "über naïve 文字 x y z"  // multibyte UTF-8
    ).toDF("text")
    val rows = edge.select(col("text"),
        Dedup.shingles(col("text"), 2).as("fast"),
        Dedup.shinglesComposed(col("text"), 2).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"text='${r.getString(0)}': ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
    }
  }

  test("null text explodes to zero shingle rows on both paths") {
    // the composed form's null-text result is CONF-dependent (ANSI off →
    // legacy size(null) = -1 → empty array; ANSI on → null); the native
    // expression is always null. Both agree at the only consumer: explode
    // produces zero rows either way.
    val s = spark; import s.implicits._
    val df = Seq((1, Some("a b c")), (2, None)).toDF("id", "text")
    assert(df.select(col("id"), Dedup.shingles(col("text"), 2).as("sh"))
      .filter(col("id") === 2).head().isNullAt(1))
    val fastRows = df.select(col("id"), explode(Dedup.shingles(col("text"), 2)))
      .filter(col("id") === 2).count()
    val slowRows = df.select(col("id"), explode(Dedup.shinglesComposed(col("text"), 2)))
      .filter(col("id") === 2).count()
    assert(fastRows == 0 && slowRows == 0)
  }

  test("shingle count is words - n + 1") {
    val s = spark; import s.implicits._
    val got = Seq("w1 w2 w3 w4 w5 w6").toDF("text")
      .select(size(Dedup.shingles(col("text"), 4))).head().getInt(0)
    assert(got == 3)
  }

  test("charLmScore: corpus prose outscores gibberish; sub-2-char docs drop") {
    val s = spark; import s.implicits._
    val prose = docs.limit(20).select(col("doc_id"), col("text"))
    // gibberish shares no bigram structure with the corpus; the one-char
    // and empty docs have no bigrams at all and must not appear
    val noise = Seq((900001L, "zq xv qz vx jj qq zz xx vv jq"),
      (900002L, "a"), (900003L, "")).toDF("doc_id", "text")
    val scored = graft.functions.TextAnalysis
      .charLmScore(prose.unionByName(noise), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scored.contains(900002L) && !scored.contains(900003L))
    val proseAvg = scored.filter(_._1 < 900000L).values.sum /
      scored.count(_._1 < 900000L)
    assert(scored(900001L) < proseAvg - 0.5,
      s"gibberish ${scored(900001L)} should sit far below prose avg $proseAvg")
  }
}
