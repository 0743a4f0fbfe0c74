package graft.examples

import graft.functions.{Dedup, IvfIndex, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the documents + embeddings tables:
  * profile → quality gate → exact dedup → minhash near-dup removal →
  * language/token stats, and a persistent ANN index over the embeddings.
  * Every stage is the library operator a 100 TB run would use (each is
  * individually oracle- or spec-verified; ExamplesSpec smoke-checks the
  * composition's invariants).
  */
object TrainingPipeline {

  final case class Stats(total: Long, qualityGated: Long, exactDeduped: Long,
      nearDeduped: Long, langs: Map[String, Long], annResults: Long)

  def run(spark: SparkSession, sfDir: String): Stats = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    // 1. profile + quality gate
    val profiled = TextAnalysis.profile(docs, "doc_id", "text")
    val gated = profiled.filter(col("quality") >= 0.5).persist()
    val nGated = gated.count()

    // 2. exact dedup on the order-invariant fingerprint (keep smallest id)
    val keepExact = gated
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn").persist()
    val nExact = keepExact.count()

    // 3. near-dup removal: each surviving near-dup pair drops its higher id
    // (profile() projects the text away — join it back for shingling)
    val pairs = Dedup.minhashNearDups(
      keepExact.select(col("doc_id"))
        .join(docs.select(col("doc_id"), col("text")), "doc_id"),
      "doc_id", "text", minEstSim = 0.8)
    val dropIds = pairs.select(col("b_id").as("doc_id")).distinct()
    val cleaned = keepExact.join(dropIds, Seq("doc_id"), "left_anti").persist()
    val nClean = cleaned.count()
    pairs.unpersist(); gated.unpersist(); keepExact.unpersist()

    // 4. corpus stats for the cleaned set
    val langs = cleaned.groupBy(col("lang_guess"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // 5. ANN index over the embeddings (build once, query many)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8, kmeansIters = 2)
    val ann = IvfIndex.query(index, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, nprobe = 2)
    val nAnn = ann.count()
    cleaned.unpersist()

    Stats(total, nGated, nExact, nClean, langs, nAnn)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.api.StreamContext.localSession(8)
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, sfDir)
    println(s"TOTAL=${s.total} QUALITY_GATED=${s.qualityGated} " +
      s"EXACT_DEDUPED=${s.exactDeduped} NEAR_DEDUPED=${s.nearDeduped}")
    s.langs.toSeq.sortBy(-_._2).foreach { case (l, n) => println(s"LANG\t$l\t$n") }
    println(s"ANN_RESULTS=${s.annResults}")
    spark.stop()
  }
}
