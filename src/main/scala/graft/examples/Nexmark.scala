package graft.examples

import graft.Queries
import org.apache.spark.sql.SparkSession

/** NEXMark q1–q8 runner printing `q{n}:elapsed` — the same output shape as
  * the reference's examples/nexmark.rs:494. */
object Nexmark {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.nx_q1(spark, sfDir).count() // warmup
    for (n <- 1 to 8) {
      val t0 = System.nanoTime()
      Queries.all(s"nx_q$n")(spark, sfDir).count()
      println(f"q$n:${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
