package graft.examples

import graft.Queries
import org.apache.spark.sql.SparkSession

/** NEXMark q1–q8 runner printing `q{n}:elapsed` — the same output shape as
  * the reference's examples/nexmark.rs:494. */
object Nexmark {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // the ONE session recipe (StreamContext.localSession) — a hand-rolled
    // copy here silently missed every future session-default fix
    val spark = graft.api.StreamContext.localSession()
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
