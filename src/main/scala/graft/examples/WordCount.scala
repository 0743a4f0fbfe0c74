package graft.examples

import graft.api.{Stream, StreamContext}

/** The reference's hero example (reference: README.md:20-57 wordcount):
  * source → flat_map(tokenize) → group_by → count → top-k, written against
  * this engine's public façade. Doubles as an e2e smoke main.
  */
object WordCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = StreamContext.localSession(4)
    val ctx = new StreamContext(spark)
    import spark.implicits._

    val docs = ctx.streamParquet(s"$sfDir/documents.parquet")
      .select("text").as[String]

    val top = ctx.fromDataset(docs)
      .flatMap(_.split("\\s+").iterator.filter(_.nonEmpty))
      .groupBy(identity[String])
      .count
      .sortedLimitBy(10, 0, org.apache.spark.sql.functions.col("_2").desc,
        org.apache.spark.sql.functions.col("_1"))
      .collectVec()

    top.foreach { case (w, n) => println(s"$w\t$n") }
    spark.stop()
  }
}
