package graft.examples

import graft.api._
import graft.api.WindowDescr._

/** Rolling hot-words over the events stream through the typed window façade —
  * the analog of the reference's `examples/rolling_top_words_e2e.rs`: keyed
  * count windows emitting the hottest key per window.
  */
object RollingTopWords {

  /** Hottest word per tumbling event-time window: keyed count per
    * (word, window), then per-window arg-max with (count, word) tie-break —
    * the reference pipeline's shape (rolling_top_words_e2e.rs: window →
    * count → global top). Returns (windowIndex, word, count) ordered by
    * window. */
  def topPerWindow(ctx: StreamContext, typed: org.apache.spark.sql.Dataset[(String, Long)],
      windowMs: Long): Seq[(Long, String, Int)] = {
    val sp = typed.sparkSession
    import sp.implicits._
    ctx.fromDataset(typed)
      .groupBy(_._1)
      .window(EventTimeWindow.tumbling[(String, Long)](windowMs)(_._2))
      .mapWindow(w => (w.head._2 / windowMs, w.length))
      .map { case (k, (win, n)) => (win, k, n) }
      .groupBy(_._1)
      .maxElement(v => (v._3, v._2))
      .map(_._2)
      .sortedBy(_._1)
      .collectVec()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = StreamContext.localSession(4)
    val ctx = new StreamContext(spark)
    import spark.implicits._

    // (event_type, ts-millis) stream, keyed by type, 6h event-time tumbling
    // windows, count per window, then hottest type per window start.
    // Queries.events is the dtype-branching ts normalizer — hard-coding the
    // nanos-as-long division here would mis-scale every window 1000x if the
    // events table were regenerated with a true timestamp column
    val typed = graft.Queries.events(spark, sfDir)
      .selectExpr("event_type", "unix_millis(ts) as ms")
      .as[(String, Long)]

    val hottest = topPerWindow(ctx, typed, 6L * 3600 * 1000)
    hottest.take(10).foreach { case (win, tpe, n) => println(s"window=$win\ttop=$tpe\tn=$n") }
    println(s"TOTAL_WINDOWS=${hottest.size}")
    spark.stop()
  }
}
