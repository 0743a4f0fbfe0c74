package graft.examples

import graft.operators.{Scale, WindowsDF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end clickstream analytics over the events table — the
  * event-analytics family composed as a user would: sessionize the raw
  * stream, report per-session engagement, then the product dashboard
  * (trending types, retention via the catalog queries). Demonstrates that
  * the whole chain costs TWO user_id exchanges (one for the sessionize
  * windows, one reused by the per-session aggregate) regardless of event
  * count.
  */
object Clickstream {

  /** Per-session engagement: events, span, and value sum for every
    * (user, session) — the table a product-analytics warehouse keeps.
    * Consumes [[WindowsDF.sessionize]]'s event-grain output; the groupBy
    * re-uses the user_id hash partitioning the sessionize pass installed,
    * so at scale only the (user, session)-grain aggregate rows move. */
  def sessionStats(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("span_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  def run(spark: SparkSession, sfDir: String): (Long, Long, Long) = {
    val events = graft.Queries.events(spark, sfDir)
    // persisted: three independent counts consume the sessionized frame —
    // each would otherwise re-run the events scan + the user_id
    // exchange/sort the sessionize window installs
    val sessions = WindowsDF.sessionize(events, "user_id", "ts", "event_id",
      gapUs = 43200000000L).persist()
    val stats = sessionStats(sessions)
    val latest = Scale.compactLatest(
      sessions.withColumn("us", unix_micros(col("ts")))
        .select("user_id", "us", "event_id", "event_type"),
      key = "user_id", version = "us", tie = "event_id",
      payload = Seq("event_type"))
    try (sessions.count(), stats.count(), latest.count())
    finally { sessions.unpersist(); () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.api.StreamContext.localSession(4)
    val (nEvents, nSessions, nUsers) = run(spark, sfDir)
    println(s"events=$nEvents sessions=$nSessions users=$nUsers")
    spark.stop()
  }
}
