package graft.examples

import graft.api.StreamContext
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end Structured Streaming demo: event-time tumbling counts with
  * watermarking driven through the public Streaming API, fed by an in-memory
  * micro-batch source (reference: streaming wordcount/nexmark shapes).
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = StreamContext.localSession(4)
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[(Timestamp, String)]
    val agg = Streaming.tumblingCounts(
      Streaming.withEventTime(in.toDF.toDF("ts", "k"), "ts", "5 seconds"),
      "ts", "10 seconds", col("k"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("demo").start()

    def t(s: Long) = new Timestamp(s * 1000)
    in.addData((t(1), "click"), (t(3), "click"), (t(8), "view"), (t(25), "click"))
    q.processAllAvailable()
    in.addData((t(40), "view"))
    q.processAllAvailable()
    spark.table("demo").orderBy("w_start", "k").collect().foreach { r =>
      println(s"WINDOW ${r.getTimestamp(0)} ${r.getString(2)} n=${r.getLong(1)}")
    }
    q.stop()
    spark.stop()
  }
}
