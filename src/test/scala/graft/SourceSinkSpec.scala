package graft

import graft.api._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink round-trips (reference: §2.1/§2.2 — file/csv/parquet sources,
  * write_csv/write_parquet sinks, sequential vs single-file variants). */
class SourceSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  lazy val ctx = new StreamContext(spark)
  def imp = { spark.sparkContext.setLogLevel("WARN"); spark.implicits }
  def tmp(): String = Files.createTempDirectory("graft").toString

  test("parquet write/read round-trip (write_parquet_seq)") {
    val s = imp; import s._
    val dir = tmp() + "/p"
    ctx.streamRange(100).map(x => (x, s"v$x")).writeParquet(dir)
    val back = ctx.streamParquetAs[(Long, String)](dir).collectVec()
    assert(back.sortBy(_._1).map(_._1) == (0L until 100L))
  }

  test("single-file parquet (write_parquet_one → one part file)") {
    val s = imp; import s._
    val dir = tmp() + "/p1"
    ctx.streamRange(10).writeParquetOne(dir)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 1)
  }

  test("partitioned parquet sink: hive layout, pruned scan, round-trip") {
    val s = imp; import s._
    val dir = tmp() + "/pp"
    val typed = ctx.streamRange(100).map(x => (x, (x % 4).toString, s"v$x"))
      .ds.toDF("id", "day", "v").as[(Long, String, String)]
    ctx.fromDataset(typed).writeParquetPartitioned(dir, "day")
    // hive directory layout: one dir per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dirs.toSeq == Seq("day=0", "day=1", "day=2", "day=3"))
    // round-trip: all rows, partition column restored
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    // partition pruning: the filter becomes a PartitionFilter, not a scan
    val pruned = back.filter(org.apache.spark.sql.functions.col("day") === "2")
    val formatted = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PartitionFilters: [isnotnull(day"),
      s"day filter must prune partitions:\n$formatted")
    assert(pruned.count() == 25)
  }

  test("csv write/read round-trip with header and typed schema") {
    val s = imp; import s._
    val dir = tmp() + "/c"
    ctx.streamIter(Seq((1L, "a"), (2L, "b"))).writeCsv(dir)
    val back = ctx.streamCsv(dir).selectExpr("CAST(_1 AS BIGINT)", "_2")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == Seq((1L, "a"), (2L, "b")))
  }

  test("jsonl write/read round-trip, typed and untyped") {
    val s = imp; import s._
    val dir = tmp() + "/j"
    ctx.streamIter(Seq((1L, "alpha"), (2L, "beta {\"nested\":1}")))
      .map { case (id, t) => (id, t) }.writeJsonl(dir)
    val back = ctx.streamJsonl(dir).selectExpr("CAST(_1 AS BIGINT)", "_2")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == Seq((1L, "alpha"), (2L, "beta {\"nested\":1}")))
    // the on-disk form is one JSON object per line
    val lines = Files.list(java.nio.file.Path.of(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .flatMap(f => Files.readAllLines(java.nio.file.Path.of(f)).toArray.map(_.toString))
    assert(lines.length == 2 && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("orc write/read round-trip, typed and untyped") {
    val s = imp; import s._
    val dir = tmp() + "/o"
    ctx.streamIter(Seq((1L, "alpha", 1.5), (2L, "beta", -2.25)))
      .writeOrc(dir)
    val back = ctx.streamOrcAs[(Long, String, Double)](dir)
      .collectVec().sortBy(_._1)
    assert(back == Seq((1L, "alpha", 1.5), (2L, "beta", -2.25)))
    // untyped path sees the same schema; the files on disk are ORC
    assert(ctx.streamOrc(dir).columns.toSeq == Seq("_1", "_2", "_3"))
    val orcFiles = Files.list(java.nio.file.Path.of(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".orc"))
    assert(orcFiles.nonEmpty)
  }

  test("text file source (stream_file) splits on lines") {
    val s = imp; import s._
    val f = tmp() + "/t.txt"
    Files.writeString(java.nio.file.Path.of(f), "one\ntwo\nthree")
    assert(ctx.streamFile(f).collectVec().sorted == Seq("one", "three", "two"))
  }

  test("parallel iterator source: replica-indexed generator covers all replicas") {
    val s = imp; import s._
    val r = ctx.streamParIterGen(4)((id, n) => Iterator.single((id, n)))
      .collectVec().sorted
    assert(r == Seq((0, 4), (1, 4), (2, 4), (3, 4)))
  }

  test("collectIterator streams results; forEach runs side effects") {
    val s = imp; import s._
    val it = ctx.streamRange(5).collectIterator()
    assert(it.toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("avro round-trip: write + read, schema and values preserved") {
    val s = imp; import s._
    val dir = tmp() + "/a"
    // spark-avro connector absent here → exercises the avro-core fallback
    // (graft.sources.AvroIO); with the connector present the same API uses it
    val data = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, "gamma", 0.0, true))
    new graft.api.Stream(data.toDS()).writeAvro(dir)
    val back = ctx.streamAvro(dir)
    assert(back.schema.fieldNames.toSeq == Seq("_1", "_2", "_3", "_4"))
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSeq.sortBy(_._1)
    assert(rows == data)
    // nullable column round-trips nulls
    val dir2 = tmp() + "/b"
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    graft.sources.AvroIO.write(df, dir2)
    val back2 = graft.sources.AvroIO.read(spark, dir2).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq.sortBy(_._1)
    assert(back2 == Seq((1L, Some("x")), (2L, None)))
  }
}
