package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink built directly on avro-core (the runtime
  * jar Spark ships) — the spark-avro connector is not available in a
  * zero-egress environment, so this closes the reference's Avro surface
  * (reference: src/operator/source/avro.rs:49, sink/avro.rs) with a real,
  * distributed implementation instead of an API stub.
  *
  * Scope: flat records of Avro primitives (boolean/int/long/float/double/
  * string/bytes), each optionally nullable via a `[null, T]` union — the
  * shape the reference's serde-based source handles. Writes one container
  * file per partition through the Hadoop FileSystem API (cluster-correct,
  * not local-disk-bound); reads distribute one file per task.
  */
object AvroIO {

  def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s")
      (sparkType(nonNull.head)._1, true)
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  def toStructType(schema: Schema): StructType =
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = sparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)

  def avroSchemaFor(st: StructType, name: String = "record"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case t => throw new IllegalArgumentException(s"unsupported spark type $t")
      }
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  private def fromAvro(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case x => x
  }

  private def toAvro(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case x => x
  }

  /** One Avro container file per partition under `path` (overwrites). */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchemaFor(df.schema).toString
    val names = df.schema.fieldNames
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fs0 = FileSystem.get(new java.net.URI(path), serConf.value)
    fs0.delete(new Path(path), true)
    fs0.mkdirs(new Path(path))
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = FileSystem.get(new java.net.URI(path), serConf.value)
      // task-attempt commit protocol: write to an attempt-unique temp name,
      // rename into place on success. A speculative or zombie attempt racing
      // a retry can then never leave a torn final file — the loser's rename
      // fails (destination exists) and its temp is deleted. Readers skip the
      // dot-prefixed temps.
      val finalPath = new Path(path, f"part-$pid%05d.avro")
      val tmpPath = new Path(path,
        f".part-$pid%05d.avro.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmpPath, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, out)
      var n = 0L
      it.foreach { row =>
        val rec = new GenericData.Record(schema)
        names.indices.foreach(i => rec.put(names(i), toAvro(row.get(i))))
        writer.append(rec)
        n += 1
      }
      writer.close()
      if (!fs.rename(tmpPath, finalPath)) {
        // rename failure is benign ONLY when a sibling attempt already
        // committed this partition; anything else (transient FS error,
        // deleted parent, permissions) must FAIL the task — silently
        // deleting the data would drop the partition while reporting success
        if (fs.exists(finalPath)) fs.delete(tmpPath, false)
        else {
          fs.delete(tmpPath, false)
          throw new java.io.IOException(
            s"AvroIO.write: rename $tmpPath -> $finalPath failed and no " +
              "committed file exists; failing the task so it retries")
        }
      }
      Iterator.single(n)
    }.count()
  }

  /** Distributed read: schema from one file on the driver, then one task per
    * container file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val schema = {
      val in = fs.open(new Path(files.head))
      val dfs = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try dfs.getSchema
      finally { dfs.close(); in.close() } // close the wrapper too, not just in
    }
    val st = toStructType(schema)
    val names = st.fieldNames
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val rows = spark.sparkContext.parallelize(files.toSeq, files.length)
      .flatMap { file =>
        val fsx = FileSystem.get(new java.net.URI(file), serConf.value)
        val in = fsx.open(new Path(file))
        val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        // close-on-drain below never fires for early-terminating consumers
        // (limit/take, failed downstream task) — the task-completion hook
        // releases the file handle in every exit path (close is idempotent)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => stream.close()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) { stream.close() }
            h
          }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(names.toIndexedSeq.map(n => fromAvro(rec.get(n))))
          }
        }
      }
    spark.createDataFrame(rows, st)
  }
}
