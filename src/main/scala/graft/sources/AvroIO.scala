package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source + sink (SURVEY §2 B-block: the fourth
  * row-format leg next to parquet/ORC/CSV/JSONL — the deployed
  * Hive/Spark stack reads Avro). Spark 4's distribution here bundles
  * the core Avro runtime but not the spark-avro connector, so this
  * drives Avro's own DataFileWriter/Reader inside `mapPartitions`:
  * one container file per partition on write, one split per container
  * file on read — embarrassingly parallel both ways, no driver-side
  * row handling, I/O through the Hadoop FileSystem API so the same
  * code addresses local disk, HDFS, or an object store.
  *
  * Type surface: the primitive lane (long/int/double/float/string/
  * boolean/binary/date), nullable via union(null, T) — dims and facts
  * round-trip; nested lakehouse data belongs in parquet.
  */
object AvroIO {

  /** Spark → Avro schema (nullable columns become union(null, T)). */
  def toAvroSchema(st: StructType, name: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"avro sink does not support column ${f.name}: $other")
      }
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = {
    def nonNull(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
      else s
    val nullable = s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)
    val b = nonNull(s)
    val dt = b.getType match {
      case Schema.Type.LONG => LongType
      case Schema.Type.INT =>
        if (b.getLogicalType != null && b.getLogicalType.getName == "date") DateType
        else IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.STRING => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(s"avro source does not support $other")
    }
    (dt, nullable)
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (deflate-compressed). Replaces the directory.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st).toString
    val p = new Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    // Ship the SESSION Hadoop conf to tasks (spark.hadoop.* settings —
    // object-store credentials, endpoints — never reach a bare
    // `new Configuration()`).
    val confBc = org.apache.spark.sql.graftglue.Glue.broadcastConf(
      df.sparkSession.sparkContext,
      org.apache.spark.sql.graftglue.Glue.sessionHadoopConf(df.sparkSession))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val part = new Path(dir + "/part-%05d.avro".format(pid))
        val out = part.getFileSystem(
          org.apache.spark.sql.graftglue.Glue.confOf(confBc)).create(part, true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, out)
        var n = 0L
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < row.length) {
            val v = row.get(i)
            rec.put(i, v match {
              case null => null
              case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
              case d: java.time.LocalDate => d.toEpochDay.toInt
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case other => other
            })
            i += 1
          }
          w.append(rec); n += 1
        } finally w.close()
        Iterator.single(n)
      }
    }.count() // materialize the distributed write
  }

  /** Read a directory of Avro container files: schema from the first
    * file's header (driver-side metadata read only), then one read
    * task per file.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val headerReader = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf), new GenericDatumReader[GenericRecord]())
    val avroJson = try headerReader.getSchema.toString finally headerReader.close()
    val avroSchema = new Schema.Parser().parse(avroJson)
    val st = StructType(avroSchema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
    val n = st.length
    // Same session-conf shipping as the write side: task-side FsInput
    // must see spark.hadoop.* (s3a credentials, endpoints).
    val confBc = org.apache.spark.sql.graftglue.Glue.broadcastConf(
      spark.sparkContext, org.apache.spark.sql.graftglue.Glue.sessionHadoopConf(spark))
    val rdd = spark.sparkContext.parallelize(files, files.length).flatMap { file =>
      val schema = new Schema.Parser().parse(avroJson)
      val r = new DataFileReader[GenericRecord](
        new FsInput(new Path(file), org.apache.spark.sql.graftglue.Glue.confOf(confBc)),
        new GenericDatumReader[GenericRecord](schema))
      new Iterator[Row] {
        override def hasNext: Boolean = r.hasNext || { r.close(); false }
        override def next(): Row = {
          val rec = r.next()
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            vals(i) = (rec.get(i), st(i).dataType) match {
              case (null, _) => null
              case (u: org.apache.avro.util.Utf8, _) => u.toString
              case (d: Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.longValue()))
              case (b: java.nio.ByteBuffer, _) =>
                val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
              case (other, _) => other
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }
    spark.createDataFrame(rdd, st)
  }
}
