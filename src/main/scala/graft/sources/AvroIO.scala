package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest/export over the Hadoop mapreduce
  * connectors (`avro-mapred`'s `AvroKeyInputFormat` /
  * `AvroKeyOutputFormat`) — the remaining interchange format a raw
  * training corpus commonly arrives in, built without the spark-avro
  * module (not on this build's classpath).
  *
  * Flat schemas of long/int/double/boolean/string columns (every
  * column nullable via an Avro union), which covers raw-corpus
  * interchange shapes; nested data belongs in parquet/ORC.
  *
  * Scale: both directions are plain Hadoop-format RDD IO — one task
  * per file split on read, one output file per partition on write,
  * no driver materialization and no shuffle. Avro records are
  * converted to/from Spark rows inside the same task (the readers
  * REUSE the record object, so values are extracted before the
  * iterator advances — the standard Hadoop-RDD discipline).
  */
object AvroIO {

  /** Avro schema JSON for a flat Spark schema, every field a
    * `["null", primitive]` union (writer defaults make nullability
    * the safe cross-system contract). */
  def avroSchemaJson(schema: StructType, name: String = "graft_record"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType    => "long"
      case IntegerType => "int"
      case DoubleType  => "double"
      case BooleanType => "boolean"
      case StringType  => "string"
      case other =>
        throw new IllegalArgumentException(
          s"AvroIO supports flat long/int/double/boolean/string schemas; got $other")
    }
    schema.fields
      .map(f => s"""{"name":"${f.name}","type":["null","${prim(f.dataType)}"],"default":null}""")
      .mkString(s"""{"type":"record","name":"$name","fields":[""", ",", "]}")
  }

  /** Write `df` as Avro container files under `path` (replacing any
    * previous output — re-runs are idempotent like DataFrame writers'
    * overwrite mode). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hadoopPath)) fs.delete(hadoopPath, true)
    val rdd = df.rdd.mapPartitions { it =>
      // parse per partition: Schema caches state; the JSON string is
      // the serialization-safe form to ship into the closure
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    rdd.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files at `path` into a DataFrame with
    * `schema` (the Avro reader schema is derived from it, so writer
    * schema evolution resolves through Avro's own rules). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val schemaJson = avroSchemaJson(schema)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setDataModelClass(job, classOf[org.apache.avro.generic.GenericData])
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val d = k.datum()
        // extract NOW: the input format reuses the datum across rows
        Row.fromSeq(fields.toSeq.map { f =>
          d.get(f.name) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
        })
      }
    spark.createDataFrame(rows, schema)
  }
}
