package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Avro Object Container File source/sink built directly on the Avro
  * core library (`org.apache.avro`, on every Spark classpath) — no
  * `spark-avro` connector required. The point is the FORMAT coverage
  * with real parsing, shaped the Spark way:
  *
  *   - WRITE: one container file per partition (`foreachPartition` +
  *     `DataFileWriter`), deflate-compressed, with a small sync
  *     interval so every fixture file carries MULTIPLE Avro blocks —
  *     the reader's block iteration and sync-marker handling are
  *     exercised by every roundtrip, not just by jumbo files;
  *   - READ: `binaryFile` scan (Spark's whole-file source, so files
  *     distribute across executors like any other scan) +
  *     `DataFileReader` over the in-memory bytes per file — header
  *     parse, codec negotiation, block decompression and the
  *     writer-schema read all happen on the executors; only decoded
  *     rows move.
  *
  * Fields are nullable unions per Avro convention. At 100 TB the same
  * two kernels hold: ingest-side containers are whatever size the
  * upstream producer cut (binaryFile assigns whole files to tasks —
  * fine for the many-medium-files layout Avro pipelines produce), and
  * the write side streams one container per task.
  */
object AvroIO {

  /** documents-table record schema (nullable unions for strings). */
  private val docSchemaJson: String =
    """{"type":"record","name":"doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"text","type":["null","string"],"default":null},
      |{"name":"lang","type":["null","string"],"default":null},
      |{"name":"source","type":["null","string"],"default":null},
      |{"name":"n_chars","type":"long"}
      |]}""".stripMargin

  /** Write `df` (documents projection) as one Avro container per
    * partition under `dir`. */
  def writeDocs(df: DataFrame, dir: String): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) {
      // clear a previous run's output (local-FS sink; a cluster sink
      // would stage + rename like every directory table here)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
    d.mkdirs()
    val schemaJson = docSchemaJson
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          import org.apache.avro.Schema
          import org.apache.avro.file.{CodecFactory, DataFileWriter}
          import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
          val schema = new Schema.Parser().parse(schemaJson)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = new java.io.File(dir, f"part-$pid%05d.avro")
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.setCodec(CodecFactory.deflateCodec(6))
          w.setSyncInterval(2048) // several blocks per fixture file
          w.create(schema, f)
          try it.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("doc_id", r.getLong(0))
            rec.put("text", if (r.isNullAt(1)) null else r.getString(1))
            rec.put("lang", if (r.isNullAt(2)) null else r.getString(2))
            rec.put("source", if (r.isNullAt(3)) null else r.getString(3))
            rec.put("n_chars", r.getLong(4))
            w.append(rec)
          } finally w.close()
        }
      }
  }

  /** Read the containers back: binaryFile scan + per-file
    * DataFileReader on the executors. */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.avro")
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
        import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
        val rd = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, String, String, Long)]
        try {
          while (rd.hasNext) {
            val r = rd.next()
            def str(n: String): String = {
              val v = r.get(n); if (v == null) null else v.toString
            }
            out += ((r.get("doc_id").asInstanceOf[Long], str("text"),
              str("lang"), str("source"),
              r.get("n_chars").asInstanceOf[Long]))
          }
        } finally rd.close()
        out
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }
}
