package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Avro container-file interchange for the documents shape — the last
  * lake format in the battery next to Parquet (scans), ORC (l03),
  * JSONL (l01) and dirty CSV (l02): the row-oriented format a
  * mixed-engine shop's Kafka/ingest tier speaks.
  *
  * Built directly on the PUBLIC Avro Java library (avro-1.12 — the
  * Object Container File spec: schema-in-header, sync-marked blocks,
  * per-block deflate), because this environment ships Spark without
  * the `spark-avro` connector jar; with the connector on the
  * classpath, `write`/`read` here collapse to
  * `df.write.format("avro")` / `spark.read.format("avro")`. This is
  * the [[SqliteFile]] discipline: when the connector is absent, speak
  * the public file format, and keep the Spark-side plumbing
  * (partition-parallel write, file-parallel read, schema projection)
  * the real production shape.
  *
  * Scale shape: the WRITE runs one container file per partition from
  * `foreachPartition` (no driver funnel, no row collect); the READ
  * parallelizes over files, one task per container (Avro's sync
  * markers also allow sub-file splits — the connector does that; a
  * file-per-task is the right grain here where files are
  * partition-sized by construction). Records stream through an
  * iterator — no per-file materialization.
  */
object AvroLake {
  /** The interchange row (matches l03's ORC column set). */
  case class Doc(doc_id: Long, text: String, lang: String, source: String,
                 n_chars: Long)

  private def docSchema: Schema = SchemaBuilder.record("doc")
    .namespace("graft").fields()
    .requiredLong("doc_id")
    .requiredString("text")
    .requiredString("lang")
    .requiredString("source")
    .requiredLong("n_chars")
    .endRecord()

  /** Write `docs` (must carry the [[Doc]] columns) as deflate Avro
    * container files under `dir`, one file per non-empty partition. */
  def write(docs: DataFrame, dir: String): Unit = {
    import docs.sparkSession.implicits._
    val d = new java.io.File(dir)
    d.mkdirs()
    // overwrite semantics: stale parts from a previous run must not
    // survive into the read (mode("overwrite") discipline)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).foreach(_.delete())
    val ds = docs.select("doc_id", "text", "lang", "source", "n_chars").as[Doc]
    ds.foreachPartition { (rows: Iterator[Doc]) =>
      if (rows.hasNext) {
        val sch = docSchema
        val pid = TaskContext.getPartitionId()
        val file = new java.io.File(dir, f"part-$pid%05d.avro")
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(sch, file)
        try rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          rec.put("doc_id", r.doc_id)
          rec.put("text", r.text)
          rec.put("lang", r.lang)
          rec.put("source", r.source)
          rec.put("n_chars", r.n_chars)
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Read every container file under `dir` back as a typed Dataset —
    * file list enumerated once at the driver (directory-listing-sized),
    * record decode distributed one task per file. */
  def read(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).toSeq.sorted
    spark.createDataset(files)
      .repartition(math.max(1, files.size))
      .flatMap { path =>
        val rdr = new DataFileReader[GenericRecord](
          new java.io.File(path), new GenericDatumReader[GenericRecord]())
        // streaming iterator; the reader closes at exhaustion (every
        // consumer here drains fully — agg/signature over all rows)
        new Iterator[Doc] {
          override def hasNext: Boolean = {
            val h = rdr.hasNext
            if (!h) rdr.close()
            h
          }
          override def next(): Doc = {
            val r = rdr.next()
            Doc(r.get("doc_id").asInstanceOf[Long],
              r.get("text").toString,
              r.get("lang").toString,
              r.get("source").toString,
              r.get("n_chars").asInstanceOf[Long])
          }
        }
      }
  }
}
