package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Curate
import graft.sources.PartitionedLake

/** Streaming document-ingest operators: the PRODUCTION per-ingest form
  * of the curation pipeline — each micro-batch of new documents is
  * tested against the already-curated corpus (never the corpus against
  * itself), survivors append to the corpus store, and the next batch
  * probes the grown corpus. Composes [[graft.operators.Curate.incremental]]
  * (c02's cost-∝-delta probe join) with the st09 lake-ingest replay
  * discipline ([[graft.sources.PartitionedLake.upsertBatchKeyed]]).
  *
  * Scale story (100 TB): per batch, the corpus contributes a reusable
  * 32-byte-key hash set and a prefix-token index to two semi-join-
  * shaped probes — candidate cost scales with the DELTA, not the
  * corpus; the corpus store itself is append-only parquet that is
  * never rewritten. Replay safety: the probe corpus is filtered to
  * `ingest_batch < batchId`, so a replayed batch (restart from
  * checkpoint, at-least-once delivery) never sees its own previous
  * write as a duplicate, recomputes the identical verdicts, and
  * dynamic partition overwrite rewrites exactly its own files —
  * effectively-once corpus state.
  */
object DocStreams {

  /** Read the accumulated corpus store, or an empty frame with the
    * delta's schema when no batch has landed yet. */
  private def corpusOrEmpty(delta: DataFrame, path: String): DataFrame = {
    val dir = new java.io.File(path)
    val hasData = dir.isDirectory &&
      Option(dir.listFiles()).exists(_.exists(_.getName.startsWith("ingest_batch=")))
    if (hasData) delta.sparkSession.read.parquet(path)
    else delta.limit(0).withColumn("ingest_batch", lit(-1L))
  }

  /** One micro-batch of the incremental-dedup ingest (public so the
    * replay-idempotence property is directly testable, mirroring
    * `PartitionedLake.upsertBatch`'s spec): admit `delta` against the
    * corpus batches BEFORE `batchId`, append only the kept documents
    * under `ingest_batch=<batchId>`. */
  def ingestBatch(delta: DataFrame, batchId: Long, corpusPath: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  blockCol: String = "source",
                  threshold: Double = 0.5): Unit = {
    val corpus = corpusOrEmpty(delta, corpusPath)
      .filter(col("ingest_batch") < batchId)
      .select(col(idCol), col(textCol), col(blockCol))
    val verdicts = Curate.incremental(delta, corpus,
      idCol, textCol, blockCol, threshold)
    val kept = delta.join(
      verdicts.filter(col("kept")).select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")
    PartitionedLake.upsertBatchKeyed(kept, batchId, corpusPath)
  }

  /** Streaming incremental dedup ingest: per micro-batch, admit the
    * delta against the corpus at `corpusPath` (exact sha2 probe +
    * cross-set prefix-filter Jaccard), append only the kept documents
    * under `ingest_batch=<id>`. Returns the DataStreamWriter; the
    * caller picks trigger/checkpoint. */
  def incrementalDedupIngest(docs: DataFrame, corpusPath: String,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             blockCol: String = "source",
                             threshold: Double = 0.5)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, corpusPath,
          idCol, textCol, blockCol, threshold)
    }
}
