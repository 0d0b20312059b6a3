package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The composed training-data curation pipeline — the end-to-end flow a
  * corpus owner actually runs, built entirely from this repo's
  * operators:
  *
  *   1. quality gate   — word-count floor + punctuation-ratio ceiling
  *                       (t02's signals as a filter)
  *   2. exact dedup    — keep the min-id doc per normalized fingerprint
  *                       (t04's md5 key)
  *   3. near-dup prune — drop the larger id of every verified near-dup
  *                       pair; `exactPairs = true` uses the
  *                       SQL-expressible shingle+token-Jaccard truth set
  *                       (oracle-checkable), `false` the MinHash+LSH
  *                       candidate path (the 100 TB route — measured
  *                       100% recall of the truth set on the fixture)
  *   4. chunking       — t05's overlapping token windows
  *
  * Every stage is a declarative transform on the same DataFrame, so
  * Catalyst fuses the projections and the only shuffles are the ones
  * the semantics demand (fingerprint group, pair join, chunk explode).
  */
object Curate {

  /** Documents surviving quality gate + exact dedup + near-dup prune. */
  def kept(docs: DataFrame, idCol: String, textCol: String,
           minWords: Int = 5, maxPunctRatio: Double = 0.3,
           nearThreshold: Double = 0.6, exactPairs: Boolean = true)
      : DataFrame = {
    val t = col(textCol)
    val nWords = regexp_count(t, lit("\\S+")).cast("double")
    val nChars = length(t).cast("double")
    val nPunct = regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("double")
    // NULL ratio (empty doc) fails the predicate in both engines
    val quality = docs.filter(nWords >= minWords &&
      nPunct / nullif(nChars, lit(0.0)) <= maxPunctRatio)

    val wFp = Window.partitionBy(TextFunctions.fingerprint(t))
    val unique = quality
      .withColumn("__canon", min(col(idCol)).over(wFp))
      .filter(col(idCol) === col("__canon")).drop("__canon")

    val pairs =
      if (exactPairs)
        TextDedup.shingleJaccardPairs(unique, idCol, textCol,
          threshold = nearThreshold)
      else
        TextDedup.minhashPairs(unique, idCol, textCol,
          threshold = nearThreshold).select("id_a", "id_b")
    // id_b > id_a by construction: dropping every doc that is the larger
    // side of any pair keeps exactly the smallest id of each dup cluster
    // reachable through pairwise links
    unique.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  /** Overlapping token-window chunks of the kept documents. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             chunkLen: Int = 30, stride: Int = 20): DataFrame = {
    val toks = regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
    val nChunks = ceil(greatest(size(toks) - chunkLen, lit(0)) /
      lit(stride.toDouble)).cast("int") + 1
    docs.select(col(idCol), posexplode(transform(
      sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkLen))))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col").as("chunk"))
  }

  /** One-row funnel summary over the whole pipeline (the oracle form).
    * Takes the SAME thresholds as [[kept]] and threads them through both
    * its inline stage counts and the kept() call, so the per-stage
    * numbers and the final funnel can never silently diverge. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            minWords: Int = 5, maxPunctRatio: Double = 0.3,
            nearThreshold: Double = 0.6, exactPairs: Boolean = true)
      : DataFrame = {
    val t = col(textCol)
    val nWords = regexp_count(t, lit("\\S+")).cast("double")
    val nChars = length(t).cast("double")
    val nPunct = regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("double")
    val quality = docs.filter(nWords >= minWords &&
      nPunct / nullif(nChars, lit(0.0)) <= maxPunctRatio)
    val unique = quality
      .withColumn("__canon",
        min(col(idCol)).over(Window.partitionBy(TextFunctions.fingerprint(t))))
      .filter(col(idCol) === col("__canon")).drop("__canon")
    val keptDocs = kept(docs, idCol, textCol,
      minWords, maxPunctRatio, nearThreshold, exactPairs)
    docs.agg(count(lit(1)).as("n_input"))
      .crossJoin(quality.agg(count(lit(1)).as("n_quality")))
      .crossJoin(unique.agg(count(lit(1)).as("n_unique")))
      .crossJoin(keptDocs.agg(count(lit(1)).as("n_kept")))
      .crossJoin(chunks(keptDocs, idCol, textCol)
        .agg(count(lit(1)).as("n_chunks")))
  }
}
