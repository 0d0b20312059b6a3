package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet lake: immutable data files + a per-version
  * manifest listing the files that ARE the table at that version — the
  * Delta/Iceberg commit-log shape reduced to its load-bearing core,
  * giving [[PartitionedLake]]'s upsert pattern what every production
  * table format has and a bare parquet directory cannot: READ AT
  * VERSION (time travel), snapshot isolation for concurrent readers,
  * and an auditable commit history.
  *
  * Layout:
  * {{{
  *   path/data/c000001/__part=<v>/part-*.parquet   commit 1's files
  *   path/data/c000002/__part=<v>/part-*.parquet   commit 2's files
  *   path/_log/000001.manifest                      version 1 file list
  *   path/_log/000002.manifest                      version 2 file list
  * }}}
  *
  * Every commit only ADDS data files (under its own `c<k>` directory)
  * and writes ONE new manifest; nothing is ever mutated or deleted, so
  * a reader holding version k's file list is immune to any later
  * commit — the concurrent-reader-sees-old-version guarantee LakeSpec
  * pins, and the property [[PartitionedLake]]'s in-place dynamic
  * overwrite cannot offer (its upsert physically replaces partition
  * files under a running reader).
  *
  * A manifest is a text file: header line `version=<k> op=<op>`, then
  * one `<part>\t<relpath>` line per live data file. Manifest IO is
  * driver-side metadata — file-count-sized, the same scale as every
  * table format's log — while row data only ever moves through
  * executor parquet scans. An upsert commit's manifest carries
  * FORWARD the previous version's entries for untouched partitions
  * (pointers, not data: unchanged partitions are never rewritten —
  * cost ∝ the delta, the c02/st11 discipline applied to versioning).
  *
  * The partition column stays a REGULAR column in the data files (the
  * physical write partitions on a `__part` duplicate), so reading a
  * manifest's file list needs no partition-dir discovery — and
  * [[readVersion]]'s optional `parts` filter prunes at the MANIFEST,
  * the versioned form of partition pruning: pruned files never reach
  * the reader at all.
  */
object VersionedLake {

  private val PartDir = "__part"

  private def logDir(path: String) = new Path(s"${path.stripSuffix("/")}/_log")
  private def dataDir(path: String, k: Int) =
    s"${path.stripSuffix("/")}/data/c${"%06d".format(k)}"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending (empty for a fresh lake). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = logDir(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toInt).toSeq.sorted
  }

  /** The newest committed version (0 for a fresh lake). */
  def latestVersion(spark: SparkSession, path: String): Int =
    versions(spark, path).lastOption.getOrElse(0)

  /** One live data file in a version: partition value, lake-relative
    * path, and optional (lo, hi) key-range ZONE-MAP stats on the
    * commit's stats column — the Iceberg manifest-row shape: the
    * version log and the data-skipping index are ONE structure, so a
    * time-travel read prunes files the same way a latest read does. */
  final case class FileEntry(part: String, rel: String,
                             lo: Option[Long] = None,
                             hi: Option[Long] = None)

  /** File entries of version `v`'s manifest. */
  private def manifestEntries(spark: SparkSession, path: String,
                              v: Int): Seq[FileEntry] = {
    val mf = new Path(logDir(path), s"${"%06d".format(v)}.manifest")
    val f = fs(spark, path)
    require(f.exists(mf), s"no manifest for version $v at $path")
    val in = f.open(mf)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.drop(1).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(part, rel) => FileEntry(part, rel)
        case Array(part, rel, lo, hi) =>
          FileEntry(part, rel, Some(lo.toLong), Some(hi.toLong))
        case other => throw new IllegalArgumentException(
          s"malformed manifest line: ${other.mkString("\\t")}")
      }
    }.toSeq
  }

  private def writeManifest(spark: SparkSession, path: String, v: Int,
                            op: String, entries: Seq[FileEntry],
                            txn: Option[Long] = None,
                            carriedTxns: Set[Long] = Set.empty): Unit = {
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    val mf = new Path(logDir(path), s"${"%06d".format(v)}.manifest")
    val head = s"version=$v op=$op" +
      txn.map(t => s" txn=$t").getOrElse("") +
      (if (carriedTxns.isEmpty) ""
       else s" txns=${carriedTxns.toSeq.sorted.mkString(",")}")
    val body = (head +:
      entries.sortBy(e => (e.part, e.rel)).map { e =>
        s"${e.part}\t${e.rel}" + ((e.lo, e.hi) match {
          case (Some(l), Some(h)) => s"\t$l\t$h"
          case _ => ""
        })
      }).mkString("\n")
    // write-temp-then-RENAME: a crash mid-write must never leave a
    // torn manifest that parses as a valid shorter file list (a later
    // vacuum would then delete the "unreferenced" tail files — silent
    // permanent loss); rename is the atomic commit point, the same
    // protocol every log-structured table format uses (r10 review)
    val tmp = new Path(logDir(path), s"${"%06d".format(v)}.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write((body + "\n").getBytes("UTF-8")) finally out.close()
    if (f.exists(mf)) f.delete(mf, false)
    require(f.rename(tmp, mf), s"manifest rename failed for version $v")
    txnCache.get(path.stripSuffix("/")).foreach { c =>
      txn.foreach(t => c.add(Long.box(t)))
      carriedTxns.foreach(t => c.add(Long.box(t)))
    }
  }

  /** Per-JVM txn-set cache, appended on every commit: without it a
    * streaming ingest pays O(versions) manifest-header reads per
    * micro-batch just to decide a commit is new (r10 review). Single-
    * writer-per-table is the assumed discipline, as in every log-
    * structured format without an external lock service; a fresh JVM
    * (or a vacuumed log) repopulates from disk on first use. */
  private val txnCache = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.ConcurrentHashMap.KeySetView[
      java.lang.Long, java.lang.Boolean]]

  private def headerTxns(header: String): Seq[Long] =
    header.split(' ').toSeq.flatMap {
      case kv if kv.startsWith("txn=") =>
        Seq(kv.stripPrefix("txn=").toLong)
      case kv if kv.startsWith("txns=") =>
        kv.stripPrefix("txns=").split(',').toSeq
          .filter(_.nonEmpty).map(_.toLong)
      case _ => Seq.empty
    }

  private def readManifestHeader(spark: SparkSession, path: String,
                                 v: Int): String = {
    val f = fs(spark, path)
    val mf = new Path(logDir(path), s"${"%06d".format(v)}.manifest")
    val in = f.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().nextOption().getOrElse("")
    finally in.close()
  }

  /** Transaction ids recorded in the log — served from the per-JVM
    * cache after one initial header scan. Includes txns preserved by
    * [[vacuum]] through the `txns=` carry-forward attribute. */
  private def committedTxns(spark: SparkSession,
                            path: String): scala.collection.Set[Long] = {
    val key = path.stripSuffix("/")
    import scala.jdk.CollectionConverters._
    txnCache.getOrElseUpdate(key, {
      val set = java.util.concurrent.ConcurrentHashMap
        .newKeySet[java.lang.Long]()
      versions(spark, path)
        .flatMap(v => headerTxns(readManifestHeader(spark, path, v)))
        .foreach(t => set.add(t))
      set
    }).asScala.map(_.longValue)
  }

  /** Decode Hive path-escaping (%XX) in a partition DIR name back to
    * the raw partition value: the physical write escapes characters
    * like ':', '/', '%' into `__part=2024-01-01 00%3A00` form, but the
    * manifest stores — and every API compares against — RAW values
    * (r10 review: the escaped form silently missed `parts` filters and
    * commitMerge's anti-join for values needing escapes). */
  private def unescapePathName(name: String): String = {
    val sb = new StringBuilder(name.length)
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == '%' && i + 2 < name.length) {
        val hex = name.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** List commit k's data files from the FS — metadata-scale, one
    * listing per written partition dir. */
  private def commitEntries(spark: SparkSession, path: String,
                            k: Int): Seq[FileEntry] = {
    val root = new Path(dataDir(path, k))
    val f = fs(spark, path)
    f.listStatus(root).iterator
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(PartDir + "="))
      .flatMap { dir =>
        val part =
          unescapePathName(dir.getPath.getName.stripPrefix(PartDir + "="))
        f.listStatus(dir.getPath).iterator
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => FileEntry(part,
            s"data/c${"%06d".format(k)}/${dir.getPath.getName}/" +
              s.getPath.getName))
      }.toSeq
  }

  /** Per-file (lo, hi) of `statsCol` for a fresh commit's files — the
    * zone-map stats a production format lifts from the parquet footers
    * it just wrote (one bootstrap aggregate here; identical content).
    * File-count-sized collect: planning metadata, never row data. */
  private def enrichStats(spark: SparkSession, path: String, k: Int,
                          entries: Seq[FileEntry],
                          statsCol: String): Seq[FileEntry] = {
    val byRel = spark.read.parquet(dataDir(path, k))
      .groupBy(input_file_name().as("f"))
      .agg(min(col(statsCol).cast("long")).as("lo"),
        max(col(statsCol).cast("long")).as("hi"))
      .collect().flatMap { r =>
        // a file whose statsCol is all NULL has no zone — leave the
        // entry stat-less (the conservative-keep path) instead of
        // NPEing the commit after its data already landed (r10 review)
        if (r.isNullAt(1) || r.isNullAt(2)) None
        else {
          val u = r.getString(0)
          // normalize the URI to the lake-relative form the manifest
          // stores, independent of filesystem qualification quirks
          val i = u.lastIndexOf("/data/c")
          Some((u.substring(i + 1), (r.getLong(1), r.getLong(2))))
        }
      }.toMap
    entries.map(e => byRel.get(e.rel)
      .fold(e)(s => e.copy(lo = Some(s._1), hi = Some(s._2))))
  }

  private def writeCommitData(df: DataFrame, partCol: String,
                              path: String, k: Int): Unit =
    // the physical layout partitions on a DUPLICATE of the partition
    // column so the original survives IN the data files — a manifest
    // file list then reads back complete with no partition-dir
    // discovery or basePath gymnastics
    df.withColumn(PartDir, col(partCol))
      .write.mode("overwrite").partitionBy(PartDir)
      .parquet(dataDir(path, k))

  /** Commit a FULL snapshot: the new version's manifest lists only
    * this commit's files. `statsCol` records per-file (lo, hi)
    * zone-map stats in the manifest — [[readVersionRange]]'s prune
    * index. Returns the new version number. */
  def commitOverwrite(df: DataFrame, partCol: String, path: String,
                      statsCol: Option[String] = None): Int =
    doCommit(df, partCol, path, None, Mode.Overwrite, statsCol)

  /** Commit an UPSERT: partitions present in `df` are replaced (their
    * old files stay on disk for older versions but leave the
    * manifest), untouched partitions carry forward by pointer —
    * stats and all. Returns the new version number. */
  def commitUpsert(df: DataFrame, partCol: String, path: String,
                   statsCol: Option[String] = None): Int =
    doCommit(df, partCol, path, None, Mode.Upsert, statsCol)

  /** Commit an APPEND: this commit's files JOIN the table next to
    * every previous file — no partition is replaced. The streaming-
    * ingest commit (new rows accumulate within their partitions);
    * restatements use [[commitUpsert]]. Returns the new version. */
  def commitAppend(df: DataFrame, partCol: String, path: String,
                   statsCol: Option[String] = None): Int =
    doCommit(df, partCol, path, None, Mode.Append, statsCol)

  private object Mode extends Enumeration {
    val Overwrite, Upsert, Append = Value
  }

  private def doCommit(df: DataFrame, partCol: String, path: String,
                       txn: Option[Long], mode: Mode.Value,
                       statsCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    val prev = latestVersion(spark, path)
    val k = prev + 1
    writeCommitData(df, partCol, path, k)
    val fresh0 = commitEntries(spark, path, k)
    val fresh =
      statsCol.fold(fresh0)(sc => enrichStats(spark, path, k, fresh0, sc))
    val replaced = fresh.map(_.part).toSet
    val kept =
      if (prev == 0 || mode == Mode.Overwrite) Seq.empty
      else if (mode == Mode.Upsert) manifestEntries(spark, path, prev)
        .filterNot(e => replaced.contains(e.part))
      else manifestEntries(spark, path, prev)
    writeManifest(spark, path, k, mode.toString.toLowerCase,
      kept ++ fresh, txn)
    k
  }

  /** Exactly-once STREAMING commit (the Delta `txnAppId`/`txnVersion`
    * protocol reduced to its core): `txn` identifies the micro-batch —
    * foreachBatch's batchId. If the log already records `txn`, the
    * commit is a NO-OP returning the current version: checkpointed
    * at-least-once replay after a sink failure must not fork history
    * or double-apply the batch. This is the versioned-lake form of
    * [[PartitionedLake.upsertBatch]]'s rewrite-your-own-partition
    * idempotence — here the dedup is at the COMMIT, so replayed work
    * is skipped entirely rather than rewritten byte-identically. */
  def commitBatchUpsert(df: DataFrame, partCol: String, path: String,
                        txn: Long): Int = {
    val spark = df.sparkSession
    if (committedTxns(spark, path).contains(txn))
      latestVersion(spark, path)
    else doCommit(df, partCol, path, Some(txn), Mode.Upsert)
  }

  /** [[commitAppend]] with [[commitBatchUpsert]]'s txn dedup — the
    * streaming-ingest commit: batches sharing a partition ACCUMULATE,
    * a replayed batch is skipped at the commit. A crash between data
    * write and manifest write leaves only an unreferenced c-dir,
    * which [[vacuum]] reclaims — never a torn version. */
  def commitBatchAppend(df: DataFrame, partCol: String, path: String,
                        txn: Long): Int = {
    val spark = df.sparkSession
    if (committedTxns(spark, path).contains(txn))
      latestVersion(spark, path)
    else doCommit(df, partCol, path, Some(txn), Mode.Append)
  }

  /** Keyed MERGE INTO the latest version (the Delta/Iceberg MERGE
    * reduced to its upsert core: update matched keys' payload, insert
    * unmatched keys), executed PARTITION-PRUNED: only the partitions
    * present in the delta are read (through the manifest), merged
    * with one anti-join, and committed — untouched partitions carry
    * forward by pointer, so cost ∝ touched partitions + delta, never
    * table size. Because the layout is append-only, the rewrite reads
    * old files while writing NEW ones — no durable-copy staging step
    * ([[PartitionedLake.overwriteBuckets]]'s materialize-first rule
    * exists because in-place overwrite deletes what it reads; a
    * versioned commit structurally cannot).
    *
    * Invariant the caller owns (as in every partition-pruned MERGE):
    * a key's partition value is stable — a delta row whose partition
    * differs from its stored row's lands as a duplicate key in the
    * new partition, because the old partition is never opened.
    *
    * @param delta full-payload rows: updates carry the new payload for
    *        existing keys, inserts carry new keys
    * @return the new version number */
  def commitMerge(delta: DataFrame, keyCols: Seq[String],
                  partCol: String, path: String,
                  statsCol: Option[String] = None): Int = {
    val spark = delta.sparkSession
    val v = latestVersion(spark, path)
    require(v > 0, "commitMerge needs an existing version to merge into")
    // partition-count-sized collect: the touched-partition list is
    // planning metadata, the same scale as the manifest itself
    val parts = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val touched = manifestEntries(spark, path, v)
      .exists(e => parts.contains(e.part))
    val current =
      if (touched) readVersion(spark, path, v, parts)
      else delta.limit(0) // delta opens a brand-new partition
    val merged = current
      .join(delta.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(delta)
    doCommit(merged, partCol, path, None, Mode.Upsert, statsCol)
  }

  /** OPTIMIZE: compact every partition of the LATEST version holding
    * more than one file into a single file, as a normal COMMIT —
    * Delta's OPTIMIZE verb on this log. Content is unchanged (pure
    * re-layout: the new version reads equal); already-single-file
    * partitions carry forward by pointer, untouched. The streaming
    * counterpart of [[PartitionedLake.compactAll]] for the versioned
    * layout, with two structural upgrades: no durable-copy staging
    * step (the rewrite reads old immutable files while writing new
    * ones), and readers pinned to any pre-optimize version are
    * unaffected — the fragments they reference are reclaimed later by
    * [[vacuum]], never yanked mid-query. `statsCol` re-records
    * zone-map stats for the compacted files. A partition too large
    * for one task takes a salt alongside `partCol` at production
    * sizes (the compactAll note); single-file is the fixture shape.
    * Returns the new version, or the current one if nothing needed
    * compacting.
    *
    * @param partCol the lake's partition column (a data column in
    *        every file by construction — [[writeCommitData]]) */
  def commitOptimize(spark: SparkSession, path: String, partCol: String,
                     statsCol: Option[String] = None): Int = {
    val v = latestVersion(spark, path)
    require(v > 0, "commitOptimize needs an existing version")
    val byPart = manifestEntries(spark, path, v)
      .groupBy(_.part).filter(_._2.size > 1)
    if (byPart.isEmpty) v
    else {
      // one single-partition frame per fragmented value: the
      // partitioned write then lands exactly one file each — the
      // l07/compactAll one-task-per-value discipline on this log
      val base = path.stripSuffix("/")
      val merged = byPart.toSeq.sortBy(_._1).map { case (_, es) =>
        spark.read.parquet(es.map(e => s"$base/${e.rel}"): _*)
          .coalesce(1)
      }.reduce(_.unionByName(_))
      doCommit(merged, partCol, path, None, Mode.Upsert, statsCol)
    }
  }

  /** CHANGE-DATA-FEED read between two committed versions (Delta's
    * `table_changes` shape, computed rather than stored): the MANIFEST
    * diff names the partitions whose file sets differ — untouched
    * partitions are provably identical (same file pointers) and are
    * NEVER READ — then one full-outer join on the key over just those
    * partitions classifies every row as added / removed / changed.
    * Cost ∝ churned partitions + their rows, not table size: the
    * q56 snapshot-diff discipline executed AT the table layer, where
    * the commit log already knows what moved. Requires `keyCols`
    * unique per row (the MERGE key discipline).
    *
    * @return keyCols ++ (change_kind, <valueCol>_before,
    *         <valueCol>_after), unchanged rows dropped */
  def changesBetween(spark: SparkSession, path: String, vFrom: Int,
                     vTo: Int, keyCols: Seq[String],
                     valueCol: String): DataFrame = {
    val base = path.stripSuffix("/")
    def byPart(v: Int): Map[String, Set[String]] =
      manifestEntries(spark, path, v).groupBy(_.part)
        .map { case (p, es) => p -> es.map(_.rel).toSet }
    val (a, b) = (byPart(vFrom), byPart(vTo))
    val churned = (a.keySet ++ b.keySet)
      .filter(p => a.get(p) != b.get(p))
    // row presence is tracked by an explicit per-side flag, never by
    // the VALUE column's nullness: a legitimately-NULL value must not
    // masquerade as a missing row (r10 review — NULL->5 is a change,
    // not an add; 5->NULL a change, not a removal)
    def readSide(m: Map[String, Set[String]], alias: String)
        : Option[DataFrame] = {
      val files = churned.toSeq.sorted
        .flatMap(p => m.getOrElse(p, Set.empty).toSeq.sorted)
        .map(rel => s"$base/$rel")
      if (files.isEmpty) None
      else Some(spark.read.parquet(files: _*)
        .select((keyCols.map(col) :+
          col(valueCol).as(s"${valueCol}_$alias") :+
          lit(true).as(s"__in_$alias")): _*))
    }
    val (bf, af) = (readSide(a, "before"), readSide(b, "after"))
    def absent(df: DataFrame, alias: String): DataFrame = {
      val other = if (alias == "before") "after" else "before"
      df.withColumn(s"${valueCol}_$alias",
          lit(null).cast(df.schema(s"${valueCol}_$other").dataType))
        .withColumn(s"__in_$alias", lit(false))
    }
    val joined = (bf, af) match {
      case (Some(x), Some(y)) => x.join(y, keyCols, "full_outer")
      case (Some(x), None) => absent(x, "after")
      case (None, Some(y)) => absent(y, "before")
      case (None, None) =>
        // zero churned partitions: an empty change feed with the
        // declared schema, derived from the target version's data
        val empty = readVersion(spark, path, vTo).limit(0)
        empty.select((keyCols.map(col) :+
            col(valueCol).as(s"${valueCol}_before")): _*)
          .withColumn(s"${valueCol}_after", col(s"${valueCol}_before"))
          .withColumn("__in_before", lit(true))
          .withColumn("__in_after", lit(true))
    }
    val vb = col(s"${valueCol}_before")
    val va = col(s"${valueCol}_after")
    val inB = coalesce(col("__in_before"), lit(false))
    val inA = coalesce(col("__in_after"), lit(false))
    joined
      .withColumn("change_kind",
        when(!inB, "added")
          .when(!inA, "removed")
          .when(vb.isNull =!= va.isNull, "changed")
          .when(vb.isNotNull && va.isNotNull && vb =!= va, "changed")
          .otherwise("unchanged"))
      .filter(col("change_kind") =!= "unchanged")
      .select((keyCols.map(col) :+ col("change_kind") :+ vb :+ va): _*)
  }

  /** Data files under `path/data` referenced by NO retained manifest —
    * what [[vacuum]] deletes; exposed so callers can assert a clean
    * lake (zero orphans) after maintenance. Returns relpaths. */
  def unreferencedDataFiles(spark: SparkSession,
                            path: String): Seq[String] = {
    val f = fs(spark, path)
    val base = path.stripSuffix("/")
    val live = versions(spark, path)
      .flatMap(v => manifestEntries(spark, path, v)).map(_.rel).toSet
    val dataRoot = new Path(s"$base/data")
    if (!f.exists(dataRoot)) Seq.empty
    else {
      val qualBase = f.makeQualified(new Path(base)).toString
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = f.listFiles(dataRoot, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString.stripPrefix(qualBase + "/")
          if (!live.contains(rel)) out += rel
        }
      }
      out.toSeq
    }
  }

  /** Retention VACUUM: drop every version but the newest `retain`,
    * then physically delete the data files no retained manifest
    * references. Completes the lifecycle — without it a versioned
    * lake only ever grows. The trade is explicit: a vacuumed version
    * is gone (its readVersion fails loudly on the missing manifest),
    * and `retain` is the concurrent-reader grace window — size it to
    * the longest-running query, exactly Delta/Iceberg's retention
    * rule. Driver-side metadata throughout (manifest reads + one
    * recursive listing); row data never moves. Returns
    * (versionsDropped, filesDeleted). */
  def vacuum(spark: SparkSession, path: String,
             retain: Int): (Int, Int) = {
    require(retain >= 1, "vacuum must retain at least one version")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val dropped = vs.dropRight(retain)
    // PRESERVE the dropped manifests' txn ids by folding them into the
    // newest retained manifest's `txns=` attribute BEFORE deleting:
    // otherwise a checkpoint replay of a batch older than the
    // retention window would re-apply it as a fresh commit — exactly
    // the fork commitBatch* promises cannot happen (r10 review; the
    // Delta analogue carries txn state forward in the latest snapshot)
    val droppedTxns = dropped
      .flatMap(v => headerTxns(readManifestHeader(spark, path, v))).toSet
    if (droppedTxns.nonEmpty) {
      val newest = vs.last
      val header = readManifestHeader(spark, path, newest)
      val op = header.split(' ').collectFirst {
        case kv if kv.startsWith("op=") => kv.stripPrefix("op=")
      }.getOrElse("upsert")
      val ownTxn = header.split(' ').collectFirst {
        case kv if kv.startsWith("txn=") => kv.stripPrefix("txn=").toLong
      }
      val carried = headerTxns(header).toSet -- ownTxn ++ droppedTxns
      writeManifest(spark, path, newest, op,
        manifestEntries(spark, path, newest), ownTxn, carried)
    }
    // drop the manifests after: a crash between the phases then
    // leaves only unreferenced-but-present files (re-vacuumable),
    // never a manifest pointing at deleted files or a lost txn
    dropped.foreach { v =>
      f.delete(new Path(logDir(path), s"${"%06d".format(v)}.manifest"),
        false)
    }
    val base = path.stripSuffix("/")
    val orphans = unreferencedDataFiles(spark, path)
    orphans.foreach(rel => f.delete(new Path(s"$base/$rel"), false))
    (dropped.size, orphans.size)
  }

  /** Version `v`'s manifest as public metadata (the Iceberg `.files`
    * metadata-view shape) — partition values, file pointers, and any
    * zone-map stats, for planning-side inspection. */
  def manifestFiles(spark: SparkSession, path: String,
                    v: Int): Seq[FileEntry] =
    manifestEntries(spark, path, v)

  /** Read the lake AS OF version `v` — the time-travel read. `parts`
    * non-empty prunes at the manifest: only the named partitions'
    * files reach the reader. */
  def readVersion(spark: SparkSession, path: String, v: Int,
                  parts: Seq[String] = Seq.empty): DataFrame = {
    val entries = manifestEntries(spark, path, v)
    val wanted =
      if (parts.isEmpty) entries
      else entries.filter(e => parts.contains(e.part))
    val base = path.stripSuffix("/")
    val files = wanted.map(e => s"$base/${e.rel}")
    require(files.nonEmpty, s"version $v has no files for parts $parts")
    spark.read.parquet(files: _*)
  }

  /** Zone-map-pruned time-travel read: only the files of version `v`
    * whose manifest [lo, hi] stats intersect [qLo, qHi] reach the
    * reader — the Iceberg planning shape, where the commit log IS the
    * skipping index, so a range query against LAST YEAR's snapshot
    * prunes exactly like one against today's. Files without stats
    * (committed with no statsCol) are conservatively kept: zones
    * prune, they never lie. The caller still applies the row-level
    * predicate. Returns (reader, matchedFiles, totalFiles). */
  def readVersionRange(spark: SparkSession, path: String, v: Int,
                       qLo: Long, qHi: Long,
                       parts: Seq[String] = Seq.empty)
      : (DataFrame, Long, Long) = {
    val entries = manifestEntries(spark, path, v)
      .filter(e => parts.isEmpty || parts.contains(e.part))
    val wanted = entries.filter(e => (e.lo, e.hi) match {
      case (Some(l), Some(h)) => h >= qLo && l <= qHi
      case _ => true
    })
    val base = path.stripSuffix("/")
    val files = wanted.map(e => s"$base/${e.rel}")
    require(files.nonEmpty, s"version $v: range prune emptied the file list")
    (spark.read.parquet(files: _*), wanted.size.toLong,
      entries.size.toLong)
  }

  /** Read the newest version. */
  def readLatest(spark: SparkSession, path: String,
                 parts: Seq[String] = Seq.empty): DataFrame =
    readVersion(spark, path, latestVersion(spark, path), parts)

  /** Drop every version's state — a fresh-lake reset for fixtures.
    * Also drops the path's txn cache: a reborn lake must not inherit
    * the old history's replay-dedup set. */
  def reset(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
    txnCache.remove(path.stripSuffix("/"))
    ()
  }
}
