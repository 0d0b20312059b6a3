package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent BLOOM-FILTER file-skipping index over a [[VersionedLake]]
  * — Delta's bloom filter index (`CREATE BLOOMFILTER INDEX`). Zone-map
  * stats (lo/hi, l08/l12) prune RANGE predicates on a clustered
  * column; they are useless for point lookups on an UNCORRELATED
  * column — a `user_id IN (...)` probe against a month-partitioned,
  * orderkey-clustered table opens every file, and at 100 TB that IS
  * the query cost. A per-file Bloom filter answers "might this file
  * contain this value" in metadata: the lookup reads only files whose
  * filter matches (plus any not-yet-indexed files — NEVER a false
  * negative; false positives only cost a wasted scan).
  *
  * Design points, each load-bearing at scale:
  *  - Filters attach to immutable FILES, not versions: a file's bloom
  *    never changes, so [[ensure]] is incremental — it indexes only
  *    files no sidecar covers yet (cost ∝ new files since last
  *    ensure), and carried-forward files reuse their rows across
  *    every version. Idempotent; crash-safe (a re-run re-indexes at
  *    worst, set semantics absorb duplicates).
  *  - Sidecars are parquet under `_log/bloom-*.bfi` (file-count-sized
  *    metadata, like every table format's index), NOT manifest lines:
  *    a scaled filter is KBs per file, which would bloat a text
  *    manifest past usefulness.
  *  - Both the BUILD and the PROBE compute positions through the SAME
  *    engine expression (`xxhash64(value, i) mod m`) — the
  *    [[HiddenPartitioning]] rule: never a driver-side hash
  *    reimplementation that could drift from the executors'.
  *  - Survival is computed IN SPARK (index rows broadcast-joined
  *    against the probe keys): the driver never collects bitmaps,
  *    only the surviving file list (matching-files-sized).
  *
  * Honest edges: the index column must not cross a column-mapping
  * RENAME (the build reads physical files; define on the current
  * name and rebuild after a rename), and deletion-vectored rows stay
  * in their file's filter (false positives only — the DV fold in
  * [[VersionedLake.readFiles]] still removes the rows).
  */
object BloomIndex {

  /** One filter config per lake: indexed column, filter size in bits
    * (power-of-two not required), hash count. Size m for the expected
    * max DISTINCT values per FILE: fpp ≈ (1 - e^(-k·n/m))^k. */
  final case class Cfg(col: String, mBits: Int = 32768, k: Int = 3) {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a multiple of 64")
    require(k >= 1 && k <= 8, "k in [1, 8]")
  }

  private def cfgPath(path: String) =
    new Path(s"${path.stripSuffix("/")}/_log/_bloomcfg")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Declare the lake's bloom index (one-time, any point in the
    * lake's life — [[ensure]] backfills existing files). */
  def define(spark: SparkSession, path: String, cfg: Cfg): Unit = {
    val f = fs(spark, path)
    require(!f.exists(cfgPath(path)), s"bloom index already defined at $path")
    f.mkdirs(cfgPath(path).getParent)
    val out = f.create(cfgPath(path), false)
    try out.write(s"${cfg.col}\t${cfg.mBits}\t${cfg.k}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** The recorded config (loud on an undeclared lake). */
  def cfg(spark: SparkSession, path: String): Cfg = {
    val f = fs(spark, path)
    require(f.exists(cfgPath(path)), s"no bloom index defined at $path")
    val in = f.open(cfgPath(path))
    val line =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val Array(c, m, k) = line.split('\t')
    Cfg(c, m.toInt, k.toInt)
  }

  /** The engine-side position family both build and probe evaluate:
    * k positions of `c` in an m-bit filter. */
  private def posArray(c: Column, m: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(c, lit(i)), lit(m.toLong)).cast("int")): _*)

  private def sidecarDirs(spark: SparkSession, path: String): Seq[String] = {
    val log = new Path(s"${path.stripSuffix("/")}/_log")
    val f = fs(spark, path)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bloom-")
        && st.getPath.getName.endsWith(".bfi"))
      .map(_.getPath.toString).toSeq.sorted
  }

  /** All index rows on disk: (rel, bits array<long>). */
  private def indexRows(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val dirs = sidecarDirs(spark, path)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*)
      // duplicate rows from a crashed/re-run ensure are harmless —
      // identical content, keep one
      .groupBy(col("rel")).agg(first(col("bits")).as("bits")))
  }

  /** The rels already covered by a sidecar. */
  def indexedRels(spark: SparkSession, path: String): Set[String] =
    indexRows(spark, path) match {
      case None => Set.empty
      case Some(df) =>
        df.select(col("rel")).collect().map(_.getString(0)).toSet
    } // file-count-sized planning metadata

  /** Index every data file of version `v` no sidecar covers yet —
    * incremental by construction (filters attach to immutable files).
    * Returns the newly indexed rels. */
  def ensure(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val c = cfg(spark, path)
    val base = path.stripSuffix("/")
    val live = VersionedLake.manifestFiles(spark, path, v)
      .filter(_.kind == "data").map(_.rel).distinct
    val todo = {
      val have = indexedRels(spark, path)
      live.filterNot(have)
    }
    if (todo.isEmpty) return Seq.empty
    val words = c.mBits / 64
    // one distributed pass over the new files: k positions per value,
    // distinct positions per file (<= mBits ints — bounded by the
    // filter size, never the row count)
    val positions = spark.read
      .parquet(todo.map(r => VersionedLake.resolve(base, r)): _*)
      .select(VersionedLake.relExpr(col("_metadata.file_path")).as("rel"),
        explode(posArray(col(c.col), c.mBits, c.k)).as("pos"))
      .groupBy(col("rel"))
      .agg(collect_set(col("pos")).as("ps"))
      .collect() // file-count rows, <= mBits ints each: index-sized
    val rows = positions.map { r =>
      val bits = new Array[Long](words)
      r.getSeq[Int](1).foreach(p => bits(p / 64) |= (1L << (p % 64)))
      (r.getString(0), bits.toSeq)
    }.toSeq
    import spark.implicits._
    rows.toDF("rel", "bits").coalesce(1).write
      .parquet(s"$base/_log/bloom-${VersionedLake.uniq()}.bfi")
    rows.map(_._1)
  }

  /** (files to read, indexed-file count, skipped-file count) for a
    * point-lookup over `keys` at version `v`: indexed files survive
    * iff SOME key's every position is set; un-indexed files always
    * read (no false negatives, ever). Survival computes in Spark —
    * the driver sees only the surviving list. */
  def prunedRels(spark: SparkSession, path: String, v: Int,
                 keys: DataFrame): (Set[String], Int, Int) = {
    val c = cfg(spark, path)
    val live = VersionedLake.manifestFiles(spark, path, v)
      .filter(_.kind == "data").map(_.rel).toSet
    indexRows(spark, path) match {
      case None => (live, 0, 0)
      case Some(idx) =>
        val liveIdx = idx.filter(col("rel").isin(live.toSeq: _*))
        val probes = keys.select(col(c.col).as("__k")).distinct()
          .withColumn("__pos", posArray(col("__k"), c.mBits, c.k))
        val survivors = liveIdx.join(broadcast(probes))
          .filter(expr(
            "forall(__pos, p -> shiftrightunsigned(" +
              "element_at(bits, int(p div 64) + 1), int(p % 64)) % 2 = 1)"))
          .select(col("rel")).distinct()
          .collect().map(_.getString(0)).toSet // matching-files-sized
        val indexed = liveIdx.select(col("rel"))
          .collect().map(_.getString(0)).toSet
        val toRead = survivors ++ (live -- indexed)
        (toRead, indexed.size, (indexed -- survivors).size)
    }
  }

  /** Point-lookup read: bloom-prune the file list, then the exact
    * predicate (a false positive dies in the semi-join; a wrongly
    * skipped file would LOSE rows and fail any equality gate). */
  def lookup(spark: SparkSession, path: String, keys: DataFrame,
             version: Option[Int] = None): DataFrame = {
    val c = cfg(spark, path)
    val v = version.getOrElse(VersionedLake.latestVersion(spark, path))
    val (toRead, _, _) = prunedRels(spark, path, v, keys)
    VersionedLake.readFiles(spark, path, v, toRead)
      .join(broadcast(keys.select(col(c.col)).distinct()),
        Seq(c.col), "left_semi")
  }

  /** Fold all sidecars into one, dropping rows for files no retained
    * manifest references — the index's vacuum (run it after
    * [[VersionedLake.vacuum]]). */
  def compact(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val dirs = sidecarDirs(spark, path)
    if (dirs.isEmpty) return 0
    val live = VersionedLake.versions(spark, path).flatMap(v =>
      VersionedLake.manifestFiles(spark, path, v)
        .filter(_.kind == "data").map(_.rel)).toSet
    val keep = indexRows(spark, path).get
      .filter(col("rel").isin(live.toSeq: _*))
      .collect() // index-sized
    import spark.implicits._
    val base = path.stripSuffix("/")
    keep.map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
      .toDF("rel", "bits").coalesce(1).write
      .parquet(s"$base/_log/bloom-${VersionedLake.uniq()}.bfi")
    dirs.foreach(d => f.delete(new Path(d), true))
    keep.length
  }
}
