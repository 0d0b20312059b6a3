package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HIDDEN PARTITIONING over [[VersionedLake]] — Iceberg's partition
  * transforms (Iceberg spec §"Partition Transforms"; Delta approximates
  * the same with generated columns). The table DECLARES its layout as
  * a transform of a source column (`month(l_shipdate)`,
  * `bucket(8, l_orderkey)`, `truncate(1000, k)`, `day(ts)`); writers
  * derive the partition value automatically and readers never mention
  * it — they filter on the SOURCE column and the engine converts the
  * predicate into partition pruning through the same transform
  * (Iceberg's inclusive projection). This kills the classic failure
  * mode of explicit partition columns at 100 TB: a user filtering on
  * `l_shipdate` while the table partitions on a hand-derived `month`
  * string silently full-scans; with the transform recorded IN the
  * table, the prune is automatic and un-skippable.
  *
  * The spec is table metadata (`_log/_partspec`), and it EVOLVES the
  * Iceberg way ([[evolve]]): a new transform governs commits from the
  * next version on, files written earlier keep their era's spec, and
  * reads project the predicate through EVERY era's transform, unioning
  * the pruned partition sets — data is never rewritten to change a
  * table's layout granularity (at 100 TB a month→day re-partition of
  * history is exactly the migration cost spec evolution exists to
  * avoid). The derived partition column is internal (`__p` by
  * default) and DROPPED from every read.
  *
  * Pruning is metadata-only either way, and composes with l25's
  * segmented manifests: the pruned partition set flows into
  * [[VersionedLake.readVersion]]'s parts filter, which skips
  * un-probed partitions' segment files at the POINTER.
  *
  * Two predicate shapes, matching Iceberg's projection rules:
  *  - RANGE ([[readBetween]]) for MONOTONIC transforms (month / day /
  *    truncate / identity): the partition interval is the transform of
  *    the bounds.
  *  - MATCHING ([[readMatching]]) for point lookups under ANY
  *    transform including bucket: the probe keys' partition values
  *    compute through the ENGINE's own expression (a keys-sized Spark
  *    aggregate — never a driver-side hash reimplementation that
  *    could drift from the executor's), then the read semi-joins the
  *    pruned partitions against the keys.
  */
object HiddenPartitioning {

  sealed trait Transform {
    /** Serialized form stored in `_log/_partspec`. */
    def tag: String
    /** The engine-side derivation: source column -> STRING partition
      * value (the one definition writers AND probe-side pruning both
      * evaluate — they can never disagree). */
    def expr(src: Column): Column
    /** Monotonic transforms admit range projection. */
    def monotonic: Boolean
    /** Driver-side transform of a range BOUND (monotonic only). */
    def bound(v: String): String
  }

  case object Month extends Transform {
    val tag = "month"
    def expr(src: Column): Column = date_format(src, "yyyy-MM")
    val monotonic = true
    def bound(v: String): String = v.substring(0, 7)
  }

  case object Day extends Transform {
    val tag = "day"
    def expr(src: Column): Column = date_format(src, "yyyy-MM-dd")
    val monotonic = true
    def bound(v: String): String = v.substring(0, 10)
  }

  /** Hash bucket (Iceberg `bucket[N]`): point lookups prune to at most
    * |keys| of N partitions; ranges don't project (hashing destroys
    * order) — exactly Iceberg's rule. */
  final case class Bucket(n: Int) extends Transform {
    require(n > 1, "bucket needs n > 1")
    val tag = s"bucket[$n]"
    def expr(src: Column): Column =
      pmod(xxhash64(src), lit(n.toLong)).cast("string")
    val monotonic = false
    def bound(v: String): String =
      throw new UnsupportedOperationException(
        "bucket transform does not project ranges")
  }

  /** Width-`w` numeric truncation (Iceberg `truncate[W]`).
    *
    * MIGRATION NOTE (r13 → r14, r13 advice): the engine expression
    * moved from double-division floor to exact integer arithmetic.
    * The two agree for every |v| < 2^53; a lake whose truncate
    * partition strings were derived by the OLD expression from values
    * at or beyond 2^53 may hold partition dir/manifest values the
    * exact [[bound]] math no longer reproduces, and pruned reads
    * would skip them. No lake this library wrote is affected (the
    * expression landed in the same round as the first truncate lake,
    * and the fixture domain is far below 2^53), so the tag is NOT
    * versioned; a foreign lake in that regime must be restated with
    * a spec-derived overwrite before pruned reads are trusted. */
  final case class Truncate(w: Long) extends Transform {
    require(w > 0, "truncate needs w > 0")
    val tag = s"truncate[$w]"
    // Exact integer arithmetic (Iceberg's `v - (((v % W) + W) % W)`):
    // a double-division floor would lose ULPs past 2^53 and let the
    // engine-derived partition string disagree with bound()'s exact
    // Math.floorDiv — the silent-row-loss mode pruning must never have.
    def expr(src: Column): Column = {
      val v = src.cast("long")
      (v - pmod(v, lit(w))).cast("string")
    }
    val monotonic = true
    def bound(v: String): String =
      (Math.floorDiv(v.toLong, w) * w).toString
  }

  final case class Spec(srcCol: String, transform: Transform,
                        partCol: String = "__p")

  private def specPath(path: String) =
    new Path(s"${path.stripSuffix("/")}/_log/_partspec")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Record the table's partition spec. One-time, before the first
    * commit (a spec must cover every data file ever written — spec
    * evolution is the documented out-of-scope edge). */
  def define(spark: SparkSession, path: String, spec: Spec): Unit = {
    require(VersionedLake.latestVersion(spark, path) == 0,
      s"partition spec must be defined before the first commit at $path")
    val f = fs(spark, path)
    require(!f.exists(specPath(path)),
      s"partition spec already defined at $path")
    f.mkdirs(specPath(path).getParent)
    val out = f.create(specPath(path), false)
    try out.write(
      s"${spec.transform.tag}\t${spec.srcCol}\t${spec.partCol}\n"
        .getBytes("UTF-8"))
    finally out.close()
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  private def parseSpec(line: String): Spec = {
    val Array(tag, src, part) = line.split('\t')
    val t = tag match {
      case "month" => Month
      case "day" => Day
      case BucketRe(n) => Bucket(n.toInt)
      case TruncRe(w) => Truncate(w.toLong)
      case other =>
        throw new IllegalArgumentException(s"unknown transform $other")
    }
    Spec(src, t, part)
  }

  private def readSpecFile(spark: SparkSession, p: Path): Spec = {
    val in = fs(spark, p.toString).open(p)
    val line =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    parseSpec(line)
  }

  /** Whether `path` declares hidden partitioning — the cheap probe
    * surfaces ([[GraftLakeSource]]) use to route reads/writes through
    * the spec without paying a loud failure. */
  def declared(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(specPath(path))

  /** Every recorded spec with the first version it governs, ordered:
    * the definition spec governs from version 0, each [[evolve]]d one
    * from the version recorded in its filename (`_partspec.<from>`).
    * Metadata-sized (spec-count files). */
  def specs(spark: SparkSession, path: String): Seq[(Int, Spec)] = {
    val f = fs(spark, path)
    require(f.exists(specPath(path)), s"no partition spec at $path")
    val base = (0, readSpecFile(spark, specPath(path)))
    val evolved = f.listStatus(specPath(path).getParent).iterator
      .filter(st => st.isFile &&
        st.getPath.getName.startsWith("_partspec."))
      .map(st => (st.getPath.getName.stripPrefix("_partspec.").toInt,
        readSpecFile(spark, st.getPath)))
      .toSeq
    (base +: evolved).sortBy(_._1)
  }

  /** The ACTIVE spec — what writers derive through (fails loudly on
    * an undeclared lake). */
  def spec(spark: SparkSession, path: String): Spec =
    specs(spark, path).last._2

  /** Era-inference fallback for legacy UNTAGGED entries: the spec
    * governing the entry's write era (data entries carry their commit
    * version as era; era-less entries predate evolution and take the
    * definition spec). */
  private def eraSpecId(all: Seq[(Int, Spec)], era: Option[Int]): Int = {
    val e = era.getOrElse(0)
    all.reverse.collectFirst { case (from, _) if from <= e => from }
      .getOrElse(all.head._1)
  }

  /** The spec a data entry's partitions PROJECT through on read, or
    * None when the entry records a spec id UNKNOWN to this table's
    * timeline. PRIMARY: the entry's own `P<id>` tag (written by every
    * spec-derived commit since round 14 — Iceberg's per-data-file
    * spec id), attribution BY RECORD: it stays correct under any
    * evolve/commit race and under rewrites (OPTIMIZE/MERGE) that
    * re-era files without re-deriving their partition values.
    * FALLBACK for untagged legacy entries: era inference
    * ([[eraSpecId]]). An UNKNOWN recorded id (a foreign manifest, or
    * a tag written against a transient spec file an [[evolve]] retry
    * later retracted — the r14-advice race) must NOT era-infer: the
    * value may have been derived under a DIFFERENT transform than the
    * era's spec, and projecting through the wrong transform prunes
    * partitions holding matching rows (silent row loss). None =
    * non-projectable — every read admits all of that entry's
    * partitions, the same conservative union a cross-column era takes;
    * the row predicate stays exact either way. */
  private def projectionSpec(all: Seq[(Int, Spec)],
                             specId: Option[Int],
                             era: Option[Int]): Option[Spec] =
    specId match {
      case Some(id) => all.find(_._1 == id).map(_._2)
      case None => Some(specById(all, eraSpecId(all, era)))
    }

  private def specById(all: Seq[(Int, Spec)], id: Int): Spec =
    all.find(_._1 == id).get._2

  /** EVOLVE the partition spec (Iceberg partition-spec evolution):
    * commits from the NEXT version derive through `newSpec`; every
    * file already written keeps its era's spec, and range/point reads
    * project through both and union the pruned sets — history is
    * never rewritten. The transform AND the source column may change
    * (r14 closed the cross-column refusal — Iceberg allows
    * re-partitioning on a different column): a predicate on column X
    * prunes exactly the eras whose spec DERIVES X, any other era
    * admits all its partitions (the conservative union — the row
    * predicate stays exact either way). Only the INTERNAL partition
    * column is fixed for the table's life (it names the physical
    * layout directory level).
    *
    * Post-evolution REPLACEMENT semantics the caller owns: an upsert/
    * overwrite replaces partitions by the NEW spec's values only —
    * restating pre-evolution rows takes the keyed verbs
    * ([[VersionedLake.commitMerge]]/[[VersionedLake.commitMergeDv]])
    * or a full overwrite, exactly Iceberg's dynamic-overwrite caveat
    * under an evolved spec.
    *
    * CONCURRENCY (r13 advice): the spec file alone is not a version
    * claim, so a writer racing this evolve can claim version `from`
    * with partitions it derived under the OLD spec. Attribution is
    * safe regardless — every spec-derived commit tags its entries
    * with the spec id that derived them ([[projectionSpec]]), so a
    * race can never flip a file into the wrong projection. What the
    * OCC loop below protects is the GOVERNANCE BOUNDARY itself (the
    * era-inference fallback for legacy untagged entries, and
    * [[specs]]' reported from-versions): after the spec file lands,
    * the head is re-checked; if a commit claimed `from` concurrently
    * the evolve DELETES its file and retries at a fresh version —
    * a recorded boundary never sits at or below a version whose
    * files it did not govern. The retry's DELETE is itself safe even
    * though the transient file was briefly observable (r14 advice): a
    * writer that derived through it tagged its entries with the
    * retracted id, and an id unknown to the timeline is
    * NON-PROJECTABLE on read ([[projectionSpec]]) — those partitions
    * are always admitted, never era-inferred into a transform that
    * did not derive them. */
  def evolve(spark: SparkSession, path: String, newSpec: Spec): Unit = {
    val all = specs(spark, path) // loud on an undeclared lake
    val cur = all.last._2
    require(newSpec.partCol == cur.partCol,
      s"spec evolution cannot rename the internal partition column: " +
        s"${cur.partCol} -> ${newSpec.partCol}")
    require(newSpec.srcCol != cur.srcCol ||
        newSpec.transform.tag != cur.transform.tag,
      s"already partitioned by ${cur.transform.tag}(${cur.srcCol})")
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val from = VersionedLake.latestVersion(spark, path) + 1
      require(all.last._1 < from,
        s"a spec already governs version $from at $path — commit first")
      val p = new Path(s"${path.stripSuffix("/")}/_log/_partspec.$from")
      // create-exclusive: a CONCURRENT EVOLVE at the same version is a
      // genuine conflict and fails loudly here (two writers cannot
      // both change the table's layout)
      require(!f.exists(p),
        s"spec evolution $from already recorded at $path")
      val out = f.create(p, false)
      try out.write(
        s"${newSpec.transform.tag}\t${newSpec.srcCol}\t${newSpec.partCol}\n"
          .getBytes("UTF-8"))
      finally out.close()
      // the OCC re-check: no commit may have claimed `from` while the
      // spec file landed — if one did, its files were derived under
      // the old spec and the boundary would mis-govern them; un-record
      // and retry past the winner
      if (VersionedLake.latestVersion(spark, path) < from) return
      f.delete(p, false)
    }
    throw new java.util.ConcurrentModificationException(
      s"spec evolution retry budget exhausted at $path")
  }

  /** Derive the internal partition column through the ACTIVE spec,
    * returning the spec's from-version too: the commit records it on
    * every entry (`P<id>`), so attribution is BY RECORD — a spec
    * evolution landing between this derivation and the commit's
    * version claim can never flip these files into the wrong
    * projection (the r13-advice race, closed at the root). */
  private def derive(spark: SparkSession, path: String,
                     df: DataFrame): (DataFrame, String, Int) = {
    val (from, sp) = specs(spark, path).last
    require(df.columns.contains(sp.srcCol),
      s"hidden-partitioned write needs source column ${sp.srcCol}")
    (df.withColumn(sp.partCol, sp.transform.expr(col(sp.srcCol))),
      sp.partCol, from)
  }

  /** [[VersionedLake.commitOverwrite]] with the partition value
    * derived through the recorded transform — the caller never
    * constructs it. */
  def commitOverwrite(df: DataFrame, path: String,
                      statsCol: Option[String] = None,
                      commitTs: Option[Long] = None): Int = {
    val (d, p, id) = derive(df.sparkSession, path, df)
    VersionedLake.commitOverwrite(d, p, path, statsCol, commitTs,
      specId = Some(id))
  }

  /** [[VersionedLake.commitAppend]], transform-derived. */
  def commitAppend(df: DataFrame, path: String,
                   statsCol: Option[String] = None,
                   commitTs: Option[Long] = None): Int = {
    val (d, p, id) = derive(df.sparkSession, path, df)
    VersionedLake.commitAppend(d, p, path, statsCol, commitTs,
      specId = Some(id))
  }

  /** [[VersionedLake.commitUpsert]], transform-derived. */
  def commitUpsert(df: DataFrame, path: String,
                   statsCol: Option[String] = None,
                   commitTs: Option[Long] = None): Int = {
    val (d, p, id) = derive(df.sparkSession, path, df)
    VersionedLake.commitUpsert(d, p, path, statsCol, commitTs,
      specId = Some(id))
  }

  /** [[VersionedLake.commitBatchAppend]] (exactly-once streaming
    * ingest), transform-derived — the governed sink: partition layout
    * comes from the table's recorded spec, constraints validate the
    * micro-batch, and the foreachBatch writer supplies only the txn. */
  def commitBatchAppend(df: DataFrame, path: String, txn: Long,
                        commitTs: Option[Long] = None): Int = {
    val (d, p, id) = derive(df.sparkSession, path, df)
    VersionedLake.commitBatchAppend(d, p, path, txn, commitTs,
      specId = Some(id))
  }

  /** [[VersionedLake.commitOptimize]] on a hidden-partitioned lake:
    * passes the spec timeline so legacy UNTAGGED entries resolve by
    * era and each rewritten partition's fresh files inherit its spec
    * attribution — compaction re-lays bytes, it never re-derives a
    * partition value, so it must never re-attribute one either. */
  def commitOptimize(spark: SparkSession, path: String,
                     statsCol: Option[String] = None,
                     zorderBy: Seq[String] = Nil,
                     targetFilesPerPart: Int = 1,
                     fromVersion: Option[Int] = None): Int = {
    val all = specs(spark, path)
    VersionedLake.commitOptimize(spark, path, all.last._2.partCol,
      statsCol, zorderBy, targetFilesPerPart, fromVersion,
      specEras = all.map(_._1))
  }

  /** Per-partition spec attribution of version `v`'s live data — the
    * `specIdFor` a keyed rewrite ([[VersionedLake.commitMerge]] /
    * [[VersionedLake.commitMergeDv]]) over a hidden-partitioned lake
    * should pass, so a restated partition KEEPS the attribution its
    * value was derived under while a brand-new partition takes the
    * ACTIVE spec. (The keyed verbs stay un-wrapped by design: MERGE's
    * partition-stability invariant means the CALLER owns each delta
    * row's partition value — deriving old keys through the active
    * transform would strand their stored rows; this helper makes the
    * attribution side mechanical.) Partition-count-sized. */
  def specAttribution(spark: SparkSession, path: String,
                      v: Int): String => Option[Int] = {
    val all = specs(spark, path)
    val active = all.last._1
    val byPart = VersionedLake.manifestFiles(spark, path, v)
      .filter(_.kind == "data")
      .groupBy(_.part).map { case (p, es) =>
        // attribution here is BY RECORD like the rewrite verbs'
        // (commitOptimize): an unknown recorded id PROPAGATES verbatim
        // — it stays non-projectable on read rather than being
        // re-attributed to an era spec that did not derive it
        val ids = es.map(e => e.specId.getOrElse(eraSpecId(all, e.era)))
          .distinct
        require(ids.size == 1,
          s"partition '$p' at $path mixes spec eras ${ids.sorted
            .mkString(", ")} — a keyed rewrite cannot attribute it")
        p -> ids.head
      }
    p => Some(byPart.getOrElse(p, active))
  }

  /** Version `v`'s live data partitions grouped by the SPEC that
    * wrote them (per-entry `P` tag; era inference for legacy lines;
    * None for an UNKNOWN recorded id — non-projectable, every read
    * admits those partitions). A partition whose entries span two
    * specs (possible only at a truncate↔bucket VALUE collision)
    * appears in BOTH groups — each group admits/filters independently
    * and the sets union, so the collision can only widen the read,
    * never lose a row. */
  private def partsBySpec(spark: SparkSession, path: String, v: Int,
                          all: Seq[(Int, Spec)])
      : Seq[(Option[Spec], Seq[String])] =
    VersionedLake.manifestFiles(spark, path, v)
      .filter(_.kind == "data")
      .groupBy(e => projectionSpec(all, e.specId, e.era)).toSeq
      .map { case (sp, es) => (sp, es.map(_.part).distinct) }

  /** The live partitions a `<queried col> BETWEEN lo AND hi` predicate
    * can touch at version `v`: inclusive projection through each ERA's
    * transform, pruned sets unioned (Iceberg's mixed-spec read). An
    * era cannot project when its transform is non-monotonic (bucket —
    * hashing destroys order) OR derives a DIFFERENT source column
    * (cross-column evolution, r14) — ALL its partitions are admitted
    * (the conservative union; the row predicate stays exact). A read
    * that NO era can project still refuses loudly — it would prune
    * nothing; use [[readMatching]]. `srcCol` defaults to the ACTIVE
    * spec's source column. Planning metadata — what [[readBetween]]
    * prunes to. */
  def partsBetween(spark: SparkSession, path: String, v: Int,
                   lo: String, hi: String,
                   srcCol: Option[String] = None): Seq[String] = {
    val all = specs(spark, path)
    val queried = srcCol.getOrElse(all.last._2.srcCol)
    require(all.exists { case (_, sp) =>
        sp.srcCol == queried && sp.transform.monotonic },
      s"no recorded spec projects ranges on $queried — use readMatching")
    partsBySpec(spark, path, v, all).flatMap {
      case (Some(sp), parts)
          if sp.srcCol == queried && sp.transform.monotonic =>
        val (plo, phi) = (sp.transform.bound(lo), sp.transform.bound(hi))
        def inRange(p: String) = sp.transform match {
          case Truncate(_) =>
            p.toLong >= plo.toLong && p.toLong <= phi.toLong
          case _ => p >= plo && p <= phi
        }
        parts.filter(inRange)
      // cross-column era, bucket era, or an UNKNOWN recorded spec id
      // (non-projectable): admit all — the conservative union
      case (_, parts) => parts
    }.distinct.sorted
  }

  /** Range read: prune partitions through the transform, then apply
    * the ROW predicate (partitions bound coarsely; rows still
    * filter — a wrongly-pruned partition loses rows and fails any
    * count). `srcCol` defaults to the ACTIVE spec's source column
    * (pass it explicitly to range over an OLDER era's column after a
    * cross-column evolution). The internal partition column never
    * surfaces. */
  def readBetween(spark: SparkSession, path: String,
                  lo: String, hi: String,
                  version: Option[Int] = None,
                  srcCol: Option[String] = None): DataFrame = {
    val all = specs(spark, path)
    val queried = srcCol.getOrElse(all.last._2.srcCol)
    val v = version.getOrElse(VersionedLake.latestVersion(spark, path))
    val parts = partsBetween(spark, path, v, lo, hi, Some(queried))
    VersionedLake.readVersion(spark, path, v, parts)
      .filter(col(queried).between(lo, hi))
      .drop(all.last._2.partCol)
  }

  /** The live partitions the probe keys can land in: per ERA whose
    * spec derives the QUERIED column, the keys' partition values
    * compute through that era's ENGINE transform expression (one
    * keys-sized aggregate per spec — planning metadata, the
    * established lookup discipline), so bucket hashing can never
    * drift between write and probe; an era deriving a DIFFERENT
    * column admits all its partitions (cross-column evolution, r14);
    * the per-era sets union (mixed-spec point lookup). The queried
    * column is the keys frame's — it must carry exactly the columns
    * being probed; by default the ACTIVE spec's source column. */
  def partsMatching(spark: SparkSession, path: String, v: Int,
                    keys: DataFrame,
                    srcCol: Option[String] = None): Seq[String] = {
    val all = specs(spark, path)
    val queried = srcCol.getOrElse(all.last._2.srcCol)
    require(keys.columns.contains(queried),
      s"point-lookup keys must carry the queried column $queried")
    partsBySpec(spark, path, v, all).flatMap {
      case (Some(sp), parts) if sp.srcCol == queried =>
        val wanted = keys
          .select(sp.transform.expr(col(sp.srcCol)).as("__pp"))
          .distinct().collect().map(_.getString(0)).toSet // keys-sized
        parts.filter(wanted)
      // cross-column era or an UNKNOWN recorded spec id: admit all
      case (_, parts) => parts
    }.distinct.sorted
  }

  /** Point-lookup read under ANY transform (the only shape bucket
    * admits): prune to the keys' partitions, then semi-join the keys
    * exactly. `srcCol` defaults to the ACTIVE spec's source column. */
  def readMatching(spark: SparkSession, path: String, keys: DataFrame,
                   version: Option[Int] = None,
                   srcCol: Option[String] = None): DataFrame = {
    val all = specs(spark, path)
    val queried = srcCol.getOrElse(all.last._2.srcCol)
    val v = version.getOrElse(VersionedLake.latestVersion(spark, path))
    val parts = partsMatching(spark, path, v, keys, Some(queried))
    VersionedLake.readVersion(spark, path, v, parts)
      .join(broadcast(keys.select(col(queried)).distinct()),
        Seq(queried), "left_semi")
      .drop(all.last._2.partCol)
  }
}
