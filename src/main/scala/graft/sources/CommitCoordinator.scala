package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE atomic commit above [[VersionedLake]]s — the one
  * honest edge a production consolidation of single-table logs
  * eventually hits (COVERAGE.md: "atomic multi-table commit would
  * need a coordinator log above both lakes"; Delta answers it with a
  * catalog-level transaction coordinator, Iceberg with a catalog
  * `commitTransaction` — this is that shape reduced to its core).
  *
  * The coordinator is ITS OWN tiny log (`_coordlog/<v>.coord`): each
  * record pins a set of lakes to exact versions, claimed with the
  * SAME atomic-no-overwrite primitive the lake manifests use
  * ([[VersionedLake.claimFile]] — hard link on POSIX, no-overwrite
  * rename on HDFS-semantics stores). [[commitAll]] runs each lake's
  * commit (each individually OCC-safe in its own log), then publishes
  * ONE coordinator record naming the resulting versions. Every lake
  * version is immutable once claimed, so the record is a consistent
  * SNAPSHOT PIN — exactly Iceberg's manifest-list trick one level up:
  * the atomicity carrier is a single file claim, the payload is
  * pointers.
  *
  * Consistency contract:
  *  - COORDINATED readers ([[readCoordinated]], resolving versions
  *    through the latest record) see the lake set move ATOMICALLY:
  *    a crash between two lake commits leaves the coordinator
  *    un-advanced, so the torn instant is structurally invisible to
  *    them (LakeSpec's crash-visibility drive; l36 is the oracle
  *    row). Recovery needs no undo — lake commits are append-only
  *    versions; the next successful [[commitAll]] simply records the
  *    completed pair (a thunk may return an ALREADY-landed version,
  *    the recovery shape).
  *  - DIRECT readers of one lake see that lake's own log, torn
  *    instants included — the documented single-table posture,
  *    unchanged.
  *  - Concurrent coordinators: the claim loop re-reads the head on a
  *    lost race. A winner that advanced a DISJOINT lake set merges
  *    (its pins carry forward); a winner that advanced one of OUR
  *    lakes aborts this commit loudly (ConcurrentModificationException)
  *    — recording our older pin would REGRESS coordinated readers,
  *    and silently adopting the winner's newer pin would publish a
  *    cross-table state nobody computed.
  *  - Vacuum discipline the caller owns: a lake's `vacuum(retain)`
  *    must keep every version a retained coordinator record pins
  *    (the same contract as time travel).
  */
object CommitCoordinator {

  private def logDir(coord: String) =
    new Path(s"${coord.stripSuffix("/")}/_coordlog")

  private def recPath(coord: String, v: Int) =
    new Path(logDir(coord), s"${"%06d".format(v)}.coord")

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Canonical pin key for a lake path: qualified through the path's
    * own FileSystem (r14 advice), so `file:/x`, `/x`, trailing- and
    * redundant-slash spellings of the SAME physical lake collapse to
    * ONE key — commitAll's duplicate-pin check, the overtaken check,
    * and readCoordinated's lookup compare physical tables, not
    * strings. Idempotent on already-qualified strings, so records
    * written before canonicalization re-resolve on read.
    *
    * DEFENSIVE on resolution failure (r15 self-review): [[pins]] maps
    * this over every record line, so a pinned lake whose scheme this
    * JVM cannot resolve (missing s3a jars, say) must not make the
    * whole record unreadable for the lakes that ARE reachable — an
    * unresolvable path falls back to Path-level string normalization
    * (slash collapsing, no FS touch). Both sides of a lookup go
    * through the same function, so reachable keys still collapse
    * exactly; only the unreachable lake degrades to string identity. */
  private def canon(spark: SparkSession, p: String): String =
    try fs(spark, p).makeQualified(new Path(p)).toString
    catch { case _: Exception => new Path(p).toString }

  /** Diagnostic witness: full `_coordlog` listings taken by [[latest]]
    * because the head hint was absent or unusable (see
    * [[VersionedLake]]'s head-pointer note — same design, same safety
    * argument). Steady state on a head-maintained log is zero. */
  private[graft] val headMisses =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def readHeadHint(f: org.apache.hadoop.fs.FileSystem,
                           coord: String): Option[Int] =
    HeadHint.read(f, logDir(coord))

  private def writeHeadHint(f: org.apache.hadoop.fs.FileSystem,
                            coord: String, v: Int): Unit =
    HeadHint.write(f, logDir(coord), v)

  /** Newest coordinator version (0 = nothing coordinated yet) —
    * O(1 + lag) via the `_coordlog/_head` hint (trusted-but-verified:
    * forward existence probe from the hint; records are claimed
    * contiguously so the probe never skips one), O(records) listing
    * fallback on a missing/torn/ahead hint. A STALE hint — a crash
    * between record claim and head write, or a lost overwrite race —
    * only lengthens the probe; it can never hide a committed record. */
  def latest(spark: SparkSession, coord: String): Int = {
    val f = fs(spark, coord)
    readHeadHint(f, coord) match {
      case Some(h) if f.exists(recPath(coord, h)) =>
        var v = h
        while (f.exists(recPath(coord, v + 1))) v += 1
        v
      case _ =>
        headMisses.incrementAndGet()
        if (!f.exists(logDir(coord))) 0
        else f.listStatus(logDir(coord)).iterator
          .map(_.getPath.getName)
          .filter(_.endsWith(".coord"))
          .map(_.stripSuffix(".coord").toInt)
          .foldLeft(0)(math.max)
    }
  }

  /** The lake→version pins record `cv` publishes (loud on absence). */
  def pins(spark: SparkSession, coord: String, cv: Int): Map[String, Int] = {
    val f = fs(spark, coord)
    val p = recPath(coord, cv)
    require(f.exists(p), s"no coordinator record $cv at $coord")
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.drop(1).filter(_.nonEmpty).map { l =>
      val t = l.split('\t')
      require(t.length == 3 && t(0) == "lake",
        s"malformed coordinator line at $coord v$cv: $l")
      canon(spark, t(1)) -> t(2).toInt
    }.toMap
  }

  /** Run each lake commit, then publish ONE coordinator record
    * pinning the results — the multi-table atomic commit (atomic for
    * coordinated readers; see the object scaladoc for the contract).
    * Thunks run sequentially and may also RE-PIN an already-landed
    * version (`() => (path, VersionedLake.latestVersion(...))`) —
    * the crash-recovery shape. Returns the new coordinator version. */
  def commitAll(spark: SparkSession, coord: String,
                commits: Seq[() => (String, Int)]): Int = {
    require(commits.nonEmpty, "commitAll needs at least one lake commit")
    val mine = commits.map { c =>
      val (p, v) = c(); canon(spark, p) -> v
    }.toMap
    require(mine.size == commits.size,
      "commitAll pins each lake once — duplicate lake paths")
    val f = fs(spark, coord)
    f.mkdirs(logDir(coord))
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val base = latest(spark, coord)
      val head = if (base == 0) Map.empty[String, Int]
                 else pins(spark, coord, base)
      // a racing coordinator that already published a NEWER version
      // of one of our lakes wins: recording ours would regress
      // coordinated readers (and adopting theirs would publish a
      // cross-table state nobody computed) — abort loudly
      val overtaken = mine.collect {
        case (p, v) if head.getOrElse(p, 0) > v => p
      }
      if (overtaken.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"coordinated commit lost to a newer record on " +
            s"${overtaken.toSeq.sorted.mkString(", ")} at $coord")
      val merged = head ++ mine // disjoint winners carry forward
      val k = base + 1
      val body = (s"cversion=$k" +:
        merged.toSeq.sortBy(_._1).map { case (p, v) => s"lake\t$p\t$v" })
        .mkString("\n")
      val tmp = new Path(logDir(coord),
        s"${"%06d".format(k)}.coord.tmp-${VersionedLake.uniq()}")
      val out = f.create(tmp, true)
      try out.write((body + "\n").getBytes("UTF-8")) finally out.close()
      if (VersionedLake.claimFile(f, tmp, recPath(coord, k))) {
        writeHeadHint(f, coord, k) // after the claim: hint never leads
        return k
      }
      // lost the version claim: re-read the head and re-validate
    }
    throw new java.util.ConcurrentModificationException(
      s"coordinator retry budget exhausted at $coord")
  }

  /** Read `lakePath` AT THE VERSION the coordinator pins (record `cv`,
    * default the latest) — the coordinated-reader surface: every lake
    * read resolved through one record is one consistent multi-table
    * snapshot. Loud if the lake is not coordinated here. */
  def readCoordinated(spark: SparkSession, coord: String,
                      lakePath: String,
                      cv: Option[Int] = None): DataFrame = {
    val v = cv.getOrElse(latest(spark, coord))
    require(v > 0, s"nothing coordinated yet at $coord")
    val pin = pins(spark, coord, v).getOrElse(canon(spark, lakePath),
      throw new IllegalArgumentException(
        s"$lakePath is not coordinated by record $v at $coord"))
    VersionedLake.readVersion(spark, lakePath, pin)
  }

  /** Every RETAINED coordinator record, ascending ([[vacuum]] may
    * have dropped a prefix — the listing tolerates gaps). */
  def records(spark: SparkSession, coord: String): Seq[Int] = {
    val f = fs(spark, coord)
    if (!f.exists(logDir(coord))) Seq.empty
    else f.listStatus(logDir(coord)).iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".coord"))
      .map(_.stripSuffix(".coord").toInt).toSeq.sorted
  }

  /** Every version of `lakePath` any RETAINED record in this
    * coordinator log pins — the pin-aware-vacuum input
    * ([[vacuumPinned]]). Record-count-sized metadata IO (pointer-sized
    * records; a maintenance verb, not a read-path cost). Records
    * dropped by [[vacuum]] no longer contribute — coordinator
    * retention RELEASES their pins, so the two vacuums compose into
    * the full lifecycle. */
  def pinnedVersions(spark: SparkSession, coord: String,
                     lakePath: String): Set[Int] = {
    val k = canon(spark, lakePath)
    records(spark, coord)
      .flatMap(cv => pins(spark, coord, cv).get(k)).toSet
  }

  /** Coordinator-log RETENTION: drop every record but the newest
    * `retain` — the lake-vacuum rule one level up. A coordinated
    * reader time-travels only within the retained window (a dropped
    * record's [[readCoordinated]] fails loudly on the missing file,
    * exactly the lake's vacuumed-version posture), and a dropped
    * record RELEASES its pins: the next [[vacuumPinned]] floors only
    * at retained records' pins. The HEAD record always survives
    * (retain >= 1), so [[latest]]'s hint never dangles. Order the
    * maintenance coordinator-first: vacuum the coordinator, THEN
    * [[vacuumPinned]] each lake — released pins reclaim immediately;
    * the reverse order just waits one more cycle. Returns records
    * dropped. */
  def vacuum(spark: SparkSession, coord: String, retain: Int): Int = {
    require(retain >= 1, "coordinator vacuum must retain the head")
    val f = fs(spark, coord)
    val dropped = records(spark, coord).dropRight(retain)
    dropped.foreach(cv => f.delete(recPath(coord, cv), false))
    dropped.size
  }

  /** PIN-AWARE vacuum (r14 verdict "What's missing #2"): vacuum
    * `lakePath` with every version a coordinator record pins EXEMPT
    * from dropping, closing the one way a correct caller sequence
    * could still break a coordinated reader — a naive
    * `vacuum(retain)` whose window undershoots the oldest retained
    * pin drops a manifest some record still resolves through, and the
    * next [[readCoordinated]] time-travel fails on the missing
    * version. Pinned manifests (and, transitively, the data files
    * they reference) survive REGARDLESS of `retain`; unpinned
    * versions below the window drop exactly as before, so the
    * retention economics stay retain-sized plus the pin set. */
  def vacuumPinned(spark: SparkSession, coord: String, lakePath: String,
                   retain: Int, graceMs: Long = 0L): (Int, Int) =
    VersionedLake.vacuum(spark, lakePath, retain, graceMs,
      keepVersions = pinnedVersions(spark, coord, lakePath))
}
