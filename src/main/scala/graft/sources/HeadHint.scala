package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The `_head` commit-log hint shared by BOTH logs ([[VersionedLake]]'s
  * `_log/_head`, [[CommitCoordinator]]'s `_coordlog/_head`) — one
  * implementation so a durability or probe fix lands in both at once
  * (they were verbatim twins until r15's self-review flagged the
  * drift risk). The hint is TRUSTED-BUT-VERIFIED: written best-effort
  * AFTER a successful claim (never ahead of reality it can't absorb),
  * overwrite-in-place (NOT a [[VersionedLake.claimFile]] claim — a
  * claim cannot re-publish a fixed name), and every reader existence-
  * probes forward from it; a torn/corrupt/ahead hint degrades to the
  * full-listing fallback, never to a wrong answer. The probe itself
  * stays with each log: the lake's must bridge vacuum-pin gap
  * tombstones, the coordinator's log is gap-free below its head
  * (its vacuum drops a contiguous prefix only).
  */
private[sources] object HeadHint {

  private def headPath(logDir: Path) = new Path(logDir, "_head")

  /** The hint, if present and parseable; None on any failure
    * (missing, torn, corrupt — all mean "no hint", never an error). */
  def read(f: FileSystem, logDir: Path): Option[Int] =
    try {
      val p = headPath(logDir)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        text.toIntOption.filter(_ > 0)
      }
    } catch { case _: Exception => None }

  /** Advance the hint to `v`, best-effort: losing a concurrent
    * overwrite or crashing before it only leaves a stale hint, which
    * the forward probe absorbs. */
  def write(f: FileSystem, logDir: Path, v: Int): Unit =
    try {
      val out = f.create(headPath(logDir), true)
      try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () }
}
