package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Optimistic-concurrency version chain — the table-format commit
  * primitive the CoW snapshot family (q300/q304) and the serving-index
  * lifecycle (q309) build on, and the conflict-detection surface q316
  * exercises end to end.
  *
  * Layout under a root directory:
  * {{{
  *   root/v00001/        immutable data (parquet)
  *   root/v00001.commit  zero-byte commit marker, created ATOMICALLY
  * }}}
  *
  * The MARKER is the atomic step: `FileSystem.createNewFile` is an
  * exclusive create (HDFS namenode-atomic; local fs O_EXCL), so of two
  * writers racing the same next version exactly ONE wins — a
  * compare-and-swap on the chain head. Each writer stages its data in
  * its OWN attempt directory (two losers must never interleave bytes
  * under one path); only the CAS winner renames its attempt to the
  * version path. Readers resolve `latest` as the highest committed
  * version, so a lost-race attempt is invisible and old versions stay
  * readable (time travel) until a q304-style vacuum retires them.
  *
  * Protocol (the Delta/Iceberg optimistic loop on plain parquet):
  *  1. `n = latest(fs, root)` — the base the writer reads + merges on
  *  2. write the merged data to a private attempt dir
  *  3. `commit(fs, root, n+1, attempt)` — true: marker won and the
  *     attempt was renamed into place (the atomic swap); false: ANOTHER
  *     writer committed n+1 first → a CONFLICT: the loser's merge was
  *     computed against a stale base and MUST be discarded — delete the
  *     attempt, re-read latest, re-apply the change on the new base,
  *     retry at n+2 (lost-update prevention, which q316 proves).
  *
  * Scale: markers and listings are |versions|-sized namenode metadata;
  * data versions are immutable parquet. Production formats fold the
  * manifest into the marker write itself; the two-step
  * marker-then-rename here keeps the same single-winner guarantee with
  * the reader contract "a returned writer's data dir is in place". */
private[graft] object VersionChain {
  def dataPath(root: String, v: Int): String = f"$root/v$v%05d"

  private def marker(root: String, v: Int): Path = new Path(f"$root/v$v%05d.commit")

  /** Highest committed version, or None for an empty chain. */
  def latest(fs: FileSystem, root: String): Option[Int] = {
    val r = new Path(root)
    if (!fs.exists(r)) None
    else {
      val vs = fs.listStatus(r).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".commit"))
        .map(n => n.stripPrefix("v").stripSuffix(".commit").toInt)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Atomic compare-and-swap on the chain head: wins iff no other
    * writer has committed `v` yet; the winner's staged attempt is
    * renamed to the version path. On false the caller owns cleanup of
    * its attempt (and must rebase before retrying). */
  def commit(fs: FileSystem, root: String, v: Int, attemptDir: String): Boolean = {
    fs.mkdirs(new Path(root))
    val won =
      try fs.createNewFile(marker(root, v))
      catch { case _: java.io.IOException => false }
    if (won) {
      require(fs.rename(new Path(attemptDir), new Path(dataPath(root, v))),
        s"winner's publish rename failed for $root v$v")
    }
    won
  }
}
