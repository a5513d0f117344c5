package graft.sources

/** Scratch locations for the round-trip verify queries (q65/q72/q79).
  *
  * The write/read APIs themselves take any path; only the round-trip
  * QUERIES need a place to put their intermediate files. That place
  * must be a SHARED filesystem on a real cluster — a driver-local tmp
  * dir is not visible to executors on other nodes — so it is
  * configurable (GraftConfig.scratchDir, settable at runtime via
  * -Dgraft.scratchDir or GRAFT_SCRATCH_DIR) and defaults to
  * java.io.tmpdir for local mode. The subdirectory embeds the FULL
  * sanitized dataset path, not a hash of it: two datasets verified
  * concurrently must never collide. */
private[graft] object Scratch {
  def dir(tag: String, dataDir: String): String = {
    val sane = dataDir.replaceAll("[^A-Za-z0-9._-]", "_")
    new org.apache.hadoop.fs.Path(
      graft.GraftConfig.default.scratchDir, s"graft_${tag}_$sane").toString
  }
}
