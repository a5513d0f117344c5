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

  /** Run-unique scratch for a delete+rebuild query (the q325/q335
    * rule: two drivers sharing a scratch filesystem must never clobber
    * each other's landing/state dirs): a fresh `graft_<tag>_<run>_…`
    * dir per call, the resulting DataFrame cut EAGERLY (the finally
    * below drops the files a lazy plan would still need), the dirs
    * deleted afterward whatever happens. */
  def withRunDir(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      tag: String)(f: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    withRunDirs(spark, dataDir, tag)(ps => f(ps.head))

  def withRunDirs(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      tags: String*)(f: Seq[String] => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val run = java.util.UUID.randomUUID.toString.take(8)
    val paths = tags.map(t => dir(s"${t}_$run", dataDir))
    try f(paths).localCheckpoint(true)
    finally {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  private def fp(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** CONTENT-KEYED artifact location for build-if-absent artifacts whose
    * value depends on shaping config and on the input bytes: the tag
    * gains a fingerprint of the caller-named config values and one of
    * the input files' (name, length, mtime) listing. A knob change or
    * an in-place corpus regeneration changes the PATH, so a stale
    * artifact becomes unreachable instead of silently trusted (the
    * round-11 advice on q242). The listing is filesystem METADATA — no
    * data is read; at 100 TB this is one namenode call per input.
    *
    * GRANULARITY (the round-12 advice, closed): the fingerprint is
    * (per-file name, length, mtime) PLUS a bounded CONTENT PROBE — the
    * first and last $ProbeBytes bytes of up to $ProbeFiles data files
    * (name-sorted). A same-length in-place rewrite inside one mtime
    * tick now reroutes unless those bytes agree too, and a parquet
    * tail carries the footer (row-group offsets, column stats), which
    * a rewrite of CHANGED data essentially never byte-matches; when
    * head+tail DO agree the content is the deterministic writer's
    * identical output, for which the cached artifact is valid anyway.
    * Cost stays metadata-shaped: one namenode listing + ≤ $ProbeFiles
    * short positioned reads per artifact probe, independent of input
    * size — full checksums remain deliberately out of scope (an
    * input-sized scan per probe). */
  private val ProbeFiles = 16
  private val ProbeBytes = 16

  def keyedDir(tag: String, dataDir: String,
      spark: org.apache.spark.sql.SparkSession,
      inputs: Seq[String], cfgKey: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metas = inputs.sorted.flatMap { in =>
      val p = new org.apache.hadoop.fs.Path(dataDir, in)
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) Seq(s"$in:absent")
      else {
        val sts = fs.listStatus(p).sortBy(_.getPath.getName)
        val probes = sts.iterator.filter(st => st.isFile && st.getLen > 0)
          .take(ProbeFiles).map { st =>
            // a file deleted or mid-rewrite between listStatus and open
            // (concurrent artifact writers share this scratch) must
            // degrade to a marker, not fail the whole path computation —
            // keyedDir stays total under concurrent writes
            try {
              val n = math.min(ProbeBytes.toLong, st.getLen).toInt
              val head = new Array[Byte](n)
              val tail = new Array[Byte](n)
              val is = fs.open(st.getPath)
              try {
                is.readFully(0L, head)
                is.readFully(st.getLen - n, tail)
              } finally is.close()
              st.getPath.getName + "#" + (head ++ tail).map("%02x".format(_)).mkString
            } catch {
              case _: java.io.IOException =>
                st.getPath.getName + "#unreadable"
            }
          }.mkString("|")
        sts.map(st =>
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}") :+ probes
      }
    }
    dir(s"${tag}_c${fp(cfgKey)}_d${fp(metas.mkString(","))}", dataDir)
  }
}
