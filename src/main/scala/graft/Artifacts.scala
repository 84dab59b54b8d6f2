package graft

/** Shared location + cache-key policy for persisted working-set artifacts
  * (shingle/fingerprint/pair indexes, bucketed join tables, roundtrip
  * fixtures, streaming upsert targets).
  *
  * `root` defaults to the JVM temp dir — right for local[*] and CI — and
  * is overridden with SPARK_GRAFT_ARTIFACT_DIR so that on a real cluster
  * the artifacts land on storage every executor and a restarted driver
  * can see (HDFS/NFS mount, fuse-mounted object store). Without that, a
  * driver restart orphans the working sets and every index rebuilds from
  * scratch — correctness survives, the 100 TB economics don't.
  */
object Artifacts {

  /** Artifact root directory; see object doc for the env override. */
  def root: String = sys.env.getOrElse(
    "SPARK_GRAFT_ARTIFACT_DIR", System.getProperty("java.io.tmpdir"))

  /** Cache key tying an artifact to the CONTENT of its source file, not
    * just its path: code version (bump when the artifact definition
    * changes) + source-dir path hash + the source file's (length, mtime).
    * A fixture regenerated at the same path changes the key, so a stale
    * artifact can never be silently reused; two different source dirs
    * cannot cross-wire through a 32-bit path-hash collision alone (they
    * would also need identical file length and mtime). */
  def key(version: String, sfDir: String, sourceFile: String): String = {
    val f = new java.io.File(s"$sfDir/$sourceFile")
    // a missing source would make length/mtime both 0 — a CONSTANT key
    // that silently defeats the staleness guard (and would pin the first
    // artifact ever built for this dir forever). Fail loudly instead.
    require(f.exists(), s"artifact key source missing: ${f.getPath}")
    s"$version-" +
      java.lang.Integer.toHexString(sfDir.hashCode) + "-" +
      java.lang.Long.toHexString(f.length() ^ (f.lastModified() * 31L))
  }

  /** Best-effort GC of STALE artifact generations: content-keyed dirs
    * accumulate one directory per (version, source length/mtime) forever —
    * harmless in a sandbox tmpdir, a slow leak on the shared storage
    * `root` points at on a cluster. Called by builders right after the
    * live generation is ensured: deletes every sibling of `artifactPath`
    * that shares its (family, version, sfDir-hash) prefix — everything in
    * the key except the trailing content hash — but is not the live key,
    * so rebuilding a fixture leaves exactly one generation per family.
    * Best-effort on purpose: a delete failure is ignored (another run may
    * sweep it later), and a CONCURRENT run is only exposed if it is still
    * reading a generation whose source fixture was since regenerated —
    * the same staleness the content key exists to retire. */
  def sweepStale(artifactPath: String): Unit = try {
    val live = new java.io.File(artifactPath)
    val cut = live.getName.lastIndexOf('-')
    // getParentFile is null for a single-segment relative path — inside
    // the best-effort contract that means "nothing to sweep", not NPE
    val parent = Option(live.getParentFile)
    if (cut > 0 && parent.isDefined) {
      val prefix = live.getName.substring(0, cut + 1)
      val dayMs = 24L * 3600 * 1000
      val now = System.currentTimeMillis()
      parent.flatMap(p => Option(p.listFiles())).getOrElse(Array.empty)
        .filter { s =>
          s.getName.startsWith(prefix) && s.getName != live.getName &&
          // NEVER touch FRESH atomicWrite temps ("<key>.tmp-<uuid>",
          // DirTarget): they match the prefix, and a CONCURRENT builder of
          // the same key may be mid-write in one — deleting it would fail
          // its commit rename. A temp older than a day can only be a
          // crash-abandoned write (atomicWrite's finally removes its own
          // temp on every non-crash path), so age-sweep closes that leak.
          (!s.getName.contains(".tmp-") || now - s.lastModified() > dayMs)
        }
        .foreach(deleteRecursively)
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
