package graft.flow

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Materialized-artifact targets (Luigi `Target` semantics, SURVEY.md §2.1
  * O3/O4): existence == task completeness; writes are atomic (write to a
  * temp sibling, then rename into place) so a crash mid-write never leaves
  * a half-target that would be mistaken for complete — the contract of
  * Luigi's `output().open("w")` at reference 00_training_pipeline.py:34.
  *
  * At 100 TB the same discipline holds on an object store / HDFS: write to
  * `<path>.tmp-<uuid>` and commit via rename (or a _SUCCESS marker where
  * rename isn't atomic).
  */
trait Target {
  def exists: Boolean
  def uri: String
}

/** A directory target committed by atomic rename + _SUCCESS marker. */
final case class DirTarget(path: String) extends Target {
  private def p: Path = Paths.get(path)
  def exists: Boolean =
    Files.isDirectory(p) && Files.exists(p.resolve("_SUCCESS"))
  def uri: String = path

  /** Run `write` against a temp sibling dir, then atomically publish it.
    * The temp dir is handed to the writer; on success it is renamed to
    * `path` and a _SUCCESS marker is dropped. */
  def atomicWrite(write: String => Unit): Unit = {
    val tmp = Paths.get(path + ".tmp-" + java.util.UUID.randomUUID())
    try {
      write(tmp.toString)
      deleteRecursively(p) // clobber stale partial/old target
      Files.createDirectories(p.getParent)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      // Spark sinks already drop their own _SUCCESS; only add ours if absent
      if (!Files.exists(p.resolve("_SUCCESS")))
        Files.createFile(p.resolve("_SUCCESS"))
    } finally deleteRecursively(tmp)
  }

  private def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir))
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
}

/** A single-file target committed by atomic rename (pandas-style csv sinks,
  * reference D6). */
final case class FileTarget(path: String) extends Target {
  def exists: Boolean = Files.exists(Paths.get(path))
  def uri: String = path

  def atomicWrite(write: Path => Unit): Unit = {
    val tmp = Paths.get(path + ".tmp-" + java.util.UUID.randomUUID())
    try {
      Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
      write(tmp)
      Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }
}

/** Existence gate over an artifact produced OUTSIDE this pipeline — the
  * reference's `ModelExists` WrapperTask (01_classification_pipeline.py:129-133,
  * O5): no run(), just a cross-pipeline filesystem dependency. */
final case class ExternalTarget(path: String) extends Target {
  def exists: Boolean = Files.exists(Paths.get(path))
  def uri: String = path
}
