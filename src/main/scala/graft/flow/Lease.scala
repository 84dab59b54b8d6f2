package graft.flow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** A live worker holds this task's lease — the caller must not take
  * over; Luigi reports the same as "run by another worker". */
final case class LeaseHeldException(task: String, owner: String)
    extends RuntimeException(
      s"task $task is leased to live worker $owner — not taking over")

/** Worker heartbeat/lease (SURVEY §9.5 — Luigi's worker `ping`): a
  * lease file NEXT TO the task's target, renewed on a timer while the
  * attempt loop runs, lets a second runner process distinguish
  * "another worker is on it" (fresh lease → refuse) from "a worker
  * died mid-task" (stale lease → take over and finish the work). The
  * file lives beside the target so it travels on whatever shared
  * storage the targets already use — no scheduler daemon, no extra
  * state service, the same single-file discipline as the atomic
  * Target commit.
  *
  * Contention safety on a shared POSIX mount: a FRESH acquire is
  * CREATE_NEW (exactly one creator wins); a STALE takeover renames the
  * dead lease to a contender-unique tombstone first (exactly one
  * rename wins) before writing its own; renewals replace by atomic
  * move so readers never see a torn lease. Staleness is judged by the
  * lease's own renewal stamp against [[Task.leaseTtlMs]]. */
object Lease {

  /** This process's worker identity (Luigi's worker id). */
  lazy val workerId: String =
    s"${java.net.InetAddress.getLocalHost.getHostName}:" +
      s"${ProcessHandle.current().pid()}:" +
      java.util.UUID.randomUUID().toString.take(8)

  final case class State(owner: String, renewedMs: Long)

  def leasePath(t: Task): Path = Paths.get(t.output.uri + ".lease")

  def read(p: Path): Option[State] =
    try {
      if (!Files.exists(p)) None
      else {
        val lines = new String(Files.readAllBytes(p),
          StandardCharsets.UTF_8).trim.split('\n')
        Some(State(lines(0), lines(1).toLong))
      }
    } catch { case _: Exception => None } // unreadable = treat as absent

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9_.-]", "_")

  private def bytes(st: State): Array[Byte] =
    s"${st.owner}\n${st.renewedMs}\n".getBytes(StandardCharsets.UTF_8)

  private def replace(p: Path, st: State): Unit = {
    val tmp = p.resolveSibling(
      p.getFileName.toString + ".tmp-" + sanitize(st.owner))
    Files.write(tmp, bytes(st), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Acquire or take over; throws [[LeaseHeldException]] when a live
    * worker owns the task. */
  def acquire(t: Task, owner: String,
              now: Long = System.currentTimeMillis()): Unit = {
    val p = leasePath(t)
    Option(p.getParent).foreach(Files.createDirectories(_))
    read(p) match {
      case Some(st) if st.owner != owner &&
          now - st.renewedMs < t.leaseTtlMs =>
        throw LeaseHeldException(t.name, st.owner)
      case Some(st) if st.owner != owner =>
        // stale: the takeover rename is the lock — one contender wins
        val tomb = p.resolveSibling(
          p.getFileName.toString + ".takeover-" + sanitize(owner))
        try Files.move(p, tomb, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException =>
            throw LeaseHeldException(t.name,
              read(p).map(_.owner).getOrElse("<contended>"))
        }
        Files.deleteIfExists(tomb)
        replace(p, State(owner, now))
      case Some(_) => // re-acquire by the same owner (retry loop)
        replace(p, State(owner, now))
      case None =>
        try Files.write(p, bytes(State(owner, now)),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw LeaseHeldException(t.name,
              read(p).map(_.owner).getOrElse("<contended>"))
        }
    }
  }

  /** Heartbeat: refresh the renewal stamp (atomic replace). */
  def renew(t: Task, owner: String): Unit =
    replace(leasePath(t), State(owner, System.currentTimeMillis()))

  /** Delete the lease iff still owned (a takeover may have replaced it). */
  def release(t: Task, owner: String): Unit = {
    val p = leasePath(t)
    if (read(p).exists(_.owner == owner)) Files.deleteIfExists(p)
  }
}
