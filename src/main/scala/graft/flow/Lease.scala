package graft.flow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** A live worker holds this task's lease — the caller must not take
  * over; Luigi reports the same as "run by another worker". */
final case class LeaseHeldException(task: String, owner: String)
    extends RuntimeException(
      s"task $task is leased to live worker $owner — not taking over")

/** The heartbeat found the lease gone or foreign-owned: this worker's
  * lease was taken over (it must have looked stale to a contender —
  * e.g. after a long GC/IO stall past the TTL) or externally removed.
  * The attempt must abort rather than keep running unleased — the
  * same both-sides-stop discipline as ZombieTaskException. */
final case class LeaseLostException(task: String, owner: String,
                                    holder: Option[String])
    extends RuntimeException(
      s"task $task: worker $owner lost its lease to " +
        s"${holder.getOrElse("<deleted>")} — aborting the attempt")

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
  * Contention safety on a shared POSIX mount (hardened round 14 after
  * LeaseRaceSpec's barrier race caught a double-win): a FRESH acquire
  * is CREATE_NEW (exactly one creator wins); a STALE takeover renames
  * the dead lease to a contender-unique tombstone (exactly one rename
  * wins), VERIFIES the tombstone still holds the very state it judged
  * stale (a changed lease = a contender's fresh one → restore +
  * refuse), then publishes its own lease via link(2) — create-
  * exclusive, because POSIX rename always replaces and a third worker
  * may have won CREATE_NEW while the path was renamed away. Renewals
  * replace by atomic move so readers never see a torn lease, and are
  * CAS-guarded: a worker whose lease was legitimately taken over
  * (stalled past TTL) learns on its next heartbeat and aborts with
  * [[LeaseLostException]] instead of re-asserting. Staleness is
  * judged by the lease's own renewal stamp against
  * [[Task.leaseTtlMs]]. */
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
        takeover(t, p, owner, st, now)
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

  /** Stale-lease takeover: the rename is the lock — one contender
    * wins the ATOMIC_MOVE. `observed` is the stale state the caller
    * judged; package-private so LeaseRaceSpec can drive the
    * changed-under-us branch deterministically.
    *
    * TOCTOU guard (round 14): between the caller's staleness read and
    * the rename, ANOTHER contender may have completed its own
    * takeover and now holds a FRESH lease at p — the rename would
    * steal a live worker's lease and double-run the task. So after
    * winning the rename, verify the tombstone still holds exactly the
    * observed stale state; if it changed, restore it and refuse. */
  private[flow] def takeover(t: Task, p: Path, owner: String,
                             observed: State, now: Long): Unit = {
    val tomb = p.resolveSibling(
      p.getFileName.toString + ".takeover-" + sanitize(owner))
    try Files.move(p, tomb, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException =>
        throw LeaseHeldException(t.name,
          read(p).map(_.owner).getOrElse("<contended>"))
    }
    val got = read(tomb)
    if (!got.contains(observed)) {
      // we renamed a lease that changed since we judged it stale — a
      // contender's fresh lease. Put it back (if its owner's renew
      // already recreated p, the tombstone copy is redundant) and
      // refuse.
      try Files.move(tomb, p, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException => () }
      Files.deleteIfExists(tomb)
      throw LeaseHeldException(t.name,
        got.map(_.owner).getOrElse("<contended>"))
    }
    Files.deleteIfExists(tomb)
    // Publish create-EXCLUSIVELY: while p was renamed away, a third
    // worker can legitimately pass acquire's None branch and win
    // CREATE_NEW — a replacing publish here would silently clobber
    // that fresh lease and double-run the task (LeaseRaceSpec's
    // barrier race caught exactly this: wins=2, held=0). POSIX
    // rename(2) always replaces, so the exclusive primitive is
    // link(2): write a private tmp, hard-link it to p (EEXIST if
    // anyone re-created p first), unlink the tmp. Every acquire path
    // now ends in a create-exclusive syscall — at most one contender
    // can ever win a lease path.
    val tmp = p.resolveSibling(
      p.getFileName.toString + ".tmp-" + sanitize(owner))
    Files.write(tmp, bytes(State(owner, now)), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    try Files.createLink(p, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.FileSystemException =>
        Files.deleteIfExists(tmp)
        throw LeaseHeldException(t.name,
          read(p).map(_.owner).getOrElse("<contended>"))
    }
    Files.deleteIfExists(tmp)
  }

  /** Heartbeat: refresh the renewal stamp (atomic replace) — CAS
    * semantics (round 14): only while the lease is still OURS. An
    * unconditional replace would re-assert a lease that a contender
    * legitimately took over (after this worker stalled past the TTL),
    * silently clobbering the live contender's lease and double-running
    * the task; now the stalled worker learns it lost and aborts via
    * [[LeaseLostException]]. The read→replace window is µs (vs the
    * whole task duration before), and the replace target can only be
    * our own lease or a thief's — the thief's own heartbeat detects
    * the clobber the same way one TTL/3 later. */
  def renew(t: Task, owner: String): Unit = {
    val p = leasePath(t)
    read(p) match {
      case Some(st) if st.owner == owner =>
        replace(p, State(owner, System.currentTimeMillis()))
      case other =>
        throw LeaseLostException(t.name, owner, other.map(_.owner))
    }
  }

  /** Delete the lease iff still owned (a takeover may have replaced it). */
  def release(t: Task, owner: String): Unit = {
    val p = leasePath(t)
    if (read(p).exists(_.owner == owner)) Files.deleteIfExists(p)
  }
}
