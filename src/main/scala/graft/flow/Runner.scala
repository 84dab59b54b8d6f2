package graft.flow

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Deterministic single-process scheduler (the `--local-scheduler` mode the
  * reference always uses, run_pipeline.sh:3-4): resolve the `requires` DAG
  * depth-first, skip complete tasks (O3), run the rest in topological
  * order. Returns the names of tasks actually executed, in order — the
  * tests assert idempotency with it.
  */
object Runner {

  final case class CycleException(at: String)
    extends RuntimeException(s"dependency cycle at task $at")

  /** A timed-out attempt whose worker thread survived job-group
    * cancellation + interrupt + [[Task.zombieGraceMs]]: retrying while
    * it runs would race two attempts on the target commit, so the
    * scheduler aborts the task instead of retrying. */
  final case class ZombieTaskException(msg: String)
    extends RuntimeException(msg)

  /** Scheduler lifecycle events (Luigi's event-handler surface —
    * Event.START/SUCCESS/FAILURE — plus the skip that Luigi reports as
    * "already done"). SUCCESS carries the processing time, Luigi's
    * PROCESSING_TIME event folded in. Handlers run on the scheduler
    * thread that ran the task; a history sink is just a handler that
    * appends. */
  sealed trait TaskEvent { def task: String }
  object TaskEvent {
    final case class Start(task: String) extends TaskEvent
    final case class Success(task: String, millis: Long) extends TaskEvent
    final case class Failure(task: String, error: Throwable) extends TaskEvent
    final case class Skipped(task: String) extends TaskEvent
  }
  type EventHandler = TaskEvent => Unit
  private val noEvents: EventHandler = _ => ()

  /** Luigi's task-history database as an event sink: one JSON line per
    * lifecycle event, appended (thread-safe — parallel waves share the
    * handler) to a local file. Line shape:
    * {"ts_ms":…,"event":"start|success|failure|skipped","task":…,
    *  "millis":…,"error":…} with absent fields omitted. */
  def historySink(path: String): EventHandler = {
    val file = java.nio.file.Paths.get(path)
    Option(file.getParent).foreach(java.nio.file.Files.createDirectories(_))
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r")
    ev => {
      val fields = Seq(s""""ts_ms":${System.currentTimeMillis()}""") ++ (ev match {
        case TaskEvent.Start(t) => Seq(s""""event":"start","task":"${esc(t)}"""")
        case TaskEvent.Success(t, ms) =>
          Seq(s""""event":"success","task":"${esc(t)}"""", s""""millis":$ms""")
        case TaskEvent.Failure(t, e) =>
          Seq(s""""event":"failure","task":"${esc(t)}"""",
            s""""error":"${esc(String.valueOf(e.getMessage))}"""")
        case TaskEvent.Skipped(t) => Seq(s""""event":"skipped","task":"${esc(t)}"""")
      })
      val line = fields.mkString("{", ",", "}") + "\n"
      file.synchronized {
        java.nio.file.Files.writeString(file, line,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
    }
  }

  /** One attempt body, honoring Task.timeoutMs (Luigi worker_timeout):
    * the run executes in a named worker thread under its own Spark job
    * group; on expiry the job group is cancelled (interrupting the
    * thread alone never stops a live Spark job), the thread
    * interrupted, and a TimeoutException thrown — which the attempt
    * loop counts as an ordinary Failure, so the retry budget applies. */
  private def runWithTimeout(t: Task, spark: SparkSession): Unit =
    if (t.timeoutMs <= 0L) t.run(spark)
    else {
      val group = s"graft-task-${t.name}-${System.nanoTime()}"
      @volatile var err: Throwable = null
      val th = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(group,
            s"${t.name} (timeoutMs=${t.timeoutMs})",
            interruptOnCancel = true)
          t.run(spark)
        } catch { case e: Throwable => err = e }
        finally spark.sparkContext.clearJobGroup()
      }, s"graft-worker-${t.name}")
      th.setDaemon(true)
      th.start()
      th.join(t.timeoutMs)
      if (th.isAlive) {
        spark.sparkContext.cancelJobGroup(group)
        th.interrupt()
        // the retry attempt must not start while this one can still
        // run: a worker that swallows the interrupt (or submits new
        // jobs after cancelJobGroup) would race the retry on the
        // task's atomic target commit, and a stale attempt could
        // clobber the retry's committed output AFTER the task was
        // reported successful. Grace-join; if the thread is still
        // alive, fail loudly as non-retryable instead of racing.
        th.join(math.max(1L, t.zombieGraceMs))
        if (th.isAlive)
          throw new ZombieTaskException(
            s"task ${t.name} still running ${t.zombieGraceMs} ms after " +
              s"cancellation at timeoutMs=${t.timeoutMs}; refusing to " +
              "retry against a live attempt")
        throw new java.util.concurrent.TimeoutException(
          s"task ${t.name} exceeded timeoutMs=${t.timeoutMs}")
      }
      if (err != null) throw err
    }

  private def attempt(t: Task, spark: SparkSession,
                      log: String => Unit, retries: Int,
                      events: EventHandler): Unit = {
    // per-task knob (Luigi retry_count) tops up the runner default
    val budget = math.max(retries, t.retries)
    var tries = 0
    var lastErr: Throwable = null
    while (tries <= budget && !t.complete) {
      if (tries > 0) {
        val backoff = t.retryBackoffMs << (tries - 1)
        if (backoff > 0) Thread.sleep(backoff)
        log(s"RETRY ${t.name} (attempt ${tries + 1})")
      }
      events(TaskEvent.Start(t.name))
      val t0 = System.nanoTime()
      try {
        runWithTimeout(t, spark); lastErr = null
        events(TaskEvent.Success(t.name, (System.nanoTime() - t0) / 1000000))
      } catch {
        case z: ZombieTaskException =>
          // non-retryable by design: the timed-out attempt is still
          // alive, so any retry would race it on the target commit
          events(TaskEvent.Failure(t.name, z))
          throw z
        case e: Throwable =>
          lastErr = e
          events(TaskEvent.Failure(t.name, e))
      }
      tries += 1
    }
    if (lastErr != null) throw lastErr
  }

  /** Runs the attempt loop under the task's worker lease when
    * [[Task.leaseTtlMs]] is positive: acquire (or take over a stale
    * lease), heartbeat every TTL/3 on a daemon timer, release on exit.
    * A fresh foreign lease propagates [[LeaseHeldException]] — the
    * task belongs to a live worker in another process. */
  private def withLease[A](t: Task, owner: String)(body: => A): A =
    if (t.leaseTtlMs <= 0L) body
    else {
      Lease.acquire(t, owner)
      @volatile var live = true
      // theft detection (round 14): renew is a CAS — if the heartbeat
      // finds the lease gone/foreign (this worker stalled past the
      // TTL and a contender took over), the attempt must not be
      // reported successful, and the foreign lease must NOT be
      // released by us.
      @volatile var lost: Option[LeaseLostException] = None
      val renewer = new Thread(() => {
        while (live) {
          try Thread.sleep(math.max(1L, t.leaseTtlMs / 3))
          catch { case _: InterruptedException => () }
          if (live) {
            try Lease.renew(t, owner)
            catch {
              case e: LeaseLostException => lost = Some(e); live = false
            }
          }
        }
      }, s"graft-lease-${t.name}")
      renewer.setDaemon(true)
      renewer.start()
      try {
        val r = body
        lost.foreach(throw _)
        r
      } finally {
        live = false; renewer.interrupt()
        if (lost.isEmpty) Lease.release(t, owner)
      }
    }

  def run(root: Task, spark: SparkSession,
          log: String => Unit = _ => (),
          retries: Int = 0,
          events: EventHandler = noEvents,
          owner: String = Lease.workerId): Seq[String] = {
    val executed = mutable.ArrayBuffer.empty[String]
    val done = mutable.Set.empty[Task]
    val inStack = mutable.Set.empty[Task]

    def visit(t: Task): Unit = {
      if (done.contains(t)) return
      if (inStack.contains(t)) throw CycleException(t.name)
      inStack += t
      t.requires.foreach(visit)
      if (!t.complete) {
        // dynamic deps (Luigi yield): resolved only once statics are
        // complete, so they may read upstream outputs; recursion covers
        // their own static+dynamic closure. inStack still guards cycles.
        t.dynamicRequires(spark).foreach(visit)
      }
      inStack -= t
      if (!t.complete) {
        log(s"RUN  ${t.name} -> ${t.output.uri}")
        withLease(t, owner) { attempt(t, spark, log, retries, events) }
        if (!t.complete) throw new IllegalStateException(
          s"task ${t.name} ran but target ${t.output.uri} still missing")
        executed += t.name
      } else { log(s"SKIP ${t.name} (complete)"); events(TaskEvent.Skipped(t.name)) }
      done += t
    }
    visit(root)
    executed.toSeq
  }

  /** Multi-worker scheduler (Luigi's `--workers N`): independent ready
    * tasks run concurrently, wave by wave — a wave is every task whose
    * dependencies are all done, sorted by name so the reported execution
    * order stays deterministic even though the wave itself is parallel.
    * Spark's scheduler is thread-safe, so concurrent tasks become
    * concurrent Spark jobs sharing the session (FAIR-pool-ready).
    *
    * `resourceCaps` is Luigi's `[resources]` section: each named unit
    * has a capacity (default 1); a ready task joins a wave only if all
    * its declared `Task.resources` units fit within what the wave has
    * left — tasks sharing a capacity-1 resource therefore never overlap.
    * A task demanding more than a resource's total capacity runs alone
    * (with a log note) instead of deadlocking the schedule. */
  def runParallel(root: Task, spark: SparkSession, workers: Int,
                  log: String => Unit = _ => (),
                  retries: Int = 0,
                  events: EventHandler = noEvents,
                  resourceCaps: Map[String, Int] = Map.empty,
                  owner: String = Lease.workerId): Seq[String] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val all = mutable.LinkedHashSet.empty[Task]
    def collect(t: Task, stack: Set[Task]): Unit = {
      if (stack(t)) throw CycleException(t.name)
      if (!all.contains(t)) {
        t.requires.foreach(collect(_, stack + t)); all += t
      }
    }
    collect(root, Set.empty)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, workers))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val executed = mutable.ArrayBuffer.empty[String]
    val done = mutable.Set.empty[Task]
    val pending = mutable.LinkedHashSet.empty[Task]
    pending ++= all
    // dynamic deps (Luigi yield): resolved on the scheduler thread the
    // first time a task's statics are all done; resolved tasks (and
    // their transitive closure) join `pending`, and the task itself is
    // gated until they finish. Cache = call-once contract.
    val dynCache = mutable.Map.empty[Task, Seq[Task]]
    def dynOf(t: Task): Seq[Task] = dynCache.getOrElseUpdate(t, {
      val dyn = if (t.complete) Seq.empty else t.dynamicRequires(spark)
      dyn.foreach { d =>
        if (!all.contains(d)) { collect(d, Set.empty); pending ++= (all -- done -- pending) }
      }
      dyn
    })
    try {
      while (pending.nonEmpty) {
        // snapshot: dynOf may grow `pending` mid-scan; rescan while an
        // empty scan GREW pending (nested dynamic deps resolve one
        // level per scan) — an empty scan that resolved nothing new is
        // a real cycle/stall
        def scan(): Seq[Task] = pending.toSeq
          .filter(t => t.requires.forall(done) && dynOf(t).forall(done))
          .sortBy(t => (-t.priority, t.name))
        var ready = scan()
        var lastSize = -1
        while (ready.isEmpty && pending.size != lastSize) {
          lastSize = pending.size
          ready = scan()
        }
        if (ready.isEmpty) throw CycleException(pending.head.name)
        // greedy admission in (priority desc, name) order under the
        // resource capacities — Luigi's scheduler order
        def cap(r: String): Int = resourceCaps.getOrElse(r, 1)
        val used = mutable.Map.empty[String, Int].withDefaultValue(0)
        val admitted = ready.filter { t =>
          val fits = t.resources.forall { case (r, n) => used(r) + n <= cap(r) }
          if (fits) t.resources.foreach { case (r, n) => used(r) += n }
          fits
        }
        val wave =
          if (admitted.nonEmpty) admitted
          else {
            log(s"RESOURCE-OVERSIZED ${ready.head.name} " +
              s"(demands ${ready.head.resources}) — running alone")
            Seq(ready.head)
          }
        val results = wave.map { t =>
          Future {
            if (!t.complete) {
              log(s"RUN  ${t.name} -> ${t.output.uri}")
              withLease(t, owner) { attempt(t, spark, log, retries, events) }
              if (!t.complete) throw new IllegalStateException(
                s"task ${t.name} ran but target ${t.output.uri} still missing")
              Some(t.name)
            } else {
              log(s"SKIP ${t.name} (complete)")
              events(TaskEvent.Skipped(t.name))
              None
            }
          }
        }
        executed ++= Await.result(Future.sequence(results), Duration.Inf).flatten
        pending --= wave
        done ++= wave
      }
    } finally pool.shutdown()
    executed.toSeq
  }

  /** Date-range backfill (O7): expand a task template over the `daysBack`
    * days ending at `stop`, newest first when `reverse` (the reference's
    * `RangeDailyBase --of Classify --days-back 4 --reverse`,
    * run_pipeline.sh:6-11); only-missing via O3 skip. */
  def backfill(mk: LocalDate => Task, stop: LocalDate, daysBack: Int,
               spark: SparkSession, reverse: Boolean = true,
               log: String => Unit = _ => (),
               events: EventHandler = noEvents): Seq[String] = {
    val dates0 = (0 until daysBack).map(d => stop.minusDays(d.toLong))
    val dates = if (reverse) dates0 else dates0.reverse
    dates.flatMap(d => run(mk(d), spark, log, events = events))
  }
}
