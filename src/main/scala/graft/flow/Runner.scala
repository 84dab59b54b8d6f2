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

  private def attempt(t: Task, spark: SparkSession,
                      log: String => Unit, retries: Int): Unit = {
    var tries = 0
    var lastErr: Throwable = null
    while (tries <= retries && !t.complete) {
      if (tries > 0) log(s"RETRY ${t.name} (attempt ${tries + 1})")
      try { t.run(spark); lastErr = null }
      catch { case e: Throwable => lastErr = e }
      tries += 1
    }
    if (lastErr != null) throw lastErr
  }

  def run(root: Task, spark: SparkSession,
          log: String => Unit = _ => (),
          retries: Int = 0): Seq[String] = {
    val executed = mutable.ArrayBuffer.empty[String]
    val done = mutable.Set.empty[Task]
    val inStack = mutable.Set.empty[Task]

    def visit(t: Task): Unit = {
      if (done.contains(t)) return
      if (inStack.contains(t)) throw CycleException(t.name)
      inStack += t
      t.requires.foreach(visit)
      inStack -= t
      if (!t.complete) {
        log(s"RUN  ${t.name} -> ${t.output.uri}")
        attempt(t, spark, log, retries)
        if (!t.complete) throw new IllegalStateException(
          s"task ${t.name} ran but target ${t.output.uri} still missing")
        executed += t.name
      } else log(s"SKIP ${t.name} (complete)")
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
    * concurrent Spark jobs sharing the session (FAIR-pool-ready). */
  def runParallel(root: Task, spark: SparkSession, workers: Int,
                  log: String => Unit = _ => (),
                  retries: Int = 0): Seq[String] = {
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
    try {
      while (pending.nonEmpty) {
        val wave = pending.filter(_.requires.forall(done)).toSeq.sortBy(_.name)
        if (wave.isEmpty) throw CycleException(pending.head.name)
        val results = wave.map { t =>
          Future {
            if (!t.complete) {
              log(s"RUN  ${t.name} -> ${t.output.uri}")
              attempt(t, spark, log, retries)
              if (!t.complete) throw new IllegalStateException(
                s"task ${t.name} ran but target ${t.output.uri} still missing")
              Some(t.name)
            } else { log(s"SKIP ${t.name} (complete)"); None }
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
               log: String => Unit = _ => ()): Seq[String] = {
    val dates0 = (0 until daysBack).map(d => stop.minusDays(d.toLong))
    val dates = if (reverse) dates0 else dates0.reverse
    dates.flatMap(d => run(mk(d), spark, log))
  }
}
