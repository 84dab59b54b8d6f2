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

  def run(root: Task, spark: SparkSession,
          log: String => Unit = _ => (),
          retries: Int = 0): Seq[String] = {
    val executed = mutable.ArrayBuffer.empty[String]
    val done = mutable.Set.empty[Task]
    val inStack = mutable.Set.empty[Task]

    def attempt(t: Task): Unit = {
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

    def visit(t: Task): Unit = {
      if (done.contains(t)) return
      if (inStack.contains(t)) throw CycleException(t.name)
      inStack += t
      t.requires.foreach(visit)
      inStack -= t
      if (!t.complete) {
        log(s"RUN  ${t.name} -> ${t.output.uri}")
        attempt(t)
        if (!t.complete) throw new IllegalStateException(
          s"task ${t.name} ran but target ${t.output.uri} still missing")
        executed += t.name
      } else log(s"SKIP ${t.name} (complete)")
      done += t
    }
    visit(root)
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
