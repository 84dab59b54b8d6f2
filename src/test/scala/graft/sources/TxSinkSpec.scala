package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** The write-side DSv2 commit protocol (SURVEY §9.1): commit publishes
  * atomically via the manifest rename; a failed job aborts with no
  * partial visibility and no staging litter. */
class TxSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val fmt = "graft.sources.TxManifestSource"

  private def freshDir(): String =
    Files.createTempDirectory("graft_tx").toString

  private def df(rows: (Long, String, java.lang.Double)*): DataFrame =
    rows.toDF("id", "name", "score")

  private def readBack(dir: String) =
    spark.read.format(fmt).option("path", dir).load()
      .as[(Long, String, Option[Double])].collect().toSet

  test("overwrite roundtrip survives tabs, newlines, nulls; GC keeps one version") {
    val dir = freshDir()
    val d1 = df((1L, "plain", 1.5), (2L, "tab\there", null),
      (3L, "nl\nthere \\slash", -0.25))
    d1.write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(readBack(dir) === Set(
      (1L, "plain", Some(1.5)), (2L, "tab\there", None),
      (3L, "nl\nthere \\slash", Some(-0.25))))

    // a second overwrite REPLACES; the old version dir is GC'd
    df((9L, "v2", 9.0)).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    assert(readBack(dir) === Set((9L, "v2", Some(9.0))))
    val versions = Paths.get(dir).toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
    assert(versions.length === 1, versions.mkString(","))
  }

  test("append mode extends the manifest across versions") {
    val dir = freshDir()
    df((1L, "a", 1.0)).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    df((2L, "b", 2.0)).write.format(fmt).option("path", dir)
      .mode("append").save()
    assert(readBack(dir) === Set((1L, "a", Some(1.0)), (2L, "b", Some(2.0))))
    // two versions, both referenced -> neither GC'd
    val versions = Paths.get(dir).toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
    assert(versions.length === 2, versions.mkString(","))
  }

  test("a writer killed mid-batch leaves the previous version fully visible") {
    val dir = freshDir()
    df((1L, "committed", 1.0), (2L, "state", 2.0))
      .write.format(fmt).option("path", dir).mode("overwrite").save()

    // the poison row kills its task deterministically on EVERY attempt,
    // so the job fails and BatchWrite.abort runs
    val boom = intercept[Exception] {
      df((3L, "doomed", 3.0), (42L, "poison", 0.0))
        .repartition(4)
        .write.format(fmt).option("path", dir)
        .option("abortOnValue", "42").mode("overwrite").save()
    }
    assert(boom.getMessage != null)

    // no partial visibility: the reader sees exactly the old version
    assert(readBack(dir) === Set((1L, "committed", Some(1.0)),
      (2L, "state", Some(2.0))))
    // no staging litter: abort removed the failed write's directory
    val litter = Paths.get(dir).toFile.listFiles()
      .filter(_.getName.startsWith(".staging-"))
    assert(litter.isEmpty, litter.mkString(","))
  }

  test("read-side column pruning: projection shrinks the scan schema and decode") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = freshDir()
    df((1L, "a", 1.0), (2L, "tab\tb", null), (3L, "", 3.5))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val full = spark.read.format(fmt).option("path", dir).load()
    def scanOf(d: DataFrame): TxScan =
      d.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      } match {
        case Seq(s: TxScan) => s
        case other => fail(s"expected one TxScan, got $other")
      }
    assert(scanOf(full).readSchema().fieldNames.toSeq ==
      Seq("id", "name", "score"))
    // 2-column projection prunes the decoded column set
    val two = full.select($"score", $"id")
    val scan = scanOf(two)
    // Spark prunes in table order and re-orders with a Project above
    assert(scan.readSchema().fieldNames.toSeq == Seq("id", "score"),
      scan.description())
    assert(two.as[(Option[Double], Long)].collect().toSet ===
      Set((Some(1.0), 1L), (None, 2L), (Some(3.5), 3L)))
    // a trailing empty-string column decodes under pruning (split keeps it)
    assert(full.select($"name").as[String].collect().toSet ===
      Set("a", "tab\tb", ""))
  }

  test("a failed FIRST write publishes nothing at all") {
    val dir = freshDir()
    intercept[Exception] {
      df((42L, "poison", 0.0)).write.format(fmt).option("path", dir)
        .option("abortOnValue", "42").mode("overwrite").save()
    }
    assert(!Files.exists(Paths.get(dir, "manifest")))
    intercept[Exception] { readBack(dir) } // nothing committed, nothing readable
  }
}
