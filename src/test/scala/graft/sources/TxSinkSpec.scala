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
