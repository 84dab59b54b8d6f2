package graft.text

import graft.SparkTestBase

/** Golden e2e parity test (SURVEY.md §5.2): run our Clean chain over the
  * reference's committed raw inputs (daily/<date>/roh.csv) and compare
  * column-exact against its committed outputs (cleaned.csv) — this pins the
  * whole D8-D14 chain including Snowball stemming and the NLTK stopword
  * list. Fixtures copied per FIXTURES.md §C. */
class TextCleanGoldenSpec extends SparkTestBase {

  private val days = Seq("02-19-2018", "02-20-2018", "02-21-2018", "02-22-2018")

  private def res(p: String): String =
    getClass.getResource(s"/golden/$p").getPath

  for (day <- days) test(s"clean(roh) == cleaned for $day") {
    val raw = Clean.readRohCsv(spark, res(s"$day/roh.csv"))
    val got = Clean(raw).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

    val want = spark.read
      .option("header", true).option("delimiter", ";")
      .option("multiLine", true).option("escape", "\"")
      .csv(res(s"$day/cleaned.csv"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

    assert(got.keySet == want.keySet,
      s"id sets differ: missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    val diffs = want.collect {
      case (id, (cw, sub)) if got(id) != ((cw, sub)) =>
        s"$id:\n  want: $cw\n  got:  ${got(id)._1}"
    }
    assert(diffs.isEmpty, s"${diffs.size} rows differ:\n${diffs.take(5).mkString("\n")}")
  }
}
