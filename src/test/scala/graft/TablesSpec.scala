package graft

import org.apache.spark.sql.functions._

/** Pins Tables.normalizeEventTs across every physical ts form the
  * testdata generator has shipped (the round-8 regression class): long
  * nanos, TIMESTAMP_NTZ, and plain TimestampType must all normalize to
  * the SAME instants, and an unhandled form must fail loudly instead of
  * casting blind.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  private val instants = Seq(
    "2024-03-01 00:00:00.123456", "2024-03-15 12:34:56.654321")

  test("nanos, NTZ, and timestamp forms normalize to identical instants") {
    val base = instants.toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val want = base.select(unix_micros($"ts")).as[Long].collect().toSeq

    val fromTs = Tables.normalizeEventTs(base)
    val fromNanos = Tables.normalizeEventTs(
      base.select((unix_micros($"ts") * 1000).as("ts")))
    val fromNtz = Tables.normalizeEventTs(
      base.select($"ts".cast("timestamp_ntz").as("ts")))

    for ((df, tag) <- Seq((fromTs, "ts"), (fromNanos, "nanos"),
        (fromNtz, "ntz"))) {
      assert(df.schema("ts").dataType.typeName == "timestamp", tag)
      val got = df.select(unix_micros($"ts")).as[Long].collect().toSeq
      assert(got == want, s"$tag: $got != $want")
    }
  }

  test("an unhandled physical form fails loudly") {
    val weird = instants.toDF("ts") // StringType
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(weird)
    }
    assert(e.getMessage.contains("unhandled physical type"))
  }
}
