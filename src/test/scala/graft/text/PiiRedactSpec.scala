package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-PII behavior for q_text_pii_redact (the fixture corpus is
  * synthetic word salad, so the oracle only proves engine parity — this
  * pins that the patterns actually catch PII-shaped strings and leave
  * clean text untouched). */
class PiiRedactSpec extends SparkTestBase {
  import spark.implicits._

  private def redactOne(text: String): (String, Int, Int, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.piiRedact(spark, dir).head()
    (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("emails, ips, and long digit runs are redacted with typed placeholders") {
    val (red, em, ip, num) = redactOne(
      "contact alice.smith+spam@example-mail.co.uk or 192.168.10.1 " +
        "card 4111111111111111 done")
    assert(red == "contact <EMAIL> or <IP> card <NUMBER> done", red)
    assert((em, ip, num) == ((1, 1, 1)))
  }

  test("clean text passes through unchanged; short digit runs survive") {
    val text = "version 2 of chapter 10 shipped in 2024 at noon"
    val (red, em, ip, num) = redactOne(text)
    assert(red == text)
    assert((em, ip, num) == ((0, 0, 0)))
  }

  test("chain order: digits inside earlier placeholders never re-match") {
    // the email redaction runs first; its placeholder contains no
    // digits, so the later rules see only the genuine ip
    val (red, em, ip, num) = redactOne("ping host99admin@mail.example.com and 10.0.0.7")
    assert(red == "ping <EMAIL> and <IP>", red)
    assert((em, ip, num) == ((1, 1, 0)))
  }
}
