package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The doc counts are generated, not hand-synced: COVERAGE.md must
  * carry the registry's exact marked line (run `scripts/run.sh
  * graft.tools.Counts` and paste on drift). */
class CountsSpec extends AnyFunSuite {
  test("COVERAGE.md header counts match the query registry") {
    assert(Counts.orphanOracles.isEmpty,
      s"oracleSql names with no matching query: ${Counts.orphanOracles}")
    assert(Counts.rowsOnly >= 0)
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    assert(doc.contains(Counts.line),
      s"COVERAGE.md is out of sync with the registry — expected line:\n" +
        Counts.line)
  }
}
