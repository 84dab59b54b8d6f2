package graft.tools

/** ONE authoritative source for the coverage counts (round-12 verdict
  * hygiene item: the COVERAGE.md header was hand-synced each round and
  * drifted once). The counts come straight from the registry; the
  * marked line below is pasted verbatim into COVERAGE.md and
  * CountsSpec asserts the doc still matches the registry, so a wave
  * that adds queries without updating the doc fails the suite. */
object Counts {
  def declared: Int = graft.SparkEntry.queries.size
  def oracled: Int = graft.SparkEntry.oracleSql.size
  def rowsOnly: Int = declared - oracled

  /** Oracle entries whose name matches no declared query — a typo'd
    * rename that would silently weaken the correctness gate. */
  def orphanOracles: Set[String] =
    graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet

  /** The exact line COVERAGE.md must carry. */
  def line: String =
    s"Counts (registry-generated, spec-enforced): $declared declared / " +
      s"$oracled oracled / $rowsOnly rows-only."

  def main(args: Array[String]): Unit = {
    require(orphanOracles.isEmpty,
      s"oracleSql names with no matching query: $orphanOracles")
    println(line)
  }
}
