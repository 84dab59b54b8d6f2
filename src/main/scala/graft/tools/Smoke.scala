package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: entry() on a bare session (no graft
  * configs) must return rows > 0; prints registry sizes. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n (smoke ${if (n > 0) "PASS" else "FAIL"})")
    println(s"queries: ${graft.SparkEntry.queries.size}, " +
      s"oracles: ${graft.SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
