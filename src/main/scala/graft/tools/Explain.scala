package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan + wall time of one declared
  * query. Usage: Explain <queryName> [sfDir] [explain|time|both] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (mode != "time") df.explain("formatted")
    if (mode != "explain") {
      var last = 0L
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = df.count()
        last = n
        println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
