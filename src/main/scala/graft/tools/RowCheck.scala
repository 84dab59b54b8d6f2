package graft.tools
import org.apache.spark.sql.SparkSession
object RowCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.sliding(2, 2).foreach { case Array(q, dir) =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"$q rows=${df.count()}")
      df.show(5, false)
    }
    spark.stop()
  }
}
