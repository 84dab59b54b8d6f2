package graft.tools
import org.apache.spark.sql.SparkSession
/** Done-criterion check for order-independent optimizer installs: a fresh
  * session running the declared corpus-clean query must get the heap plan
  * without any other query having run first. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_pipeline_corpus_clean")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    println("HAS_TOPK_PLAN=" + plan.contains("TopKPerKeyPlan"))
    spark.stop()
  }
}
