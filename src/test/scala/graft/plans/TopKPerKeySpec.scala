package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator must agree with the window-function
  * formulation on every input, and must actually plan through its own
  * exec node (not fall back to something Catalyst substitutes). */
class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  test("matches window row_number<=k on the fixture and on skewed data") {
    val fixture = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    // skewed twin: one key holds ~90% of rows, plus a key with < k rows
    val skew = spark.range(0, 1000)
      .select($"id".as("o_orderkey"),
        when($"id" % 10 === 0, concat(lit("k"), $"id" % 3))
          .otherwise(lit("hot")).as("o_orderstatus"),
        ($"id" % 97).cast("double").as("o_totalprice"))
    for (df <- Seq(fixture, skew)) {
      val custom = TopKPerKey(df, 3, Seq("o_orderstatus"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true))
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val expected = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(custom == expected)
    }
  }

  test("RewriteTopKWindow: idiomatic window filter plans through the heap operator") {
    RewriteTopKWindowInstaller.install(spark)
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val idiomatic = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
    // the rule injected the heap operator below the window
    assert(idiomatic.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"),
      idiomatic.queryExecution.optimizedPlan.toString.take(1500))
    // and results (including the rn column) are unchanged
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteTopKWindow)
    val plain = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
    assert(!plain.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
    assert(idiomatic.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    RewriteTopKWindowInstaller.install(spark)
  }

  test("plans through TopKPerKeyExec") {
    val df = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val plan = TopKPerKey(df, 2, Seq("o_orderstatus"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("empty partCols is a GLOBAL top-k, not top-k per partition") {
    val df = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice")
      .repartition(8) // force multiple partitions so the old bug would surface
    val custom = TopKPerKey(df, 5, Seq(),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
      .collect().map(_.toSeq).toSet
    val expected = df.orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(5).collect().map(_.toSeq).toSet
    assert(custom.size == 5 && custom == expected)
  }

  test("map-side partial caps shuffled rows at k*keys per mapper") {
    val result = TopKPerKey(
      graft.Tables.orders(spark, sf0001)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice"),
      3, Seq("o_orderstatus"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
    val inputRows = graft.Tables.orders(spark, sf0001).count()
    result.collect()
    // unwrap AQE (query stages hide their subtree from collect)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case other => Seq(other)
    }
    val execs = allNodes(result.queryExecution.executedPlan).collect {
      case t: TopKPerKeyExec => t
    }
    assert(execs.exists(_.partial) && execs.exists(!_.partial),
      s"expected partial+final TopKPerKeyExec pair:\n${result.queryExecution.executedPlan}")
    val partialOut = execs.find(_.partial).get.longMetric("numOutputRows").value
    val mappers = spark.sparkContext.defaultParallelism
    // 3 order statuses in the fixture; the partial pass must shrink the
    // exchange input from all rows to <= k*keys per mapper
    assert(partialOut <= 3L * 3 * mappers && partialOut < inputRows,
      s"partial emitted $partialOut rows (input $inputRows)")
  }
}
