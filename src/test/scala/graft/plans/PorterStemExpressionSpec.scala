package graft.plans

import graft.SparkTestBase
import graft.text.Porter2
import org.apache.spark.sql.functions._

/** The native codegen expression must agree with the plain Scala stemmer
  * everywhere, and register through both entry points. */
class PorterStemExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("porter_stem expression == Porter2.stem over fixture vocabulary") {
    GraftExtensions.register(spark)
    val words = graft.Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("w")).distinct()
    val viaExpr = words
      .select($"w", call_function("porter_stem", $"w").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (w, s) =>
      assert(s == Porter2.stem(w), s"expr($w)=$s != scala=${Porter2.stem(w)}")
    }
  }

  test("works in SQL after registration; null-safe") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT porter_stem('realization')").head.getString(0)
      == "realize")
    assert(spark.sql("SELECT porter_stem(CAST(NULL AS STRING))").head.isNullAt(0))
  }
}
