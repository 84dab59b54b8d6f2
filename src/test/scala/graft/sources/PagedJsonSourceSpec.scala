package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.flow.{FlowConfig, Pipelines, Runner}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The D1 DataSource V2 source: page files read as input partitions,
  * pushed-down LIMIT pruning whole pages, and the training pipeline's
  * Ingest running through it end-to-end. */
class PagedJsonSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def goldenDir: String = getClass.getResource("/golden").getPath

  /** golden roh days re-materialized as JSON-lines API pages of 25 */
  private def buildPages(pageSize: Int = 25): String = {
    val days = new java.io.File(goldenDir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    val rows = days.flatMap(d => graft.text.Clean
      .readRohCsv(spark, s"$goldenDir/$d/roh.csv").toJSON.collect())
    val dir = Files.createTempDirectory("graft_pages")
    rows.grouped(pageSize).zipWithIndex.foreach { case (page, i) =>
      Files.write(dir.resolve(s"page-$i.json"),
        page.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  test("reads all pages; schema and row set match the csv fixtures") {
    val pages = buildPages()
    val viaSource = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", pages).load()
    assert(viaSource.columns.toSeq ==
      Seq("id", "title", "selftext", "subreddit", "ordinal"))
    // the cursor column is the global record position across pages
    assert(viaSource.select($"ordinal").collect().map(_.getLong(0)).sorted
      .toSeq == (0L until viaSource.count()).toSeq)
    val days = new java.io.File(goldenDir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    val viaCsv = days.map(d => graft.text.Clean
      .readRohCsv(spark, s"$goldenDir/$d/roh.csv")).reduce(_ unionByName _)
    assert(viaSource.count() == viaCsv.count())
    assert(viaSource.select($"id").collect().map(_.getString(0)).toSet ==
      viaCsv.select($"id").collect().map(_.getString(0)).toSet)
  }

  test("pushed limit prunes trailing pages at planning time") {
    val pages = buildPages(pageSize = 25)
    val limited = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", pages).option("pageSize", "25").load()
      .limit(30)
    val scan = limited.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan
    } match {
      case Seq(s: PagedJsonScan) => s
      case other => fail(s"expected one PagedJsonScan, got $other")
    }
    assert(scan.limit == 30, s"limit not pushed: $scan")
    // ceil(30/25) = 2 of the 6 pages planned
    assert(scan.planInputPartitions().length == 2)
    // partial push: Spark's own limit still trims the 2nd page's overshoot
    assert(limited.count() == 30)
  }

  test("HTTP mode fetches pages from a live server; pushed limit prunes requests") {
    import scala.jdk.CollectionConverters._
    val records = (0 until 60).map(i =>
      s"""{"id":"r$i","title":"t$i","selftext":"body $i","subreddit":"s"}""")
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/posts",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val params = Option(exchange.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("="))
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val page = params("page").toInt
        val size = params("size").toInt
        hits.add(page)
        val body = records.slice(page * size, (page + 1) * size)
          .mkString("", "\n", "\n").getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length.toLong)
        exchange.getResponseBody.write(body)
        exchange.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/posts"
      def read() = spark.read.format("graft.sources.PagedJsonSource")
        .option("url", base).option("pageSize", "25").option("limit", "60")
        .load()
      assert(read().count() == 60) // 3 pages: 25 + 25 + 10
      assert(read().select($"id").collect().map(_.getString(0)).toSet ==
        (0 until 60).map(i => s"r$i").toSet)
      hits.clear()
      // ceil(30/25) = 2: the pushed limit must stop page 2 from being hit
      assert(read().limit(30).count() == 30)
      assert(hits.asScala.toSet == Set(0, 1), s"pages fetched: $hits")

      // pushed ordinal RANGE prunes requests on both ends: [26, 50)
      // lives entirely in page 1 of 25, so pages 0 and 2 are never hit
      hits.clear()
      val window = read().filter($"ordinal" >= 26 && $"ordinal" < 50)
      assert(window.count() == 24)
      assert(window.select($"id").collect().map(_.getString(0)).toSet ==
        (26 until 50).map(i => s"r$i").toSet)
      assert(hits.asScala.toSet == Set(1), s"pages fetched: $hits")

      // a bounded range substitutes for limit as the HTTP page bound
      hits.clear()
      val noLimit = spark.read.format("graft.sources.PagedJsonSource")
        .option("url", base).option("pageSize", "25").load()
        .filter($"ordinal" < 26)
      assert(noLimit.count() == 26)
      assert(hits.asScala.toSet == Set(0, 1), s"pages fetched: $hits")
    } finally server.stop(0)
  }

  test("ordinal range prunes file pages at planning time; residual trims rows") {
    val pages = buildPages(pageSize = 25)
    def scanOf(df: org.apache.spark.sql.DataFrame): PagedJsonScan =
      df.queryExecution.sparkPlan.collect {
        case b: BatchScanExec => b.scan
      } match {
        case Seq(s: PagedJsonScan) => s
        case other => fail(s"expected one PagedJsonScan, got $other")
      }
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", pages).option("pageSize", "25").load()
    val total = df.count()
    val windowed = df.filter($"ordinal" >= 30 && $"ordinal" <= 60)
    val scan = scanOf(windowed)
    assert(scan.ordLo == 30 && scan.ordHi == 60, scan.toString)
    // pages 1 and 2 of the 6 survive planning
    assert(scan.planInputPartitions().length == 2)
    // the filters stay residual: exact row trim at both partial pages
    assert(windowed.count() == math.min(61, total) - 30)
    // contradictory range plans ZERO partitions
    val none = scanOf(df.filter($"ordinal" > 10 && $"ordinal" < 5))
    assert(none.planInputPartitions().isEmpty)
  }

  test("column pruning reaches the JSON decode: 2-column select shrinks the scan schema") {
    val pages = buildPages(pageSize = 25)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", pages).option("pageSize", "25").load()
    def scanOf(d: org.apache.spark.sql.DataFrame): PagedJsonScan =
      d.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      } match {
        case Seq(s: PagedJsonScan) => s
        case other => fail(s"expected one PagedJsonScan, got $other")
      }
    // full scan decodes all 5 fields
    assert(scanOf(df).readSchema().fieldNames.toSeq ==
      Seq("id", "title", "selftext", "subreddit", "ordinal"))
    // a 2-column projection prunes the decoded field set to exactly those 2
    val two = df.select($"id", $"subreddit")
    val scan = scanOf(two)
    assert(scan.readSchema().fieldNames.toSeq == Seq("id", "subreddit"),
      s"decode not pruned: ${scan.description()}")
    assert(two.count() == df.count())
    assert(two.select($"id").collect().map(_.getString(0)).toSet ==
      df.select($"id").collect().map(_.getString(0)).toSet)
    // the synthesized cursor column survives pruning on its own
    val ords = df.select($"ordinal")
    assert(scanOf(ords).readSchema().fieldNames.toSeq == Seq("ordinal"))
    assert(ords.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until df.count()).toSeq)
    // pruning composes with the pushed ordinal range
    val windowed = df.filter($"ordinal" >= 30 && $"ordinal" <= 60)
      .select($"title")
    val ws = scanOf(windowed)
    // residual ordinal filter keeps ordinal in the scan schema; title rides along
    assert(ws.readSchema().fieldNames.toSet.subsetOf(Set("title", "ordinal")))
    assert(ws.planInputPartitions().length == 2)
    assert(windowed.count() == 31)
  }

  test("Ingest pulls through the DSv2 source; same rows as the csv mode") {
    val srcDir = Files.createTempDirectory("graft_pagesrc").toString
    val pages = buildPages()
    Files.move(Paths.get(pages), Paths.get(s"$srcDir/pages"))
    val cfgPages = FlowConfig(
      Files.createTempDirectory("graft_flow_dsv2").toString, srcDir)
    val cfgCsv = FlowConfig(
      Files.createTempDirectory("graft_flow_csv").toString, goldenDir)
    assert(Runner.run(Pipelines.Ingest(cfgPages), spark) == Seq("Ingest"))
    assert(Runner.run(Pipelines.Ingest(cfgCsv), spark) == Seq("Ingest"))
    def ids(cfg: FlowConfig): Set[String] = graft.text.Clean
      .readRohCsv(spark, Pipelines.Ingest(cfg).output.uri)
      .select($"id").collect().map(_.getString(0)).toSet
    val (p, c) = (ids(cfgPages), ids(cfgCsv))
    assert(p == c && p.nonEmpty)
  }
}
