package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 batch source for the reference's one true
  * external source (D1): the paginated subreddit pull of
  * `00_training_pipeline.py:37-42` (`.hot(limit=N)` cursors through
  * fixed-size API pages). Local JSON-lines page files stand in for the
  * API pages, with the API's paging contract: every page holds exactly
  * `pageSize` records except the last.
  *
  * Layout: `<path>/page-0.json`, `page-1.json`, … — one JSON object per
  * line with string fields (id, title, selftext, subreddit).
  *
  * Spark-first mapping of "fetch": one InputPartition per page, so a
  * 1000-page source fetches with 1000-way parallelism instead of the
  * reference's sequential driver loop; a pushed-down LIMIT prunes whole
  * trailing pages at planning time (exact under the full-pages contract)
  * and is declared partial, so Spark still applies the global limit.
  *
  *   spark.read.format("graft.sources.PagedJsonSource")
  *     .option("path", dir).option("pageSize", 25).load()
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedJsonTable(properties.get("path"),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(25))
}

object PagedJsonSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("selftext", StringType),
    StructField("subreddit", StringType)))

  def pageFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("page-\\d+\\.json"))
      .sortBy(_.getName.stripPrefix("page-").stripSuffix(".json").toInt)
}

class PagedJsonTable(path: String, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(path, pageSize)
}

class PagedJsonScanBuilder(path: String, pageSize: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Int = Int.MaxValue
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // partial: the source prunes pages/rows, Spark keeps the global limit
  override def isPartiallyPushed: Boolean = true
  override def build(): Scan = new PagedJsonScan(path, pageSize, limit)
}

case class PagedJsonScan(path: String, pageSize: Int, limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"paged_json path=$path pageSize=$pageSize" +
      (if (limit != Int.MaxValue) s" pushedLimit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val files = PagedJsonSource.pageFiles(path)
    // full-pages contract: the first ceil(limit/pageSize) pages are
    // guaranteed to contain the first `limit` records
    val needed =
      if (limit == Int.MaxValue) files.length
      else math.min(files.length,
        ((limit.toLong + pageSize - 1) / pageSize).toInt)
    files.take(needed)
      .map(f => PagedJsonInputPartition(f.getAbsolutePath, limit): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory
}

case class PagedJsonInputPartition(file: String, maxRows: Int)
    extends InputPartition

class PagedJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagedJsonInputPartition]
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(part.file, "UTF-8")
      private val lines =
        source.getLines().filter(_.nonEmpty).take(part.maxRows)
      private val mapper = new ObjectMapper()
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val node = mapper.readTree(lines.next())
          def field(n: String): UTF8String = {
            val v = node.get(n)
            if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
          }
          current = new GenericInternalRow(Array[Any](
            field("id"), field("title"), field("selftext"), field("subreddit")))
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
