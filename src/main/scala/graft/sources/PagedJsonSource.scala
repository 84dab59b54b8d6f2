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
  * fixed-size API pages). Two page transports share one reader:
  *
  *  - FILE mode (`option("path", dir)`): local JSON-lines page files
  *    `<path>/page-0.json`, `page-1.json`, … stand in for API pages.
  *  - HTTP mode (`option("url", base)`): each page is fetched from
  *    `<base>?page=N&size=<pageSize>` by the EXECUTOR that owns the
  *    partition — the fetch itself is distributed, unlike the
  *    reference's sequential driver loop. The total record cap comes
  *    from `option("limit", N)` (the PRAW `limit=` contract: the caller
  *    states up front how much to pull, which fixes the page count at
  *    planning time with no probe requests); a short or empty page just
  *    yields fewer rows.
  *
  * Shared paging contract: every page holds exactly `pageSize` records
  * except the last. One InputPartition per page, so a 1000-page source
  * fetches with 1000-way parallelism; a pushed-down LIMIT prunes whole
  * trailing pages at planning time (exact under the full-pages
  * contract) and is declared partial, so Spark still applies the global
  * limit.
  *
  * Beyond LIMIT, the source exposes the cursor position as an
  * `ordinal` column (record i of page p has ordinal p·pageSize + i —
  * the position a paged API's cursor walks) and pushes RANGE filters
  * on it down to the page fan-out: `ordinal >= 26 AND ordinal < 50`
  * at pageSize 25 plans (and in HTTP mode REQUESTS) only page 1.
  * Pruning is page-granular, so the filters stay residual — Spark
  * re-applies them to trim the partial first/last page — mirroring the
  * partial-limit contract. A bounded ordinal window also substitutes
  * for `limit` as the HTTP page-count bound.
  *
  *   spark.read.format("graft.sources.PagedJsonSource")
  *     .option("path", dir).option("pageSize", 25).load()
  *   spark.read.format("graft.sources.PagedJsonSource")
  *     .option("url", "http://host/posts").option("pageSize", 25)
  *     .option("limit", 100).load()
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedJsonTable(
      properties.get("path"),
      properties.get("url"),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(25),
      Option(properties.get("limit")).map(_.toInt).getOrElse(Int.MaxValue))
}

object PagedJsonSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("selftext", StringType),
    StructField("subreddit", StringType),
    StructField("ordinal", LongType, nullable = false)))

  def pageFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("page-\\d+\\.json"))
      .sortBy(_.getName.stripPrefix("page-").stripSuffix(".json").toInt)
}

class PagedJsonTable(path: String, url: String, pageSize: Int,
                     totalLimit: Int) extends Table with SupportsRead {
  override def name(): String =
    s"paged_json(${if (url != null) url else path})"
  override def schema(): StructType = PagedJsonSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(path, url, pageSize, totalLimit)
}

class PagedJsonScanBuilder(path: String, url: String, pageSize: Int,
                           totalLimit: Int)
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var limit: Int = Int.MaxValue
  private var ordLo: Long = 0L
  private var ordHi: Long = Long.MaxValue // inclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = PagedJsonSource.Schema

  /** Column pruning reaches the JSON decode itself: the reader extracts
    * only the required fields from each page record, so a 2-column
    * projection over a 100 TB crawl pull parses 2 fields per record,
    * not 4 (and skips the ordinal bookkeeping when ordinal is neither
    * selected nor range-filtered). */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // partial: the source prunes pages/rows, Spark keeps the global limit
  override def isPartiallyPushed: Boolean = true

  private def long(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Range filters on `ordinal` narrow the [ordLo, ordHi] window the
    * page fan-out honors; everything (including the accepted ones) is
    * returned as residual because the pruning is page-granular — the
    * same partial contract as the pushed limit. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case GreaterThan("ordinal", v) =>
        long(v).exists { l => ordLo = math.max(ordLo, l + 1); true }
      case GreaterThanOrEqual("ordinal", v) =>
        long(v).exists { l => ordLo = math.max(ordLo, l); true }
      case LessThan("ordinal", v) =>
        long(v).exists { l => ordHi = math.min(ordHi, l - 1); true }
      case LessThanOrEqual("ordinal", v) =>
        long(v).exists { l => ordHi = math.min(ordHi, l); true }
      case EqualTo("ordinal", v) =>
        long(v).exists { l =>
          ordLo = math.max(ordLo, l); ordHi = math.min(ordHi, l); true }
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new PagedJsonScan(path, url, pageSize, math.min(limit, totalLimit),
      ordLo, ordHi, required)
}

case class PagedJsonScan(path: String, url: String, pageSize: Int,
                         limit: Int, ordLo: Long = 0L,
                         ordHi: Long = Long.MaxValue,
                         required: StructType = PagedJsonSource.Schema)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"paged_json ${if (url != null) s"url=$url" else s"path=$path"} " +
      s"pageSize=$pageSize" +
      (if (limit != Int.MaxValue) s" pushedLimit=$limit" else "") +
      (if (ordLo > 0L || ordHi != Long.MaxValue)
        s" pushedOrdinalRange=[$ordLo,$ordHi]" else "") +
      s" decodedFields=[${required.fieldNames.mkString(",")}]"

  /** pages needed under the full-pages contract: the first
    * ceil(limit/pageSize) pages are guaranteed to contain the first
    * `limit` records */
  private def neededPages(available: Int): Int =
    if (limit == Int.MaxValue) available
    else math.min(available,
      ((limit.toLong + pageSize - 1) / pageSize).toInt)

  /** first/last page (inclusive) the pushed ordinal window can touch */
  private def loPage: Int =
    math.min(math.max(ordLo, 0L) / pageSize, Int.MaxValue.toLong).toInt
  private def hiPage: Long =
    if (ordHi == Long.MaxValue) Long.MaxValue else ordHi / pageSize

  override def planInputPartitions(): Array[InputPartition] =
    if (ordHi < ordLo) Array.empty // contradictory range: zero fetches
    else if (url != null) {
      // either bound fixes the HTTP page count: the PRAW limit=
      // contract, or a bounded pushed ordinal window
      require(limit != Int.MaxValue || ordHi != Long.MaxValue,
        "HTTP mode needs option(\"limit\", N) or a bounded ordinal " +
          "range filter to fix the page count (the PRAW limit= contract)")
      val lastByLimit =
        if (limit == Int.MaxValue) Long.MaxValue
        else neededPages(Int.MaxValue).toLong - 1
      val last = math.min(lastByLimit, hiPage)
      val pages = last - loPage + 1
      // a large-but-finite window would otherwise plan that many
      // InputPartitions (limit=2e9 at pageSize 25 -> 80M partition
      // objects ON THE DRIVER before a single request is made)
      require(pages <= PagedJsonScan.MaxHttpPages,
        s"limit=$limit ordinalRange=[$ordLo,$ordHi] at pageSize=$pageSize " +
          s"plans $pages HTTP pages (max ${PagedJsonScan.MaxHttpPages}); " +
          "raise option(\"pageSize\") or narrow the range")
      (loPage.toLong to last).map { i =>
        PagedJsonInputPartition(s"$url?page=$i&size=$pageSize", limit,
          i * pageSize, required.fieldNames): InputPartition
      }.toArray
    } else {
      val files = PagedJsonSource.pageFiles(path)
      files.take(neededPages(files.length)).zipWithIndex
        .filter { case (_, i) => i >= loPage && i <= hiPage }
        .map { case (f, i) =>
          PagedJsonInputPartition(f.getAbsolutePath, limit,
            i.toLong * pageSize, required.fieldNames): InputPartition
        }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory
}

object PagedJsonScan {
  /** upper bound on planned HTTP pages: 100k partitions is already far
    * beyond what a paged-API source should fan out to (and well under
    * driver-memory trouble); a limit that needs more is a config error */
  val MaxHttpPages = 100000
}

case class PagedJsonInputPartition(location: String, maxRows: Int,
                                   ordinalBase: Long,
                                   fields: Array[String])
    extends InputPartition

class PagedJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagedJsonInputPartition]
    new PartitionReader[InternalRow] {
      // file or http: the same JSON-lines page body either way
      private val source =
        if (part.location.startsWith("http:") ||
            part.location.startsWith("https:")) {
          val conn = new java.net.URL(part.location).openConnection()
          conn.setConnectTimeout(10000)
          conn.setReadTimeout(30000)
          scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
        } else scala.io.Source.fromFile(part.location, "UTF-8")
      private val lines =
        source.getLines().filter(_.nonEmpty).take(part.maxRows)
      private val mapper = new ObjectMapper()
      private var ordinal = part.ordinalBase - 1
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val node = mapper.readTree(lines.next())
          def field(n: String): UTF8String = {
            val v = node.get(n)
            if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
          }
          ordinal += 1
          // pruned decode: only the pushed-down required fields are
          // extracted from the page record, in the pruned schema's order
          current = new GenericInternalRow(part.fields.map {
            case "ordinal" => ordinal: Any
            case n => field(n): Any
          })
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
