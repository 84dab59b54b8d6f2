package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WRITE-side DataSource V2 with a transactional commit protocol
  * (SURVEY §9.1; the engine-level generalization of the orchestrator's
  * atomic Target, `flow/Target.scala` — which itself reimplements the
  * tmp-then-rename discipline of the reference's daily outputs,
  * `00_training_pipeline.py:34`). The sink demonstrates the three
  * commit layers a real lakehouse write path has:
  *
  *  1. TASK attempts write to `<path>/.staging-<writeId>/` under
  *     attempt-unique file names; only files named in a task's
  *     DataWriter.commit() message can ever become visible, so a
  *     zombie / speculative attempt's file is dead on arrival.
  *  2. The JOB commit (driver, exactly once) renames the staging dir
  *     to a version dir and then publishes by ATOMIC RENAME of the
  *     manifest file — the single commit point. A reader either sees
  *     the old manifest or the new one, never a mix; a crash anywhere
  *     before the rename leaves the previous version fully intact.
  *  3. abort() deletes the staging dir — a failed job leaves no
  *     partial state and the manifest untouched.
  *
  * Data files are tab-escaped text (long/int/double/boolean/string —
  * the aggregate-export types; the protocol, not the encoding, is the
  * point), one file per task, schema JSON in the manifest header so
  * reads need no user schema. Append mode extends the manifest with
  * the new version's files; overwrite (SupportsTruncate) replaces it.
  * After a successful publish, version dirs no longer referenced are
  * GC'd best-effort (single-writer demo scope; a production sink keeps
  * N versions for reader isolation — the protocol is unchanged).
  *
  * Fault injection for the atomicity spec: option("abortOnValue", v)
  * makes every writer throw on a row whose first long column equals v
  * — deterministic across task retries, so the JOB fails and abort()
  * runs. Used only by TxSinkSpec.
  *
  * 100 TB: one manifest rename per job regardless of task count; task
  * files stream row-by-row (no buffering); the manifest lists O(tasks)
  * lines. On an object store the rename becomes the store's atomic
  * put-if-absent / pointer swap — the protocol shape every table
  * format (Iceberg/Delta) uses.
  */
class TxManifestSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graft tx sink needs option(\"path\", dir)")
    TxManifest.read(Paths.get(path)) match {
      case Some(m) => m.schema
      case None => throw new IllegalArgumentException(
        s"no committed manifest at $path — nothing to infer a schema from")
    }
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TxManifestTable(properties.get("path"), schema,
      Option(properties.get("abortOnValue")).map(_.toLong),
      Option(properties.get("txid")))
}

/** The committed state: schema + the exact data files that are visible. */
final case class TxManifest(schema: StructType, files: Seq[String])

object TxManifest {
  val FileName = "manifest"

  def read(root: Path): Option[TxManifest] = {
    val m = root.resolve(FileName)
    if (!Files.exists(m)) None
    else {
      val lines = Files.readAllLines(m, StandardCharsets.UTF_8).asScala.toSeq
      Some(TxManifest(
        DataType.fromJson(lines.head).asInstanceOf[StructType],
        lines.tail.filter(_.nonEmpty)))
    }
  }

  /** The COMMIT POINT: write to a temp name, fsync, atomic rename. */
  def publish(root: Path, m: TxManifest, writeId: String): Unit = {
    val tmp = root.resolve(s"$FileName.tmp-$writeId")
    val body = (m.schema.json +: m.files).mkString("\n") + "\n"
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE, StandardOpenOption.SYNC)
    Files.move(tmp, root.resolve(FileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
}

class TxManifestTable(pathStr: String, writeSchema: StructType,
                      abortOnValue: Option[Long],
                      txid: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {
  require(pathStr != null, "graft tx sink needs option(\"path\", dir)")
  override def name(): String = s"graft_tx($pathStr)"
  override def schema(): StructType =
    if (writeSchema != null) writeSchema
    else TxManifest.read(Paths.get(pathStr)).map(_.schema).orNull
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TxScanBuilder(pathStr)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TxWriteBuilder(pathStr, info.schema(), info.queryId(), abortOnValue,
      txid)
}

class TxWriteBuilder(path: String, schema: StructType, queryId: String,
                     abortOnValue: Option[Long], txid: Option[String])
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TxBatchWrite(path, schema, queryId, replace, abortOnValue, txid)
  }
}

final case class TxCommitMessage(fileName: String, rows: Long)
    extends WriterCommitMessage

class TxBatchWrite(pathStr: String, schema: StructType, writeId: String,
                   replace: Boolean, abortOnValue: Option[Long],
                   txid: Option[String] = None)
    extends BatchWrite {
  private val root = Paths.get(pathStr)
  private val staging = root.resolve(s".staging-$writeId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new TxWriterFactory(staging.toString, schema, abortOnValue)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // option("txid", t): IDEMPOTENT commit — the version dir is named by
    // the caller's transaction id (Delta's SetTransaction appId/version
    // pattern, made for Structured Streaming's foreachBatch replay: a
    // restarted query re-runs its last uncommitted batchId with the same
    // deterministic content, and the sink must publish it exactly once).
    // If the manifest already references this txid's version, the replay
    // is dropped whole; a version DIR that exists but is unreferenced is
    // a crash between dir-rename and manifest-publish — dead by the
    // manifest contract, so it is replaced. Single-writer sequential
    // (the streaming query) is the supported contract; racing writers
    // with the SAME txid would need a manifest CAS, same as §Lease.
    val versionDir = txid.map(t => "v-tx-" +
      t.replaceAll("[^A-Za-z0-9_-]", "_")).getOrElse(s"v-$writeId")
    val prevManifest = if (replace) None else TxManifest.read(root)
    if (txid.isDefined && prevManifest.exists(
        _.files.exists(_.startsWith(versionDir + "/")))) {
      TxManifest.deleteRecursively(staging) // replayed commit: no-op
      return
    }
    // only files a task attempt COMMITTED are listed; stray files from
    // failed/zombie attempts ride along in the dir but are invisible
    val committed = messages.map(_.asInstanceOf[TxCommitMessage].fileName)
    val target = root.resolve(versionDir)
    if (Files.exists(target)) TxManifest.deleteRecursively(target)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    val prev = prevManifest.map(_.files).getOrElse(Seq.empty)
    val files = prev ++ committed.sorted.map(f => s"$versionDir/$f")
    TxManifest.publish(root, TxManifest(schema, files), writeId)
    // GC version dirs the new manifest no longer references
    val live = files.map(_.split('/').head).toSet
    Option(root.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v-") &&
        !live.contains(f.getName))
      .foreach(f => TxManifest.deleteRecursively(f.toPath))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    TxManifest.deleteRecursively(staging)
}

class TxWriterFactory(stagingStr: String, schema: StructType,
                      abortOnValue: Option[Long]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TxDataWriter(stagingStr, schema, partitionId, taskId, abortOnValue)
}

/** One file per task ATTEMPT (taskId is attempt-unique); commit()
  * closes + names it, abort() deletes it. */
class TxDataWriter(stagingStr: String, schema: StructType,
                   partitionId: Int, taskId: Long,
                   abortOnValue: Option[Long])
    extends DataWriter[InternalRow] {
  private val fileName = f"part-$partitionId%05d-$taskId"
  private val path = Paths.get(stagingStr, fileName)
  private val out = Files.newBufferedWriter(path, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    abortOnValue.foreach { poison =>
      if (schema.fields.headOption.exists(_.dataType == LongType) &&
          !row.isNullAt(0) && row.getLong(0) == poison)
        throw new RuntimeException(
          s"fault injection: abortOnValue=$poison hit (TxSinkSpec)")
    }
    out.write(TxCodec.encode(row, schema)); out.write("\n")
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    TxCommitMessage(fileName, rows)
  }
  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(path)
  }
  override def close(): Unit = ()
}

/** Tab-escaped row text: literal tabs/newlines/backslashes escaped, so
  * split('\t') is unambiguous; nulls as \N (the classic TSV marker). */
object TxCodec {
  def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }
  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); case 't' => b.append('\t')
          case 'n' => b.append('\n'); case 'r' => b.append('\r')
          case o => b.append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  def encode(row: InternalRow, schema: StructType): String =
    schema.fields.indices.map { i =>
      if (row.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => java.lang.Double.toString(row.getDouble(i))
        case BooleanType => row.getBoolean(i).toString
        case StringType  => escape(row.getUTF8String(i).toString)
        case dt => throw new UnsupportedOperationException(
          s"graft tx sink supports long/int/double/boolean/string, got $dt")
      }
    }.mkString("\t")

  def decode(line: String, schema: StructType): InternalRow =
    decodeColumns(line, schema, schema.fields.indices.toArray)

  /** Pruned decode: convert only the fields at `positions` (full-schema
    * indexes), emitting a row in that pruned order. */
  def decodeColumns(line: String, schema: StructType,
                    positions: Array[Int]): InternalRow = {
    // -1 keeps trailing empty fields: a row ending in an empty string
    // column would otherwise split short and throw on access
    val parts = line.split("\t", -1)
    new GenericInternalRow(positions.map { i =>
      val p = parts(i)
      if (p == "\\N") null
      else (schema.fields(i).dataType match {
        case LongType    => p.toLong
        case IntegerType => p.toInt
        case DoubleType  => p.toDouble
        case BooleanType => p.toBoolean
        case StringType  => UTF8String.fromString(unescape(p))
        case dt => throw new UnsupportedOperationException(dt.toString)
      }): Any
    })
  }
}

/** Read side gets the same column pruning the write side's parquet
  * sibling would: a projection pushes its required-column set down to
  * the scan, readSchema shrinks, and the row decode converts ONLY the
  * required field positions (the split still walks the line — it must,
  * to find the tabs — but string unescape/boxing happens per required
  * column, and the rows Spark materializes are as narrow as the
  * projection). */
class TxScanBuilder(pathStr: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val manifest = TxManifest.read(Paths.get(pathStr)).getOrElse(
    throw new IllegalArgumentException(s"no committed manifest at $pathStr"))
  private var required: StructType = manifest.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = TxScan(pathStr, manifest, required)
}

/** Read path: the manifest IS the table — one InputPartition per
  * committed file; orphaned staging/version files are unreachable. */
final case class TxScan(pathStr: String, manifest: TxManifest,
                        required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_tx path=$pathStr files=${manifest.files.size} " +
      s"decodedColumns=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    // positions of the required columns within the full manifest schema
    val positions = required.fieldNames.map(manifest.schema.fieldIndex)
    manifest.files.map(f =>
      TxInputPartition(s"$pathStr/$f", manifest.schema, positions)
        : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TxReaderFactory
}

final case class TxInputPartition(file: String, schema: StructType,
                                  positions: Array[Int])
    extends InputPartition

class TxReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TxInputPartition]
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(part.file, "UTF-8")
      private val lines = source.getLines().filter(_.nonEmpty)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          current = TxCodec.decodeColumns(lines.next(), part.schema,
            part.positions)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
