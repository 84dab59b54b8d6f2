package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling (north star; SURVEY.md §2.4): media as
  * opaque `binary` payloads + typed metadata, with decode/feature-extract
  * as batched per-partition transforms.
  *
  * The fixture corpus has no real media (`payload` is the utf-8 byte
  * encoding of documents.text), but the decode step is REAL for images:
  * ImageIO (JDK-built-in) decodes PNG/JPEG/GIF/BMP payloads into true
  * dimensions + luminance features (proved on generated PNGs in
  * MultimodalSpec); payloads no codec claims fall back to a clearly
  * marked deterministic stub, which is what the fixture and the
  * audio/video modalities exercise. Around the decoder is the Spark
  * plumbing this operator family needs at 100 TB:
  *  - binary column + metadata struct schema,
  *  - mapPartitions with an iterator (batch-shaped: one decoder init per
  *    partition, not per row — the same shape a Pandas-UDF/mapInPandas or
  *    JNI decoder needs),
  *  - feature vectors as array<float> ready for the SimSearchOps path.
  */
object MultimodalOps extends graft.QueryModule {

  /** Payload + metadata projection: modality from source, byte length,
    * content hash. Fully oracle-checkable (byte-exact in both engines). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        when($"source" === "src0", "image")
          .when($"source" === "src1", "audio")
          .when($"source" === "src2", "video")
          .otherwise("text").as("modality"),
        $"lang")
      .select($"doc_id", $"modality", $"lang",
        length($"payload").as("n_bytes"),
        sha2($"payload", 256).as("content_sha256"))
      .orderBy($"doc_id")
  }

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, modality: String, width: Int,
                                 height: Int, n_frames: Int,
                                 resized_w: Int, resized_h: Int,
                                 sampled_frames: Array[Int], feat: Array[Float])

  /** Batched decode + feature extraction. The decode step is REAL for
    * image payloads — `decodeImage` goes through the JDK's ImageIO
    * (PNG/JPEG/GIF/BMP; magic-byte sniff first, so non-media payloads
    * skip the codec) and emits true width/height plus an 8-band mean-
    * luminance feature. Payloads no codec claims (the synthetic fixture's
    * utf-8 text bytes; audio/video, which the JDK cannot decode) fall
    * back to `decodeStub`, the clearly-marked deterministic fake — so the
    * declared query is stable on the fixture while MultimodalSpec proves
    * the real path on generated PNGs. The mapPartitions shape (one
    * decoder configuration per partition, iterator in/out) is exactly
    * what a JNI/ffmpeg codec needs at 100 TB. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        when($"source" === "src0", "image").otherwise("text").as("modality"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    featuresOf(rows)
      .select($"doc_id", $"modality", $"width", $"height", $"n_frames",
        $"resized_w", $"resized_h", size($"sampled_frames").as("n_sampled"),
        round(element_at($"feat", 1), 6).as("feat0"))
      .orderBy($"doc_id")
  }

  /** Core decode pipeline over any media rows (spec entry). */
  private[llm] def featuresOf(rows: Dataset[MediaRow]): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder setup: no disk-backed ImageIO cache
      javax.imageio.ImageIO.setUseCache(false)
      it.map(m => decodeImage(m).getOrElse(decodeStub(m)))
    }.toDF()
  }

  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length > 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P') ||      // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||  // GIF
      (p(0) == 'B' && p(1) == 'M'))                   // BMP

  /** REAL image decode via the JDK's ImageIO: true dimensions,
    * aspect-preserving 224 resize plan, and an 8-dim feature = mean
    * luminance (ITU-R 601 weights) of 8 equal vertical bands in [0,1].
    * Returns None when no installed codec claims the payload. */
  private def decodeImage(m: MediaRow): Option[MediaFeatures] = {
    if (!looksLikeImage(m.payload)) None
    else Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.payload))).map { img =>
      val (w, ht) = (img.getWidth, img.getHeight)
      val bands = 8
      val feat = Array.tabulate(bands) { b =>
        val x0 = w * b / bands
        val x1 = math.max(x0 + 1, w * (b + 1) / bands)
        var sum = 0.0
        var n = 0
        var y = 0
        while (y < ht) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            n += 1; x += 1
          }
          y += 1
        }
        (sum / n / 255.0).toFloat
      }
      val scale = 224.0 / math.max(w, ht)
      MediaFeatures(m.doc_id, m.modality,
        width = w, height = ht, n_frames = 1,
        resized_w = math.max(1, math.round(w * scale).toInt),
        resized_h = math.max(1, math.round(ht * scale).toInt),
        sampled_frames = Array(0), feat = feat)
    }
  }

  /** STUB decoder — deterministic fake, NOT a real codec; the fallback
    * for payloads no installed codec claims (non-media bytes, audio and
    * video in this JDK-only container). Shapes the same decode/resize/
    * frame-sample contract as the real path: resize = aspect-preserving
    * fit into 224x224; frame-sample = uniform stride down to <=16. */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val h = m.payload.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
    val feat = Array.tabulate(8)(i =>
      (((h >>> (i * 8)) & 0xff).toFloat - 128f) / 128f)
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >>> 10) % 1024).toInt
    val frames = if (m.modality == "image") 1
      else 1 + (math.abs(h >>> 20) % 300).toInt
    // resize: fit longest edge to 224, preserve aspect
    val scale = 224.0 / math.max(w, ht)
    // frame sampling: uniform stride to at most 16 frames
    val stride = math.max(1, frames / 16)
    MediaFeatures(m.doc_id, m.modality,
      width = w, height = ht, n_frames = frames,
      resized_w = math.max(1, math.round(w * scale).toInt),
      resized_h = math.max(1, math.round(ht * scale).toInt),
      sampled_frames = (0 until frames by stride).take(16).toArray,
      feat = feat)
  }

  /** The at-scale multimodal INGEST path: production media lives as one
    * FILE PER OBJECT on shared storage (the object-store layout a 100 TB
    * pipeline actually reads), not as a parquet column. Spark's built-in
    * binaryFile source turns a directory tree into (path, modTime,
    * length, content) rows with one split per file. The fixture payloads
    * are materialized ONCE per corpus as a content-keyed file tree
    * (doc_<id>.bin, written executor-side via foreachPartition — no
    * driver collect; atomic publish + stale-generation sweep like every
    * other artifact), then ingested through format("binaryFile") with a
    * pathGlobFilter. Doc identity is recovered from the file name and
    * the projection matches [[mediaMeta]]'s byte accounting — the oracle
    * is the same projection derived from the TABLE, so the row goes red
    * if ingest drops, duplicates, or corrupts one payload byte. 1-in-20
    * slice keeps the file count proportionate to what the operator
    * demonstrates (ingest fidelity, not bulk throughput). */
  def mediaIngest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val path = s"${graft.Artifacts.root}/graft_media_files/" +
      graft.Artifacts.key("v1", sfDir, "documents.parquet")
    val target = graft.flow.DirTarget(path)
    if (!target.exists) target.atomicWrite { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      graft.Tables.documents(spark, sfDir)
        .filter($"doc_id" % 20 === 0 && $"text".isNotNull)
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
          it.foreach { case (id, bytes) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$tmp/doc_$id.bin"), bytes)
          }
        }
    }
    graft.Artifacts.sweepStale(path)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(path)
      .select(
        regexp_extract($"path", "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        sha2($"content", 256).as("content_sha256"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (mediaMeta _),
    "q_multimodal_features" -> (mediaFeatures _),
    "q_multimodal_ingest_files" -> (mediaIngest _))

  def oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN source = 'src0' THEN 'image'
        |       WHEN source = 'src1' THEN 'audio'
        |       WHEN source = 'src2' THEN 'video'
        |       ELSE 'text' END AS modality,
        |  lang,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the table-derived truth of the file-tree ingest: same slice, same
    // byte accounting — lossless ingest means equality
    "q_multimodal_ingest_files" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents WHERE doc_id % 20 = 0 AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin)
}
