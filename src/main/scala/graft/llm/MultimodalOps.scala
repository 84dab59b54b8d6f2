package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling (north star; SURVEY.md §2.4): media as
  * opaque `binary` payloads + typed metadata, with decode/feature-extract
  * as batched per-partition transforms.
  *
  * The fixture corpus has no real media, so `payload` is the utf-8 byte
  * encoding of documents.text and the DECODE STEP IS A STUB — a
  * deterministic fake deriving pseudo width/height/frames from the payload
  * bytes (clearly marked below). Everything AROUND the stub is the real
  * Spark plumbing this operator family needs at 100 TB:
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

  /** Batched decode + feature extraction. STUB: the container has no
    * image/audio codecs, so `decodeStub` fabricates deterministic metadata
    * and an 8-dim feature from the payload bytes; swap it for a real
    * decoder (e.g. JNI/ffmpeg behind the same iterator) without touching
    * the plan. The mapPartitions shape, schema and partitioning are real
    * and exercised by MultimodalSpec + the declared query (rows-only check). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        when($"source" === "src0", "image").otherwise("text").as("modality"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    rows.mapPartitions { it =>
      // one "decoder" per partition — where a real codec would init
      val decoder = decodeStub _
      it.map(decoder)
    }.toDF()
      .select($"doc_id", $"modality", $"width", $"height", $"n_frames",
        $"resized_w", $"resized_h", size($"sampled_frames").as("n_sampled"),
        round(element_at($"feat", 1), 6).as("feat0"))
      .orderBy($"doc_id")
  }

  /** STUB decoder — deterministic fake, NOT a real codec. The decode/
    * resize/frame-sample steps a real pipeline needs are shaped here:
    * resize = aspect-preserving fit into 224x224; frame-sample = uniform
    * stride down to <=16 frames. */
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (mediaMeta _),
    "q_multimodal_features" -> (mediaFeatures _))

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
        |FROM documents ORDER BY doc_id""".stripMargin)
}
