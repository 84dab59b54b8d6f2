package graft.llm

import graft.SparkTestBase

/** Pins the build-once contract of the three modality artifacts (r16,
  * the LPA pattern applied to media): the first consumer of a modality
  * materializes its hashed corpus + scored-pair frame under the
  * content-keyed path, every other consumer READS it (no second codec
  * pass — the r15 shape re-rendered and re-decoded the corpus inside
  * each consumer, and the consensus query paid all three passes
  * twice), and a deleted artifact is rebuilt transparently with the
  * same pairs. */
class MediaArtifactSpec extends SparkTestBase {

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll)
    f.delete()
  }

  test("media artifacts: built once per modality, shared by all consumers, rebuilt on delete") {
    val paths = Seq("image", "audio", "video")
      .map(m => m -> MultimodalOps.mediaArtifactPath(m, sf0001)).toMap
    paths.values.foreach(p => rmAll(new java.io.File(p)))

    // first consumers build each modality exactly once
    val img = MultimodalOps.imagePhashDedup(spark, sf0001).collect()
    val aud = MultimodalOps.audioFingerprintDedup(spark, sf0001).collect()
    val vid = MultimodalOps.videoFramehashDedup(spark, sf0001).collect()
    assert(img.nonEmpty && aud.nonEmpty && vid.nonEmpty)
    assert(new java.io.File(s"${paths("image")}/hashed").isDirectory)
    assert(new java.io.File(s"${paths("image")}/pairs").isDirectory)
    assert(new java.io.File(s"${paths("audio")}/energy").isDirectory)
    assert(new java.io.File(s"${paths("audio")}/pairs").isDirectory)
    assert(new java.io.File(s"${paths("video")}/pairs").isDirectory)
    val builtAt = paths.view.mapValues(p =>
      new java.io.File(p).lastModified()).toMap

    // every other consumer — curve, keep-list, and the cross-modal
    // consensus (which reads ALL THREE) — reads the same generations;
    // atomicWrite renames INTO place, so any rebuild bumps the mtime
    assert(MultimodalOps.imagePhashThresholdCurve(spark, sf0001)
      .collect().length === 9)
    assert(MultimodalOps.imageKeepList(spark, sf0001).collect().nonEmpty)
    assert(MultimodalOps.dedupConsensus(spark, sf0001).collect().nonEmpty)
    assert(MultimodalOps.audioEnergy(spark, sf0001).collect().nonEmpty)
    paths.foreach { case (m, p) =>
      assert(new java.io.File(p).lastModified() === builtAt(m),
        s"$m artifact was rebuilt, not read")
    }

    // a deleted modality rebuilds transparently with the same pairs
    rmAll(new java.io.File(paths("image")))
    val img2 = MultimodalOps.imagePhashDedup(spark, sf0001).collect()
    assert(img2.map(_.toString).sameElements(img.map(_.toString)))
    assert(new java.io.File(paths("image")).lastModified() !== builtAt("image"),
      "deleted image artifact was not rebuilt")
    // ...without touching the OTHER modalities
    assert(new java.io.File(paths("audio")).lastModified() === builtAt("audio"))
    assert(new java.io.File(paths("video")).lastModified() === builtAt("video"))
  }
}
