package graft.llm

import graft.SparkTestBase

/** Planted-duplicate drills for the audio pipeline (r15): the WAV
  * render → javax.sound.sampled decode roundtrip on REAL RIFF bytes,
  * the one-window perturbation's exact band signature, and the
  * declared dedup query end-to-end (planted replays collapse, silence
  * is capped, distinct clips stay apart). */
class AudioFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  test("WAV roundtrip is lossless: decoded band energies equal the formula") {
    val e = MultimodalOps.audioBandEnergies(
      MultimodalOps.renderWav(42L, perturb = false, flat = false))
    val want = Array.tabulate(8) { b =>
      (0 until 128).map { j =>
        val s = MultimodalOps.audioSample(42L, b * 128 + j,
          perturb = false, flat = false).toLong
        s * s
      }.sum
    }
    assert(e.toSeq === want.toSeq)
    assert(e.forall(_ > 0L))
  }

  test("one-window perturbation changes exactly one band; silence is zero") {
    val base = MultimodalOps.audioBandEnergies(
      MultimodalOps.renderWav(7L, perturb = false, flat = false))
    val near = MultimodalOps.audioBandEnergies(
      MultimodalOps.renderWav(7L, perturb = true, flat = false))
    assert(base.zip(near).count { case (a, b) => a != b } === 1)
    assert(base(3) !== near(3)) // samples 384..511 live in band 3
    val silent = MultimodalOps.audioBandEnergies(
      MultimodalOps.renderWav(9L, perturb = false, flat = true))
    assert(silent.forall(_ === 0L))
  }

  test("declared query: planted replays collapse, silence capped, rest apart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-afp").toString
    // 0..399: 40 planted replay pairs, 10 silent clips (>: cap 8)
    (0L until 400L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    val rows = MultimodalOps.audioFingerprintDedup(spark, dir).collect()
    assert(rows.count(_.getBoolean(3)) === 40)
    assert(rows.filter(_.getBoolean(3))
      .forall(_.getLong(2) === 7L)) // exactly one band differs
    assert(!rows.exists(r =>
      r.getLong(0) % 40 == 24 && r.getLong(1) % 40 == 24),
      "capped silence bucket still produced pairs")
    val energies = MultimodalOps.audioEnergy(spark, dir).collect()
    assert(energies.length === 400 * 8)
  }
}
