package graft.llm

import graft.SparkTestBase

/** Pins the incremental-IVF contract (r15): the base generation is
  * READ, never rebuilt or rewritten, by the add and by queries; the
  * delta batch is genuinely searchable; and recall@5 against the
  * full-corpus brute-force truth holds the same floor as the static
  * IVF index. */
class IncrementalIvfSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll)
    f.delete()
  }

  private def cellFileStamps(path: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("incremental IVF: base read-not-rebuilt, delta searchable, recall holds") {
    rmAll(new java.io.File(SimSearchOps.ivfIncrBasePath(sf0001)))
    rmAll(new java.io.File(SimSearchOps.ivfIncrDeltaPath(sf0001)))

    val first = SimSearchOps.topkIvfIncremental(spark, sf0001).collect()
    assert(first.length === 50) // 10 queries x 5
    val basePath = SimSearchOps.ivfIncrBasePath(sf0001)
    val deltaPath = SimSearchOps.ivfIncrDeltaPath(sf0001)
    val baseStamps = cellFileStamps(s"$basePath/cells")
    assert(baseStamps.nonEmpty)

    // the delta generation holds exactly the new batch
    val deltaIds = spark.read.parquet(s"$deltaPath/cells")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(deltaIds.nonEmpty && deltaIds.forall(_ % 20 == 7))

    // a second run reuses both generations byte-for-byte
    val second = SimSearchOps.topkIvfIncremental(spark, sf0001).collect()
    assert(second.map(_.toString).sameElements(first.map(_.toString)))
    assert(cellFileStamps(s"$basePath/cells") === baseStamps,
      "base cell files were rewritten, not read")

    // base-generation guard: a delta stamped with a DIFFERENT base_gen
    // (the "base was deleted and rebuilt under a surviving delta"
    // hazard — a rebuilt KMeans quantizer need not reproduce its
    // centroids) must be dropped and re-added, not silently served
    val genFile = java.nio.file.Paths.get(s"$deltaPath/base_gen")
    val liveGen = new String(
      java.nio.file.Files.readAllBytes(genFile), "UTF-8")
    java.nio.file.Files.write(genFile, "stale-generation".getBytes("UTF-8"))
    val deltaStamps = cellFileStamps(s"$deltaPath/cells")
    val third = SimSearchOps.topkIvfIncremental(spark, sf0001).collect()
    assert(third.map(_.toString).sameElements(first.map(_.toString)))
    assert(new String(java.nio.file.Files.readAllBytes(genFile), "UTF-8")
      === liveGen, "guard did not restamp the rebuilt delta")
    assert(cellFileStamps(s"$deltaPath/cells") !== deltaStamps,
      "stale-generation delta was served, not rebuilt")

    // recall@5 vs the FULL-corpus brute-force truth — delta members in
    // the truth set are only findable if the add made them searchable
    val exact = SimSearchOps.topkBruteForce(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.values.flatten.exists(_ % 20 == 7),
      "vacuous fixture: no delta vector in any exact top-5")
    val got = first.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"incremental-IVF recall@5 too low: $mean")
  }
}
