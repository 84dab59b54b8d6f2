package graft.llm

import graft.SparkTestBase

/** Drills the ≥2-of-3 consensus keep rule on constructed pair graphs
  * (r16): a single-modality collision must SURVIVE (the precision
  * policy's whole point — one random 16-bit band coincidence is not
  * destruction-grade evidence), a replay confirmed by two or three
  * modalities must collapse to its min-id representative, and chains
  * of confirmed links must close transitively. */
class MultimodalKeepListSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.toDF("doc_a", "doc_b")

  test("single-modality link survives; >=2-modality replay is dropped") {
    val docs = (1L to 8L).toDF("doc_id")
    // (1,2): all three modalities — the planted replay
    // (3,4): image only — the random band collision
    // (5,6): audio + video — two modalities suffice
    val keep = MultimodalOps.consensusKeepFromPairs(docs,
        img = pairs(1L -> 2L, 3L -> 4L),
        aud = pairs(1L -> 2L, 5L -> 6L),
        vid = pairs(1L -> 2L, 5L -> 6L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dropped: 2 (3-modality replay), 6 (2-modality)
    assert(keep.keySet === Set(1L, 3L, 4L, 5L, 7L, 8L))
    // the image-only pair survives UNLINKED — both sides keep
    assert(keep(3L) === 3L && keep(4L) === 4L)
    assert(keep(1L) === 1L && keep(5L) === 5L)
  }

  test("confirmed links close transitively to one min-id keeper") {
    val docs = (1L to 4L).toDF("doc_id")
    // 1-2 and 2-3 each confirmed by two modalities -> component {1,2,3}
    val keep = MultimodalOps.consensusKeepFromPairs(docs,
        img = pairs(1L -> 2L),
        aud = pairs(1L -> 2L, 2L -> 3L),
        vid = pairs(2L -> 3L))
      .collect().map(_.getLong(0)).toSet
    assert(keep === Set(1L, 4L))
  }

  test("declared query: planted replays drop, image-only collisions survive") {
    val rows = MultimodalOps.multimodalKeepList(spark, sf0001).collect()
    val kept = rows.map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id").collect().map(_.getLong(0))
    // every planted replay (doc_id % 10 == 1, with its base present) is
    // flagged by all three modalities -> dropped
    val replays = docs.filter(d => d % 10 == 1 && docs.contains(d - 1))
    assert(replays.nonEmpty)
    assert(replays.forall(d => !kept.contains(d)),
      "a planted replay survived the consensus keep rule")
    // ...and their bases are kept as the component representatives
    assert(replays.forall(d => kept.contains(d - 1)))
    // any doc linked by image ALONE (not a replay pair) survives —
    // modulo docs that are THEMSELVES replays, which drop via their
    // own confirmed pair regardless of the extra image edge
    val imgOnly = MultimodalOps.imagePhashDedup(spark, sf0001)
      .filter(!org.apache.spark.sql.functions.col("planted"))
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .filterNot(replays.contains)
    assert(imgOnly.forall(kept.contains),
      "an image-only collision was destroyed without consensus")
  }
}
