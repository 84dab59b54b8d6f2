package graft.llm

import graft.SparkTestBase

/** Pins the build-once contract of the shared LPA artifact (r15): the
  * first consumer materializes edges + round-2 + round-4 snapshots
  * under the content-keyed path, the other two READ it (no second LPA
  * run), and a deleted artifact is rebuilt transparently. */
class GraphArtifactSpec extends SparkTestBase {

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll)
    f.delete()
  }

  test("LPA artifact: built once, shared by all three consumers, rebuilt on delete") {
    val path = GraphOps.lpaArtifactPath(sf0001)
    rmAll(new java.io.File(path))
    assert(!new java.io.File(path).exists())

    // first consumer builds it
    val lpa = GraphOps.labelPropagation(spark, sf0001).collect()
    assert(lpa.nonEmpty)
    val dir = new java.io.File(path)
    assert(dir.isDirectory)
    assert(new java.io.File(s"$path/edges").isDirectory)
    assert(new java.io.File(s"$path/lbl2").isDirectory)
    assert(new java.io.File(s"$path/lbl4").isDirectory)
    val builtAt = dir.lastModified()

    // the other two consumers read the same generation — the artifact
    // directory is not rewritten (atomicWrite renames INTO place, so a
    // rebuild would bump the directory mtime)
    val mod = GraphOps.modularity(spark, sf0001).collect().head
    assert(!mod.isNullAt(2)) // modularity defined on the basket graph
    val ari = GraphOps.lpaStability(spark, sf0001).collect().head
    assert(!ari.isNullAt(3)) // ARI defined: partitions are non-trivial
    assert(dir.lastModified() === builtAt, "artifact was rebuilt, not read")

    // deleted artifact rebuilds transparently with the same partition
    rmAll(dir)
    val lpa2 = GraphOps.labelPropagation(spark, sf0001).collect()
    assert(lpa2.map(_.toString).sorted
      .sameElements(lpa.map(_.toString).sorted))
  }
}
