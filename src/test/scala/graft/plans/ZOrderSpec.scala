package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** zorder64: bit-level correctness vs a naive interleave, and the layout
  * claim itself — a z-sorted parquet file lets row-group min/max stats
  * prune a conjunctive range predicate that an arrival-ordered file
  * cannot. The pruning check reads the actual parquet footers (the same
  * stats any engine's reader consults), so it tests the storage layout,
  * not a Spark metric. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 to 30) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("morton2 = naive interleave (incl. 31-bit masking)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong().abs
      val b = rnd.nextLong().abs
      assert(ZOrder64Expression.morton2(a, b) ==
        naive(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"a=$a b=$b")
    }
    assert(ZOrder64Expression.morton2(0L, 0L) == 0L)
    assert(ZOrder64Expression.morton2(1L, 0L) == 1L)
    assert(ZOrder64Expression.morton2(0L, 1L) == 2L)
    // ordering sanity: both dims grow the key
    assert(ZOrder64Expression.morton2(3L, 3L) == 15L)
  }

  /** Row groups of `file` whose [min,max] stats intersect the box on
    * BOTH x and y, as (surviving, total). */
  private def surviving(dir: String, lo: Long, hi: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.getPath), spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val hits = blocks.count { b =>
        def range(col: String): (Long, Long) = {
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == col).get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[Long],
            st.genericGetMax.asInstanceOf[Long])
        }
        val (xmin, xmax) = range("x")
        val (ymin, ymax) = range("y")
        xmin <= hi && xmax >= lo && ymin <= hi && ymax >= lo
      }
      (hits, blocks.size)
    } finally reader.close()
  }

  test("z-sorted layout prunes row groups; arrival order cannot") {
    GraftExtensions.register(spark)
    val n = 200000L
    val base = spark.range(n).select($"id",
      pmod(xxhash64($"id"), lit(1024L)).as("x"),
      pmod(xxhash64($"id" + 999983L), lit(1024L)).as("y"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val zdir = s"$root/z"; val rdir = s"$root/r"
    base.withColumn("zv", call_function("zorder64", $"x", $"y"))
      .orderBy($"zv").drop("zv")
      .coalesce(1).write
      .option("parquet.block.size", 64 * 1024).parquet(zdir)
    base.orderBy($"id")
      .coalesce(1).write
      .option("parquet.block.size", 64 * 1024).parquet(rdir)
    // conjunctive box predicate: x,y ∈ [256, 320) — ~0.4% selectivity
    val (zHits, zTotal) = surviving(zdir, 256L, 319L)
    val (rHits, rTotal) = surviving(rdir, 256L, 319L)
    assert(zTotal > 20, s"need many row groups to measure, got $zTotal")
    // arrival order: pseudo-random x,y make every group full-range
    assert(rHits == rTotal, s"arrival order should never prune ($rHits/$rTotal)")
    // z order: the box lives in a few contiguous z runs
    assert(zHits.toDouble / zTotal < 0.3,
      s"z layout pruned too little: $zHits/$zTotal")
  }
}
