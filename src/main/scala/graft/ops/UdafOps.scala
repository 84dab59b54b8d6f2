package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF surface (SURVEY.md §2.4 "UDF surface" row): an exact
  * median as an `Aggregator[IN, BUF, OUT]`, registered through
  * `functions.udaf`. Median needs all values, so the buffer is the value
  * list — fine for bounded per-group cardinality (orders per status here);
  * sketch aggregates (approx_count_distinct etc.) are the unbounded-group
  * path.
  *
  * Tie rule pinned to DuckDB's `median`: even count -> arithmetic mean of
  * the two middle values, computed in double.
  */
object UdafOps extends graft.QueryModule {

  /** Growable primitive buffer: amortized O(1) append (doubling), O(n)
    * merge — reduce/merge mutate in place between (de)serializations, so
    * accumulating a 1 M-value group is linear, not the O(n²) a
    * copy-per-row `Array :+` would be. Kryo handles the two-field class
    * (a primitive array + an int) compactly. */
  final class DoubleBuf(var arr: Array[Double], var n: Int) extends Serializable {
    def add(x: Double): DoubleBuf = {
      if (n == arr.length) {
        val grown = new Array[Double](math.max(8, arr.length * 2))
        System.arraycopy(arr, 0, grown, 0, n)
        arr = grown
      }
      arr(n) = x; n += 1; this
    }
    def mergeWith(o: DoubleBuf): DoubleBuf = {
      if (n + o.n > arr.length) {
        val grown = new Array[Double](math.max(n + o.n, arr.length * 2))
        System.arraycopy(arr, 0, grown, 0, n)
        arr = grown
      }
      System.arraycopy(o.arr, 0, arr, n, o.n); n += o.n; this
    }
  }

  object ExactMedian extends Aggregator[Double, DoubleBuf, Double] {
    def zero: DoubleBuf = new DoubleBuf(Array.empty, 0)
    def reduce(b: DoubleBuf, a: Double): DoubleBuf = b.add(a)
    def merge(b1: DoubleBuf, b2: DoubleBuf): DoubleBuf = b1.mergeWith(b2)
    def finish(b: DoubleBuf): Double = {
      if (b.n == 0) return Double.NaN
      val s = java.util.Arrays.copyOf(b.arr, b.n)
      java.util.Arrays.sort(s)
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def bufferEncoder: Encoder[DoubleBuf] = Encoders.kryo[DoubleBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def medianByStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val medianUdaf = udaf(ExactMedian)
    graft.Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(round(medianUdaf($"o_totalprice"), 6).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a typed
    * Aggregator — the "novel sketch" custom-aggregate path for unbounded
    * token cardinality: buffer is a fixed depth*width counter table
    * (4x1024 longs = 32 KB per partial, independent of input size),
    * merge is elementwise add (associative/commutative — safe under any
    * partial-agg split), estimate = min over rows. Overestimates only. */
  object CountMin {
    val Depth = 4
    val Width = 1024

    @inline private def mix64(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    /** Per-row INDEPENDENT hash: seeded FNV-1a over the token's UTF-8
      * bytes (the row seed perturbs the full 64-bit state before any
      * byte is folded in), finished with a murmur mix. Unlike salting a
      * single 32-bit `hashCode`, two tokens that collide in one row are
      * independent coin-flips in every other row — the property the
      * classic min-over-rows error bound actually requires. */
    def slot(bytes: Array[Byte], row: Int): Int = {
      var h = 0xcbf29ce484222325L ^ mix64(0x9E3779B97F4A7C15L * (row + 1))
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
      h = mix64(h)
      ((h % Width + Width) % Width).toInt
    }
    def slot(token: String, row: Int): Int =
      slot(token.getBytes(java.nio.charset.StandardCharsets.UTF_8), row)
    def estimate(table: Array[Long], token: String): Long =
      estimateWith(table, token, portable = false)

    /** ENGINE-NEUTRAL row hashes (the q_dedup_simhash sha256-prefix
      * precedent): ONE sha256 of the token's UTF-8 bytes yields 32
      * bytes; row r's hash is the r-th disjoint 8-byte slice viewed as
      * an unsigned 64-bit value, slot = hash mod Width. DuckDB
      * reproduces it bit-for-bit from
      * `CAST(('0x' || substr(sha256(token), 1+16*r, 16)) AS UBIGINT)
      * % Width` — which is what lets the declared query carry a full
      * value oracle. Depth*8 = 32 bytes consumed, exactly one digest. */
    def slotsPortable(token: String): Array[Int] = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = new Array[Int](Depth)
      var r = 0
      while (r < Depth) {
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(r * 8 + i) & 0xffL); i += 1 }
        out(r) = java.lang.Long.remainderUnsigned(h, Width.toLong).toInt
        r += 1
      }
      out
    }

    def estimateWith(table: Array[Long], token: String, portable: Boolean): Long =
      if (portable) {
        val s = slotsPortable(token)
        (0 until Depth).map(r => table(r * Width + s(r))).min
      } else {
        val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (0 until Depth).map(r => table(r * Width + slot(bytes, r))).min
      }

    /** WEIGHTED CMS update over (token, count) — updates are additive,
      * so hash-aggregating occurrences down to the vocabulary FIRST and
      * folding each distinct token in once with its count is
      * result-identical to streaming every occurrence, while hashing
      * |vocab| tokens instead of |corpus| (and the upstream groupBy gets
      * Spark's map-side partial aggregation for free). That is the
      * 100 TB shape regardless of hash choice.
      *
      * `portable=false` (seeded-FNV rows) is the 100 TB default — one
      * multiply-per-byte per row beats a full sha256. `portable=true`
      * is the declared-query mode the DuckDB oracle replicates. */
    final class CmsAgg(portable: Boolean)
        extends Aggregator[(String, Long), Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](Depth * Width)
      def reduce(b: Array[Long], tc: (String, Long)): Array[Long] = {
        val (tok, c) = tc
        if (portable) {
          val s = slotsPortable(tok)
          var r = 0
          while (r < Depth) { b(r * Width + s(r)) += c; r += 1 }
        } else {
          val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var r = 0
          while (r < Depth) { b(r * Width + slot(bytes, r)) += c; r += 1 }
        }
        b
      }
      def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
        var i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        b1
      }
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    }
    val Agg = new CmsAgg(portable = false)
    val AggPortable = new CmsAgg(portable = true)
  }

  /** CMS heavy-hitters end-to-end: estimated frequencies of the corpus's
    * OWN top-10 tokens, from ONE distributed CMS pass over all tokens.
    * The probe list is derived in-plan — a distributed exact top-k
    * (TakeOrderedAndProject: count desc, token asc ties) whose 10-row
    * result is the only probe-side driver object; the sketch (32 KB,
    * size independent of corpus) is the only other thing collected —
    * the legitimate collect of a sketch aggregate. At 100 TB the probe
    * pass would itself ride the sketch (or a sampled top-k); here exact
    * counts keep the declared query deterministic.
    *
    * Fully value-oracled (promoted round 10): the declared query runs
    * the sketch in PORTABLE mode — row hashes are disjoint 8-byte
    * slices of one sha256 digest ([[CountMin.slotsPortable]]) — so the
    * DuckDB oracle rebuilds the whole counter table (row, slot,
    * count(*)) and the min-over-rows estimates bit-for-bit. The
    * seeded-FNV layout stays the 100 TB default; both modes share the
    * error-bound + determinism pins in CountMinSpec. */
  def cmsTokenFreq(spark: SparkSession, sfDir: String): DataFrame =
    cmsTokenFreqWith(spark, sfDir, portable = true)

  private[ops] def cmsTokenFreqWith(
      spark: SparkSession, sfDir: String, portable: Boolean): DataFrame = {
    import spark.implicits._
    val cms = udaf(if (portable) CountMin.AggPortable else CountMin.Agg)
    // ONE shuffle: occurrences hash-agg down to the vocabulary
    // (map-side combined), reused by both the weighted sketch update
    // and the exact top-10 probe list
    val vocab = graft.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val sketch = vocab.agg(cms($"token", $"n"))
      .head().getSeq[Long](0).toArray
    val probes = vocab.orderBy($"n".desc, $"token").limit(10)
      .collect().map(_.getString(0))
    probes.toSeq.map(t => (t, CountMin.estimateWith(sketch, t, portable)))
      .toDF("token", "est_count")
      .orderBy($"token")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_cms_token_freq" -> (cmsTokenFreq _),
    "q_agg_udaf_median" -> (medianByStatus _))

  def oracle: Map[String, String] = Map(
    // bit-exact twin of the portable-mode CMS: row r's slot is the r-th
    // 8-byte slice of sha256(token) (UBIGINT view) mod Width=1024; the
    // counter table is (row, slot) -> COUNT(*) over all token
    // occurrences; the estimate is the min over the 4 rows at the
    // probe's slots. Probe list = the corpus's own exact top-10
    // (count desc, token asc), mirroring the Spark plan.
    "q_agg_cms_token_freq" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |rws AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS (
        |  SELECT r,
        |    CAST(('0x' || substr(sha256(token), 1 + 16*r, 16)) AS UBIGINT)
        |      % 1024 AS s,
        |    COUNT(*) AS n
        |  FROM toks CROSS JOIN rws GROUP BY 1, 2),
        |probes AS (
        |  SELECT token FROM toks GROUP BY token
        |  ORDER BY COUNT(*) DESC, token LIMIT 10),
        |est AS (
        |  SELECT p.token, MIN(c.n) AS est_count
        |  FROM probes p CROSS JOIN rws r
        |  JOIN cells c ON c.r = r.r
        |   AND c.s = CAST(('0x' || substr(sha256(p.token), 1 + 16*r.r, 16))
        |                  AS UBIGINT) % 1024
        |  GROUP BY 1)
        |SELECT token, est_count FROM est ORDER BY token""".stripMargin,
    "q_agg_udaf_median" ->
      """SELECT o_orderstatus, round(median(o_totalprice), 6) AS median_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
