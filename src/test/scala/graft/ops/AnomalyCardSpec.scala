package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 wave 5: rolling z-score anomaly flags + dataset-card
  * readout, each checked by independent driver-side recomputation. */
class AnomalyCardSpec extends SparkTestBase {

  test("q_window_anomaly_zscore matches a driver-side rolling replay") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q_window_anomaly_zscore")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]),
          r.getInt(6))).toMap
    // independent replay in plain Scala (BigDecimal sums, same formula)
    val events = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", unix_millis($"ts"), $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    var checked = 0
    events.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.indices.foreach { i =>
        val win = ordered.slice(math.max(0, i - 6), i + 1)
        val n = win.length.toDouble
        val s1 = win.map(r => BigDecimal(r._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val s2 = win.map { r =>
          val d = BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          d * d
        }.sum.toDouble
        val variance = (n * s2 - s1 * s1) / (n * n)
        val z = if (variance > 1e-12)
          Some(BigDecimal(
            (ordered(i)._4 - s1 / n) / math.sqrt(variance))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
        val (gotN, gotZ, gotFlag) = got((ordered(i)._1, ordered(i)._2))
        assert(gotN === win.length.toLong)
        (z, gotZ) match {
          case (Some(e), Some(g)) => assert(math.abs(e - g) < 1e-9,
            s"z mismatch at ${ordered(i)._2}: $e vs $g")
          case (a, b) => assert(a.isEmpty === b.isEmpty)
        }
        assert(gotFlag === (if (gotZ.exists(v => math.abs(v) > 2.0)) 1 else 0))
        checked += 1
      }
    }
    assert(checked === got.size && checked > 0)
  }

  test("q_quality_dataset_card: entropy and volumes recomputed independently") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q_quality_dataset_card")(
      spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    val raw = graft.Tables.documents(spark, sf0001)
      .select($"source", $"lang", $"n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (src, rows) =>
      val (nDocs, chars, langs) =
        (rows.length.toLong, rows.map(_._3).sum, rows.map(_._2).distinct)
      val entropy = rows.groupBy(_._2).values.map { g =>
        val p = g.length.toDouble / nDocs
        BigDecimal(-p * math.log(p))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val (gN, gC, gL, gH) = got(src)
      assert(gN === nDocs && gC === chars && gL === langs.length.toLong)
      assert(math.abs(gH - entropy) < 1e-9, s"$src entropy $entropy vs $gH")
    }
    assert(got.nonEmpty)
  }
}
